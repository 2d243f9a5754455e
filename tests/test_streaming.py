"""Structured Streaming incremental mode: exactly-once drain semantics."""

from __future__ import annotations

from ollama_ocr_spark.operators.extract import synthesize_stage
from ollama_ocr_spark.sources.icetbl import IceTable
from ollama_ocr_spark.streaming.incremental import (
    incremental_extract,
    windowed_event_counts,
)


def test_incremental_extract_drains_and_resumes(spark, documents_smoke, tmp_path):
    pages_dir = str(tmp_path / "pages")
    ckpt = str(tmp_path / "ckpt")
    results = IceTable(str(tmp_path / "results"))

    first = synthesize_stage(documents_smoke.filter("doc_id < 100"))
    first.write.mode("append").parquet(pages_dir)
    incremental_extract(spark, pages_dir, results, ckpt)
    n1 = results.read(spark).count()
    assert n1 == first.count()

    # New captures arrive; a second availableNow run picks up ONLY them.
    second = synthesize_stage(
        documents_smoke.filter("doc_id >= 100 AND doc_id < 150")
    )
    second.write.mode("append").parquet(pages_dir)
    incremental_extract(spark, pages_dir, results, ckpt)
    n2 = results.read(spark).count()
    assert n2 == n1 + second.count()

    # Idempotent: nothing new → no new rows.
    incremental_extract(spark, pages_dir, results, ckpt)
    assert results.read(spark).count() == n2


def test_windowed_event_counts_batch_twin(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = windowed_event_counts(events, window="1 day", watermark="1 day")
    rows = out.collect()
    assert sum(r["n_events"] for r in rows) == events.count()
    assert {len(r) for r in rows} == {4}
