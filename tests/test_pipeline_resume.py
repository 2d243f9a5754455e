"""icetbl snapshot semantics + pipeline resume correctness (SURVEY §7.3.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ollama_ocr_spark.operators.extract import synthesize_stage
from ollama_ocr_spark.pipeline import run_extract
from ollama_ocr_spark.sources.icetbl import IceTable


def test_icetbl_append_and_time_travel(spark, tmp_path):
    tbl = IceTable(str(tmp_path / "t"))
    assert tbl.read(spark) is None
    df1 = spark.range(5).withColumn("tag", F.lit("a"))
    sid1 = tbl.append(df1)
    df2 = spark.range(3).withColumn("tag", F.lit("b"))
    sid2 = tbl.append(df2)
    assert (sid1, sid2) == (1, 2)
    assert tbl.read(spark).count() == 8
    assert tbl.read(spark, snapshot_id=1).count() == 5
    assert tbl.current_snapshot_id() == 2


def test_pipeline_resume_no_duplicates(spark, documents_smoke, tmp_path):
    results_tbl = IceTable(str(tmp_path / "results"))
    metrics_tbl = IceTable(str(tmp_path / "metrics"))

    # First (partial) run: only half the corpus arrives.
    docs_half = documents_smoke.filter("doc_id % 2 = 0")
    pages_half = synthesize_stage(docs_half)
    s1 = run_extract(spark, pages_half, results_tbl, metrics_tbl)
    assert s1.docs_extracted == docs_half.count()

    # Second run sees the FULL corpus; resume must extract only the rest.
    pages_all = synthesize_stage(documents_smoke)
    s2 = run_extract(spark, pages_all, results_tbl, metrics_tbl)
    assert s2.docs_extracted == documents_smoke.count() - docs_half.count()

    # Union of snapshots = exactly one row per url, no duplicates.
    final = results_tbl.read(spark)
    assert final.count() == documents_smoke.count()
    assert final.select("url").distinct().count() == documents_smoke.count()

    # Idempotent re-run: nothing left to do, no new rows.
    s3 = run_extract(spark, pages_all, results_tbl, metrics_tbl)
    assert s3.docs_extracted == 0
    assert results_tbl.read(spark).count() == documents_smoke.count()

    # Lineage rows reference their results snapshot and cover all docs.
    metrics = metrics_tbl.read(spark)
    assert set(r["snapshot_id"] for r in metrics.select("snapshot_id").distinct().collect()) \
        >= {s1.snapshot_id, s2.snapshot_id}
    total = metrics.agg(F.sum("doc_count")).collect()[0][0]
    assert total == documents_smoke.count()
    assert metrics.filter(F.col("checksum").isNull()).count() == 0
