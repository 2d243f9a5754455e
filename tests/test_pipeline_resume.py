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


def test_icetbl_compact_and_expire(spark, tmp_path):
    """Iceberg-maintenance analogs: compaction rewrites the live snapshot
    into fewer files (time travel intact), expire_snapshots then deletes
    unreferenced files and old snapshot logs."""
    import glob

    tbl = IceTable(str(tmp_path / "t"))
    for i in range(3):
        tbl.append(spark.range(10).withColumn("tag", F.lit(str(i))))
    files_before = len(tbl.snapshot().files)
    assert files_before >= 3

    sid = tbl.compact(spark, target_files=1)
    assert sid == 4
    assert tbl.read(spark).count() == 30
    assert len(tbl.snapshot().files) == 1
    # time travel to a pre-compaction snapshot still works
    assert tbl.read(spark, snapshot_id=2).count() == 20

    deleted = tbl.expire_snapshots(keep_last=1)
    assert deleted  # old small files physically removed
    assert tbl.read(spark).count() == 30  # live snapshot untouched
    assert tbl.snapshot(2) is None  # expired log gone
    on_disk = glob.glob(str(tmp_path / "t" / "data" / "*.parquet"))
    assert set(on_disk) == set(tbl.snapshot().files)
    # a second expire over the now-sparse log is a no-op, not a crash
    assert tbl.expire_snapshots(keep_last=1) == []


def test_open_table_flag_and_catalog_writeTo(spark, tmp_path, monkeypatch):
    """Feature flag: default → icetbl; 'iceberg' → catalog writeTo path.
    The V2 write/read mechanics run here against the session catalog with
    using='parquet' (no Iceberg jar in-sandbox); snapshot-dependent methods
    degrade to None on a non-Iceberg catalog."""
    from ollama_ocr_spark.sources.icetbl import CatalogTable, open_table

    assert isinstance(open_table(str(tmp_path / "t")), IceTable)
    monkeypatch.setenv("SPARK_GRAFT_TABLE_FORMAT", "iceberg")
    assert isinstance(open_table("default.t", spark=spark), CatalogTable)

    tbl = CatalogTable(spark, "default.graft_cat_test", using="parquet")
    try:
        assert tbl.read() is None
        tbl.append(spark.range(5).withColumn("tag", F.lit("a")))
        tbl.append(spark.range(3).withColumn("tag", F.lit("b")))
        assert tbl.read().count() == 8
        assert tbl.read(spark).count() == 8
        assert tbl.current_snapshot_id() is None  # parquet: no .snapshots
    finally:
        spark.sql("DROP TABLE IF EXISTS default.graft_cat_test")


def test_catalog_writeTo_iceberg_contract():
    """Contract test for the documented icetbl → real-Iceberg swap: the
    exact V2 call shapes the Iceberg branch issues — writeTo().append()
    on an existing table, writeTo().using('iceberg').create() on a new
    one, the `.snapshots` metadata query, and the `snapshot-id` read
    option — run against spec'd mocks of the pyspark surface, so a drift
    in CatalogTable's call chain (or in pyspark's API names) fails here
    instead of only in a production deployment that has the jar."""
    from unittest.mock import MagicMock

    from pyspark.sql import DataFrame as SparkDF
    from pyspark.sql import SparkSession as SparkSess

    from ollama_ocr_spark.sources.icetbl import CatalogTable

    mspark = MagicMock(spec=SparkSess)
    tbl = CatalogTable(mspark, "cat.db.docs")

    # existing table → append commits a snapshot; snapshot id comes from
    # the <tbl>.snapshots metadata table, newest commit first
    mspark.catalog.tableExists.return_value = True
    mspark.sql.return_value.first.return_value = {"snapshot_id": 42}
    df = MagicMock(spec=SparkDF)
    assert tbl.append(df) == 42
    df.writeTo.assert_called_once_with("cat.db.docs")
    df.writeTo.return_value.append.assert_called_once_with()
    q = mspark.sql.call_args[0][0]
    assert "cat.db.docs.snapshots" in q and "committed_at DESC" in q

    # absent table → writeTo().using('iceberg').create()
    mspark.catalog.tableExists.return_value = False
    df2 = MagicMock(spec=SparkDF)
    tbl.append(df2)
    df2.writeTo.assert_called_once_with("cat.db.docs")
    df2.writeTo.return_value.using.assert_called_once_with("iceberg")
    df2.writeTo.return_value.using.return_value.create.assert_called_once_with()

    # time travel → the snapshot-id read option, value stringified
    mspark.catalog.tableExists.return_value = True
    tbl.read(snapshot_id=41)
    mspark.read.option.assert_called_once_with("snapshot-id", "41")
    mspark.read.option.return_value.table.assert_called_once_with(
        "cat.db.docs")

    # current read → plain catalog table read
    tbl.read()
    mspark.table.assert_called_once_with("cat.db.docs")


def test_crash_between_results_and_metrics_is_repaired(
    spark, documents_smoke, tmp_path
):
    """Crash window: results snapshot committed, metrics append lost. The
    next run must backfill the orphaned snapshot's lineage."""
    from ollama_ocr_spark.operators.extract import extract_stage
    from ollama_ocr_spark.pipeline import repair_metrics

    results_tbl = IceTable(str(tmp_path / "results"))
    metrics_tbl = IceTable(str(tmp_path / "metrics"))

    # simulate the crashed run: results land, metrics never do
    from ollama_ocr_spark.operators.maintenance import latest_capture

    crashed = extract_stage(
        latest_capture(synthesize_stage(documents_smoke.filter("doc_id < 100")))
    )
    sid = results_tbl.append(crashed)
    assert metrics_tbl.read(spark) is None

    repaired = repair_metrics(spark, results_tbl, metrics_tbl)
    assert repaired == [sid]
    backfilled = metrics_tbl.read(spark)
    assert backfilled.agg(F.sum("doc_count")).collect()[0][0] == crashed.count()

    # and run_extract performs the repair implicitly + dedups the work
    s = run_extract(
        spark, synthesize_stage(documents_smoke), results_tbl, metrics_tbl
    )
    assert s.docs_extracted == documents_smoke.count() - crashed.count()
    total = metrics_tbl.read(spark).agg(F.sum("doc_count")).collect()[0][0]
    assert total == documents_smoke.count()


def test_icetbl_concurrent_commit_detected(spark, tmp_path):
    """Two writers racing to the same snapshot id: exactly one wins, the
    loser gets ConcurrentCommitError (optimistic concurrency, not silent
    lost-commit via rename-overwrite)."""
    from ollama_ocr_spark.sources.icetbl import ConcurrentCommitError, IceTable
    import pytest

    tbl_a = IceTable(str(tmp_path / "t"))
    tbl_b = IceTable(str(tmp_path / "t"))  # second handle, same table
    df = spark.range(3)

    # Simulate the race: both handles observed snapshot None; a commits
    # first, then b tries to publish the same v1.
    parent_a = tbl_a.snapshot()
    assert parent_a is None
    tbl_a.append(df)
    # Freeze b's view at snapshot v1 (stale read), then let a commit v2
    # first — b's publish of v2 must collide, not overwrite.
    stale = tbl_b.snapshot()
    tbl_b.snapshot = lambda sid=None: stale  # type: ignore[method-assign]
    sid2 = tbl_a.append(df)
    assert sid2 == 2
    winner_files = tbl_a.snapshot(2).files
    with pytest.raises(ConcurrentCommitError):
        tbl_b.append(df)  # also computes new_sid=2 → collision detected
    # winner's metadata intact (not clobbered by the loser)
    assert tbl_a.snapshot(2).files == winner_files


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


def test_snapshot_lifecycle_report_rows(spark, tmp_path):
    """The GC-audit report emits one row per lifecycle step with exact
    file accounting: single-file appends, compact-to-one, and expire
    reclaiming precisely the three pre-compaction files; n_rows is read
    back through the snapshot layer at every step."""
    import glob

    from ollama_ocr_spark.sources.icetbl import snapshot_lifecycle_report

    docs = spark.range(30).withColumnRenamed("id", "doc_id")
    root = str(tmp_path / "gc")
    out = {r["step"]: r
           for r in snapshot_lifecycle_report(spark, docs, root).collect()}
    assert [out[s]["phase"] for s in (1, 2, 3, 4, 5)] == [
        "append", "append", "append", "compact", "expire"]
    assert [out[s]["n_files"] for s in (1, 2, 3, 4, 5)] == [1, 2, 3, 1, 1]
    assert out[1]["n_rows"] == 10 and out[2]["n_rows"] == 20
    assert out[3]["n_rows"] == out[4]["n_rows"] == out[5]["n_rows"] == 30
    assert out[5]["reclaimed_files"] == 3 and out[5]["snapshot_id"] == 4
    # disk state matches the live snapshot exactly after GC
    on_disk = glob.glob(root + "/data/*.parquet")
    assert len(on_disk) == 1
