"""applyInPandasWithState sessionizer: state survives across micro-batch runs
and converges to the batch sessionizer's answer."""

from __future__ import annotations

import os

from pyspark.sql import Window
from pyspark.sql import functions as F

from ollama_ocr_spark.streaming.stateful import run_sessionize_availableNow

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp_ntz, user_id bigint, event_type string, "
    "value double, props string"
)


def _batch_sessions(events):
    t = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    w = Window.partitionBy("user_id").orderBy("t")
    gaps = (
        events.select("user_id", t.alias("t"))
        .withColumn("pt", F.lag("t").over(w))
        .withColumn(
            "new_s",
            F.when(
                F.col("pt").isNull() | (F.col("t") - F.col("pt") > 1_800_000_000), 1
            ).otherwise(0),
        )
    )
    return {
        r["user_id"]: r["n"]
        for r in gaps.groupBy("user_id").agg(F.sum("new_s").alias("n")).collect()
    }


def test_stateful_sessionize_incremental_matches_batch(spark, tmp_path):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    median_ts = events.select(
        F.median(F.unix_micros(F.col("ts").cast("timestamp_ltz")))
    ).collect()[0][0]
    events = events.withColumn(
        "__t", F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    )

    events_dir = str(tmp_path / "events_stream")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: first half by event time
    events.filter(F.col("__t") < median_ts).drop("__t").write.mode(
        "append"
    ).parquet(events_dir)
    first = run_sessionize_availableNow(spark, events_dir, ckpt, EVENTS_SCHEMA)
    assert first  # some users present

    # batch 2: the rest arrives; state must carry over, not restart
    events.filter(F.col("__t") >= median_ts).drop("__t").write.mode(
        "append"
    ).parquet(events_dir)
    second = run_sessionize_availableNow(spark, events_dir, ckpt, EVENTS_SCHEMA)

    expected = _batch_sessions(events)
    merged = {**first, **second}
    assert merged == expected
    # at least one user must have grown its count across batches (proves the
    # state actually carried rather than each batch starting fresh)
    grew = [u for u in first if u in second and second[u] > first[u]]
    assert grew
    assert os.path.isdir(ckpt)


def test_rocksdb_state_store(spark, tmp_path):
    """The production state-store path: RocksDB provider (bundled in Spark
    4) produces the same sessionization answer, with zipped RocksDB
    snapshots in the checkpoint instead of HDFS-backed heap state."""
    from ollama_ocr_spark.session import ROCKSDB_PROVIDER, enable_rocksdb_state

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events_dir = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ck")
    events.write.parquet(events_dir)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    enable_rocksdb_state(spark)
    try:
        assert (
            spark.conf.get("spark.sql.streaming.stateStore.providerClass")
            == ROCKSDB_PROVIDER
        )
        got = run_sessionize_availableNow(spark, events_dir, ckpt, EVENTS_SCHEMA)
        assert got == _batch_sessions(events)
        zips = [
            f for _, _, files in os.walk(os.path.join(ckpt, "state"))
            for f in files if f.endswith(".zip")
        ]
        assert zips  # RocksDB snapshot uploads
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
