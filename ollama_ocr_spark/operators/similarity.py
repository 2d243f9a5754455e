"""Similarity search over an embedding column (``array<float>``).

- :func:`cosine_topk` — brute-force exact top-k: the correctness baseline.
  Query side is broadcast (queries are small by definition); the scan side
  streams — at 100 TB this is one pass over the corpus per query batch with
  no shuffle until the final per-query top-k (a tiny ``row_number`` window
  over k·|Q| rows after partial top-k pushdown via AQE).
- :func:`lsh_bucket_topk` — random-hyperplane LSH scale path: sign-bit
  signature buckets cut the candidate set; exactness traded for a bounded
  candidate join. Hyperplanes are derived deterministically from xxhash64 so
  results are stable across runs (rows-only check; hash is Spark-specific).

All arithmetic is double-precision native column math (zip_with/aggregate)
— no Python UDF — so the DuckDB oracle reproduces it bit-for-bit before the
4-decimal round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                key: str = "vec_id", vec: str = "embedding") -> DataFrame:
    """Exact top-k cosine neighbors per query.

    Output: (query_id, neighbor_id, cosine, rank) — ties broken by
    neighbor_id ascending for determinism.
    """
    q = queries.select(
        F.col(key).alias("query_id"), F.col(vec).alias("qv")
    )
    c = corpus.select(
        F.col(key).alias("neighbor_id"), F.col(vec).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .withColumn("cosine", F.round(_dot(F.col("qv"), F.col("cv"))
                                      / (_norm(F.col("qv")) * _norm(F.col("cv"))), 4))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _rh_signature(vec, num_planes: int, dim: int):
    """Random-hyperplane sign signature; plane weights are ±1 derived from
    xxhash64(plane, dim) — deterministic, no stored model."""
    bits = []
    for p in range(num_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, i: x.cast("double")
                * F.when(
                    F.xxhash64(F.lit(p), i).bitwiseAND(F.lit(1)) == 1, F.lit(1.0)
                ).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2 ** p))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig


def lsh_bucket_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                    key: str = "vec_id", vec: str = "embedding",
                    num_planes: int = 6, dim: int = 64) -> DataFrame:
    """ANN via random-hyperplane buckets: exact rerank inside the bucket.

    Recall < 1.0 by design; at 100 TB the bucket join replaces the full
    cross-product with |corpus|/2^planes candidates per query.
    """
    c = corpus.select(
        F.col(key).alias("neighbor_id"), F.col(vec).alias("cv")
    ).withColumn("sig", _rh_signature(F.col("cv"), num_planes, dim))
    q = queries.select(
        F.col(key).alias("query_id"), F.col(vec).alias("qv")
    ).withColumn("sig", _rh_signature(F.col("qv"), num_planes, dim))

    scored = (
        c.join(F.broadcast(q), "sig")
        .withColumn("cosine", F.round(_dot(F.col("qv"), F.col("cv"))
                                      / (_norm(F.col("qv")) * _norm(F.col("cv"))), 4))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
