"""Similarity search over an embedding column (``array<float>``).

- :func:`cosine_topk` — brute-force exact top-k: the correctness baseline.
  Query side is broadcast (queries are small by definition); the scan side
  streams — at 100 TB this is one pass over the corpus per query batch with
  no shuffle until the final per-query top-k (a tiny ``row_number`` window
  over k·|Q| rows after partial top-k pushdown via AQE).
- :func:`lsh_bucket_topk` — random-hyperplane LSH scale path: sign-bit
  signature buckets cut the candidate set; exactness traded for a bounded
  candidate join. Hyperplanes derive deterministically from md5 parity
  (engine-portable: the DuckDB oracle reproduces buckets bit-for-bit), with
  an xxhash64 variant for cheap production hashing.

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


def numpy_pair_cosines(joined: DataFrame,
                       threshold: float | None = None) -> DataFrame:
    """Bulk per-pair cosine via an Arrow-batched numpy kernel — the fast
    path for BULK candidate-pair scoring (measured ~1.6x over the JVM HOF
    dot end-to-end at 1M pairs: HOFs evaluate lambda frames per element,
    numpy runs one C loop per dimension across the whole batch).

    Input columns (exact names): a, b (pair keys), va, vb (vectors),
    na, nb (precomputed norms — once per VECTOR, not per pair).
    Output: (a, b, raw double) — the UNROUNDED cosine.

    Bit-parity contract: the kernel replicates :func:`_dot`'s sequential
    fold order (``acc = acc + A[:,i] * B[:,i]`` per dimension) so the
    doubles are identical to the zip_with/aggregate form and a DuckDB
    oracle reproduces them exactly. The kernel NEVER rounds (numpy rounds
    half-even; Spark/DuckDB half-up) — pass ``threshold`` only as a
    CONSERVATIVE prefilter (keeps raw >= threshold - 1e-4; since
    round(x, 4) >= t implies x >= t - 0.00005, no survivor is lost); the
    exact round + compare must run engine-side on the returned raw.
    """
    a_ddl = joined.schema["a"].dataType.simpleString()
    b_ddl = joined.schema["b"].dataType.simpleString()

    def kernel(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            mat_a = np.stack(pdf["va"].to_numpy()).astype(np.float64)
            mat_b = np.stack(pdf["vb"].to_numpy()).astype(np.float64)
            acc = np.zeros(len(pdf))
            for i in range(mat_a.shape[1]):  # sequential fold order
                acc = acc + mat_a[:, i] * mat_b[:, i]
            raw = acc / (pdf["na"].to_numpy() * pdf["nb"].to_numpy())
            out = pd.DataFrame({"a": pdf["a"], "b": pdf["b"], "raw": raw})
            if threshold is not None:
                out = out[out["raw"] >= threshold - 1e-4]
            yield out

    return joined.select("a", "b", "va", "vb", "na", "nb").mapInPandas(
        kernel, f"a {a_ddl}, b {b_ddl}, raw double"
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


def _md5_plane_weights(plane: int, dim: int) -> list[float]:
    """±1 weights for one hyperplane: parity of the LAST hex digit of
    ``md5("{plane}|{i}")`` per dimension — hashlib md5 is bit-identical to
    Spark's and DuckDB's md5, so the DuckDB oracle recomputes the same
    weights in SQL while Spark gets them as LITERALS."""
    import hashlib

    return [
        1.0
        if int(hashlib.md5(f"{plane}|{i}".encode()).hexdigest()[31], 16) % 2
        else -1.0
        for i in range(dim)
    ]


def _rh_signature(vec, num_planes: int, dim: int, hash_fn: str = "md5",
                  plane_offset: int = 0):
    """Random-hyperplane sign signature; plane weights are ±1 derived
    deterministically from a hash of (plane, dim-index) — no stored model.

    ``hash_fn="md5"`` (default): weights are PRECOMPUTED driver-side from
    hashlib md5 and emitted as literal arrays — the hyperplanes are model
    constants, so evaluating 2048 md5 calls per ROW inside the plan (the
    previous form) was pure waste; measured 16.3s → sub-second on the
    sf0.1 near-dup query. The DuckDB oracle recomputes the identical
    weights with SQL md5 (same function, same bits).
    ``hash_fn="xxhash64"`` keeps the in-plan JVM hash variant.
    ``plane_offset`` shifts global plane ids so multiple bands draw
    disjoint hyperplane sets."""
    bits = []
    for p in range(num_planes):
        if hash_fn == "md5":
            weights = F.array(*[
                F.lit(w) for w in _md5_plane_weights(p + plane_offset, dim)
            ])
            proj = F.aggregate(
                F.zip_with(vec, weights, lambda x, w: x.cast("double") * w),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        else:
            def weight(i, p=p):
                return F.when(
                    F.xxhash64(F.lit(p + plane_offset), i)
                    .bitwiseAND(F.lit(1)) == 1,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0))
            proj = F.aggregate(
                F.zip_with(
                    vec,
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda x, i: x.cast("double") * weight(i),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        bits.append(F.when(proj > 0, F.lit(1)).otherwise(F.lit(0)) * F.lit(2 ** p))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig


def _centroids(corpus: DataFrame, key: str, vec: str,
               n_centroids: int, dim: int) -> DataFrame:
    """Deterministic IVF codebook: seed with the n lowest-key vectors, then
    one Lloyd refinement (assign-all → per-cluster elementwise mean).

    All DataFrame ops: the assign step broadcasts the codebook; the mean is
    a posexplode→groupBy(cluster,pos)→collect_list fold, so it scales to
    any corpus size (cost ∝ corpus × dim, one shuffle of (cluster,pos)
    partial sums)."""
    seeds = (
        corpus.orderBy(key).limit(n_centroids)
        .select(
            F.row_number().over(
                Window.orderBy(key)
            ).alias("cluster"),
            F.col(vec).alias("cv0"),
        )
    )
    assigned = _assign(corpus, seeds, key, vec, "cv0")
    refined = (
        assigned.select("cluster", F.posexplode(F.col(vec)).alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("m"))
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("m")))
                ),
                lambda s: s["m"],
            ).alias("centroid")
        )
    )
    return refined


def _assign(points: DataFrame, centroids: DataFrame, key: str, vec: str,
            cvec: str) -> DataFrame:
    """Attach nearest-centroid cluster id (max cosine) to every point."""
    scored = points.crossJoin(F.broadcast(centroids)).withColumn(
        "__sim", _dot(F.col(vec), F.col(cvec))
        / (_norm(F.col(vec)) * _norm(F.col(cvec)) + F.lit(1e-12))
    )
    w = Window.partitionBy(key).orderBy(
        F.col("__sim").desc(), F.col("cluster").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__sim", cvec)
    )


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             key: str = "vec_id", vec: str = "embedding",
             n_centroids: int = 16, n_probe: int = 4,
             dim: int = 64, portable: bool = False) -> DataFrame:
    """IVF (inverted-file) ANN: coarse-quantize the corpus into centroid
    cells, probe only the n_probe nearest cells per query, exact-rerank
    inside them.

    The 100 TB shape: the codebook is tiny and broadcast; the corpus is
    partitioned by cell (a real deployment writes it bucketed by cell, so
    probing is partition pruning); per-query work drops from |corpus| to
    ~|corpus|·n_probe/n_centroids. Recall < 1 by design — cosine_topk is
    the exactness oracle.

    ``portable=True`` swaps the codebook to :func:`kmeans_centroids`
    (decimal-exact coordinate means) so the CELL ASSIGNMENT — and
    therefore which neighbors a pruned probe can see — is reproducible
    by a SQL oracle even at n_probe < n_centroids. Same plan shape;
    only the mean arithmetic differs.
    """
    # k-row codebook cached: consumed by BOTH the probe-set collect and
    # the corpus assign — without the cache each materialization re-runs
    # the centroid subtree's two corpus passes (same trick, same reason
    # as semantic_dedup's codebook cache)
    cb = (kmeans_centroids(corpus, key, vec, n_centroids) if portable
          else _centroids(corpus, key, vec, n_centroids, dim))
    cents = cb.cache()
    c_assigned = _assign(
        corpus.select(F.col(key).alias("neighbor_id"), F.col(vec).alias("cv")),
        cents.select("cluster", F.col("centroid").alias("cvec")),
        "neighbor_id", "cv", "cvec",
    ).withColumn("__cn", _norm(F.col("cv")))

    q = queries.select(F.col(key).alias("query_id"), F.col(vec).alias("qv"),
                       _norm(F.col(vec)).alias("__qn"))
    q_scored = q.crossJoin(
        F.broadcast(cents.select("cluster", F.col("centroid").alias("cvec")))
    ).withColumn(
        "__sim", _dot(F.col("qv"), F.col("cvec"))
        / (F.col("__qn") * _norm(F.col("cvec")) + F.lit(1e-12))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("cluster").asc()
    )
    q_probes = (
        q_scored.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "qv", "__qn", "cluster")
    )
    return _topk_pairs(c_assigned, q_probes, k)


def _topk_pairs(c_assigned: DataFrame, q_probes: DataFrame,
                k: int) -> DataFrame:
    """Per-query top-k over probed cells, the map-side-combine way: the
    probe set (query_id, qv, __qn, cluster — |Q| × n_probe rows, bounded
    by definition, same driver-collect precedent as the indexed path's
    cell set) is collected and CLOSED OVER by an Arrow kernel; the corpus
    side (neighbor_id, cv, __cn, cluster) streams through ONCE — never
    duplicated per probing query the way a pair-explode join duplicates
    it (measured 11.8 s → ~2 s on the exact-probe chunk-ANN at sf0.1).
    Each batch emits only its per-query partial top-k.

    Bit-parity: the dot accumulates dimension-by-dimension
    (``acc += A[:, i:i+1] * Q[i:i+1, :]``) — for every (row, query) cell
    that is the same IEEE add sequence as the zip_with/aggregate fold, so
    the rounded cosine (rounded ENGINE-side, never in the kernel) matches
    the DuckDB oracle exactly.

    Partial-top-k safety under rounding: a batch keeps every row with
    raw >= (k-th largest raw) - 2e-4. round4 is monotone and moves a
    value by at most 5e-5, so a dropped row's rounded cosine is STRICTLY
    below the batch's k-th rounded cosine — k in-batch rows beat it even
    after ties break on neighbor_id; rows from other batches only push it
    further down. The engine-side window then merges batch partials.
    """
    probes = q_probes.collect()
    clusters: dict = {}
    for r in probes:
        clusters.setdefault(r["cluster"], []).append(
            (r["query_id"], list(r["qv"]), r["__qn"]))
    q_ddl = q_probes.schema["query_id"].dataType.simpleString()
    n_ddl = c_assigned.schema["neighbor_id"].dataType.simpleString()

    def kernel(batches):
        import numpy as np
        import pandas as pd

        mats = {
            c: (
                np.array([q[1] for q in qs], dtype=np.float64).T,  # dim × Q
                np.array([q[2] for q in qs], dtype=np.float64),    # Q norms
                [q[0] for q in qs],
            )
            for c, qs in clusters.items()
        }
        for pdf in batches:
            outs = []
            for c, grp in pdf.groupby("cluster"):
                m = mats.get(c)
                if m is None or not len(grp):
                    continue
                qm, qn, qids = m
                mat = np.stack(grp["cv"].to_numpy()).astype(np.float64)
                acc = np.zeros((len(grp), qm.shape[1]))
                for i in range(qm.shape[0]):   # sequential fold over dims
                    acc = acc + mat[:, i:i + 1] * qm[i:i + 1, :]
                raw = acc / (grp["__cn"].to_numpy()[:, None] * qn[None, :])
                nb = grp["neighbor_id"].to_numpy()
                for j, qid in enumerate(qids):
                    col = raw[:, j]
                    if len(col) > k:
                        kth = np.partition(col, -k)[-k]
                        sel = col >= kth - 2e-4
                    else:
                        sel = np.ones(len(col), dtype=bool)
                    outs.append(pd.DataFrame({
                        "query_id": qid,
                        "neighbor_id": nb[sel],
                        "raw": col[sel],
                    }))
            if outs:
                yield pd.concat(outs)

    scored = (
        c_assigned.select("neighbor_id", "cv", "__cn", "cluster")
        .mapInPandas(
            kernel, f"query_id {q_ddl}, neighbor_id {n_ddl}, raw double"
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("cosine", F.round(F.col("raw"), 4))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_write_index(corpus: DataFrame, path: str, key: str = "vec_id",
                    vec: str = "embedding", n_centroids: int = 16,
                    dim: int = 64) -> None:
    """Materialize an IVF index on disk: corpus vectors written as parquet
    PARTITIONED BY their centroid cell, plus the tiny codebook alongside.

    This is the at-rest layout the :func:`ivf_topk` docstring promises:
    probing n_probe cells becomes Hive-style partition pruning — the scan
    touches n_probe directories out of n_centroids and never opens the
    rest. Build cost: one corpus pass for the codebook refinement + one
    assign + one partitioned write.
    """
    cents = _centroids(corpus, key, vec, n_centroids, dim)
    assigned = _assign(
        corpus.select(F.col(key), F.col(vec)),
        cents.select("cluster", F.col("centroid").alias("cvec")),
        key, vec, "cvec",
    )
    assigned.write.mode("overwrite").partitionBy("cluster").parquet(
        f"{path}/data"
    )
    cents.write.mode("overwrite").parquet(f"{path}/codebook")


def ivf_topk_indexed(spark, path: str, queries: DataFrame, k: int = 5,
                     key: str = "vec_id", vec: str = "embedding",
                     n_probe: int = 4) -> DataFrame:
    """ANN top-k over a materialized IVF index (:func:`ivf_write_index`).

    The probed cell set is collected to the driver (it is |queries| ×
    n_probe ints — queries are small by definition, like the broadcast in
    :func:`cosine_topk`) and applied as a STATIC ``isin`` filter on the
    partition column, so Parquet partition pruning eliminates unprobed
    cells at planning time (plan-audited: the scan's partition count drops
    to the probed cells).
    """
    cents = spark.read.parquet(f"{path}/codebook")
    q = queries.select(F.col(key).alias("query_id"), F.col(vec).alias("qv"),
                       _norm(F.col(vec)).alias("__qn"))
    q_scored = q.crossJoin(
        F.broadcast(cents.select("cluster", F.col("centroid").alias("cvec")))
    ).withColumn(
        "__sim", _dot(F.col("qv"), F.col("cvec"))
        / (F.col("__qn") * _norm(F.col("cvec")) + F.lit(1e-12))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("__sim").desc(), F.col("cluster").asc()
    )
    q_probes = (
        q_scored.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "qv", "__qn", "cluster")
    )
    probe_cells = sorted(
        {r["cluster"] for r in q_probes.select("cluster").distinct().collect()}
    )
    data = (
        spark.read.parquet(f"{path}/data")
        .filter(F.col("cluster").isin(probe_cells))
        .select(F.col(key).alias("neighbor_id"), F.col(vec).alias("cv"),
                _norm(F.col(vec)).alias("__cn"), "cluster")
    )
    return _topk_pairs(data, q_probes, k)


def ivf_recall_eval(corpus: DataFrame, queries: DataFrame, k: int = 5,
                    key: str = "vec_id", vec: str = "embedding",
                    n_centroids: int = 8, n_probe: int = 2,
                    dim: int = 64) -> DataFrame:
    """Recall@k audit of the IVF scale path against the exact baseline —
    the acceptance report a retrieval pipeline runs before trusting a
    pruned index (recall/latency trade-off is THE tunable of IVF; FAISS
    ships the same evaluation).

    Runs :func:`ivf_topk` with a genuinely pruned probe set
    (``n_probe < n_centroids``, ``portable=True`` so cell assignment is
    engine-portable) and :func:`cosine_topk` on the same (corpus,
    queries), then scores per query::

        recall_at_k = |approx_topk ∩ exact_topk| / k

    Output: (query_id, n_hits, recall_at_k) — one row per query.

    Scale shape: both inputs stream the corpus once (the exact side is
    the audit's cost — run it on a sampled query set, not production
    traffic); the intersection is a left-semi join on (query_id,
    neighbor_id), k·|Q| rows a side, followed by a tiny aggregate.
    """
    approx = ivf_topk(corpus, queries, k=k, key=key, vec=vec,
                      n_centroids=n_centroids, n_probe=n_probe, dim=dim,
                      portable=True)
    exact = cosine_topk(corpus, queries, k=k, key=key, vec=vec)
    hits = (
        approx.select("query_id", "neighbor_id")
        .join(exact.select("query_id", "neighbor_id"),
              ["query_id", "neighbor_id"], "left_semi")
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        queries.select(F.col(key).alias("query_id"))
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            F.round(F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(k), 4)
            .alias("recall_at_k"),
        )
    )


def lsh_bucket_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                    key: str = "vec_id", vec: str = "embedding",
                    num_planes: int = 6, dim: int = 64,
                    hash_fn: str = "md5") -> DataFrame:
    """ANN via random-hyperplane buckets: exact rerank inside the bucket.

    Recall < 1.0 by design; at 100 TB the bucket join replaces the full
    cross-product with |corpus|/2^planes candidates per query. Hyperplane
    weights derive from md5 parity by default (oracle-portable; see
    :func:`_rh_signature`).
    """
    c = corpus.select(
        F.col(key).alias("neighbor_id"), F.col(vec).alias("cv")
    ).withColumn("sig", _rh_signature(F.col("cv"), num_planes, dim, hash_fn))
    q = queries.select(
        F.col(key).alias("query_id"), F.col(vec).alias("qv")
    ).withColumn("sig", _rh_signature(F.col("qv"), num_planes, dim, hash_fn))

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


def embed_text_stub(col, dim: int = 16):
    """Deterministic text→vector stub — the SWAP SEAM where a production
    pipeline plugs a real embedding model (a sentence-transformer behind
    an Arrow ``mapInPandas`` kernel, same shape as the OCR_KERNELS seam in
    functions/router.py). The stub keeps every downstream ANN/dedup plan,
    schema, and partitioning real and testable without model weights:

    component j = md5(j || '|' || text)'s first 8 hex digits scaled to
    [-1, 1) — engine-portable (md5 is bit-identical across Spark, DuckDB,
    Python), so oracle queries reproduce the vectors exactly. The division
    is by a power of two (2^31): exact in IEEE doubles on every engine.
    """
    return F.array(*[
        (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{j}|"), col)), 1, 8),
                16, 10,
            ).cast("bigint").cast("double") / F.lit(2147483648.0)
            - F.lit(1.0)
        )
        for j in range(dim)
    ])


def embed_text_stub_sql(text_expr: str, dim: int = 16) -> str:
    """DuckDB twin of :func:`embed_text_stub`: a list literal of the same
    components. Hex digits extract positionally (instr over the hex
    alphabet) with exact integer-literal place values — no conv() needed.
    """
    comps = []
    for j in range(dim):
        h = f"md5({j} || '|' || {text_expr})"
        digits = " + ".join(
            f"(instr('0123456789abcdef', substr({h}, {b + 1}, 1)) - 1) "
            f"* {16 ** (7 - b)}"
            for b in range(8)
        )
        comps.append(f"(({digits}) / 2147483648.0 - 1.0)")
    return "[" + ", ".join(comps) + "]"


def normalize_embeddings(df: DataFrame, key: str = "vec_id",
                         vec: str = "embedding") -> DataFrame:
    """Unit-normalize an embedding column (map-side array lambdas; makes
    downstream cosine = plain dot product, halving ANN math). Components
    round to 6 places so the DuckDB oracle (same left-to-right double
    accumulation order) matches bit-for-bit."""
    n = _norm(F.col(vec))
    return df.select(
        F.col(key),
        F.transform(
            F.col(vec), lambda x: F.round(x.cast("double") / n, 6)
        ).alias("unit"),
        F.round(n, 6).alias("norm"),
    )


def quantize_embeddings(df: DataFrame, key: str = "vec_id",
                        vec: str = "embedding") -> DataFrame:
    """Symmetric int8 quantization per vector: q = round(127 * x /
    max_abs), plus the per-row scale to dequantize. 4x memory/bandwidth
    cut for ANN shuffles and index storage — the standard serving trade.
    Map-side only; oracle-mirrored arithmetic."""
    v = F.col(vec)
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    safe = F.when(max_abs == 0, F.lit(1.0)).otherwise(max_abs)
    return df.select(
        F.col(key),
        F.transform(
            v, lambda x: F.round(x.cast("double") * 127 / safe).cast("int")
        ).alias("qvec"),
        F.round(safe / 127, 6).alias("scale"),
    )


def kmeans_centroids(corpus: DataFrame, key: str = "vec_id",
                     vec: str = "embedding", n_centroids: int = 8) -> DataFrame:
    """Deterministic k-means codebook with ENGINE-PORTABLE arithmetic.

    Seeds are the ``n_centroids`` lowest-key vectors; one Lloyd refinement
    (assign-all -> per-coordinate mean) follows. Unlike :func:`_centroids`
    (IVF's codebook, where bit-parity is irrelevant because the oracle
    probes every cell), the per-coordinate mean here routes through
    DECIMAL(28,12) partial sums: decimal addition is exact and therefore
    order-insensitive, so Spark's partition-merge order and DuckDB's scan
    order produce the same sum bit-for-bit (the round-1 double-sum
    gotcha), and ``sum::double / count`` is then a single deterministic
    double division. That makes the downstream cluster ASSIGNMENT — not
    just a rounded report column — reproducible by the SQL oracle.

    Scale: the assign step broadcasts the tiny seed table; the mean is a
    posexplode -> groupBy(cluster, pos) partial-agg shuffle of (k x dim)
    groups. One corpus pass per refinement."""
    seeds = (
        corpus.orderBy(key).limit(n_centroids)
        .select(
            F.row_number().over(Window.orderBy(key)).alias("cluster"),
            F.col(vec).alias("cv0"),
        )
    )
    assigned = _assign(corpus.select(key, vec), seeds, key, vec, "cv0")
    return (
        assigned.select("cluster", F.posexplode(F.col(vec)).alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(
            (
                F.sum(F.col("val").cast("double").cast("decimal(28,12)"))
                .cast("double") / F.count(F.lit(1))
            ).alias("m")
        )
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("m")))),
                lambda s: s["m"],
            ).alias("centroid")
        )
    )


def kmeans_assign(corpus: DataFrame, key: str = "vec_id",
                  vec: str = "embedding", n_centroids: int = 8) -> DataFrame:
    """Attach a deterministic k-means cluster id to every vector (max
    cosine vs the :func:`kmeans_centroids` codebook, ties to the lowest
    cluster). Broadcast codebook — map-side per point, no shuffle."""
    cents = kmeans_centroids(corpus, key, vec, n_centroids)
    return _assign(
        corpus.select(key, vec),
        cents.select("cluster", F.col("centroid").alias("cvec")),
        key, vec, "cvec",
    )


def semantic_dedup(corpus: DataFrame, key: str = "vec_id",
                   vec: str = "embedding", n_centroids: int = 8,
                   threshold: float = 0.4) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): k-means
    cluster the embeddings, then inside each cluster mark every vector
    whose cosine to a LOWER-keyed cluster-mate reaches ``threshold`` as a
    semantic duplicate (the lowest-keyed member of each near-dup group is
    the canonical keeper).

    Output: (key, cluster, is_dup) — one row per input vector.

    The 100 TB shape: the pair stage is an equi-self-join on the cluster
    id — never an all-pairs nested loop. Per-cluster work is quadratic in
    cluster size, which is the SemDeDup design point: production picks
    n_centroids proportional to n so expected cluster size (and therefore
    per-task cost) stays constant; a skewed cluster is one AQE-splittable
    shuffle partition. Vectors shuffle once, keyed by cluster. (No
    reference analog — this is one of the beyond-the-reference
    training-data-pipeline operators.)
    """
    # NO parallelism guard here, measured: repartitioning the small
    # vector table made the MANY short k-means/pair passes pay 32-task
    # scheduling + an extra shuffle each (8.8 -> 15.0 s at sf0.1, 2000
    # vectors); at real scale the embeddings table arrives multi-file
    # and the guard is a no-op anyway.
    #
    # Cache the k-row codebook: `assigned` appears in THREE places (both
    # sides of the pair exchange + the final output join), and without the
    # cache every materialization re-runs the centroid subtree — itself
    # two corpus passes (seed assign + posexplode mean). k×dim doubles is
    # scale-free to cache. Measured 3.9 -> 2.8 s at sf0.1.
    cents = kmeans_centroids(corpus, key, vec, n_centroids).cache()
    assigned = _assign(
        corpus.select(key, vec),
        cents.select("cluster", F.col("centroid").alias("cvec")),
        key, vec, "cvec",
    )
    # Norms precompute ONCE per vector (bit-identical doubles — same ops,
    # same fold order as the per-pair form); the quadratic pair stage
    # then pays only the dot. Same trick as the near-dupes numpy rerank.
    withn = assigned.withColumn("__n", _norm(F.col(vec)))
    left = withn.select(
        "cluster", F.col(key).alias("a"), F.col(vec).alias("va"),
        F.col("__n").alias("na"),
    )
    right = withn.select(
        "cluster", F.col(key).alias("b"), F.col(vec).alias("vb"),
        F.col("__n").alias("nb"),
    )
    pairs = left.join(right, "cluster").filter(F.col("a") < F.col("b"))
    # Within-cluster pair dots run in the Arrow numpy kernel (same
    # bit-parity fold as the near-dupes rerank — oracle rows unchanged);
    # the exact round + threshold stay engine-side.
    dup_ids = (
        numpy_pair_cosines(pairs, threshold)
        .filter(F.round(F.col("raw"), 4) >= F.lit(threshold))
        .select(F.col("b").alias(key))
        .distinct()
        .withColumn("__dup", F.lit(1))
    )
    return (
        assigned.join(dup_ids, key, "left")
        .select(
            F.col(key),
            F.col("cluster").cast("int").alias("cluster"),
            F.coalesce(F.col("__dup"), F.lit(0)).alias("is_dup"),
        )
    )


def topic_mix(vectors: DataFrame, tokens: DataFrame, key: str = "vec_id",
              vec: str = "embedding", tok_col: str = "n_tokens",
              n_centroids: int = 8) -> DataFrame:
    """Topic-balance report for a pretraining mix: k-means cluster the
    document embeddings into topics, then compute each topic's token mass
    and a sqrt-temperature sampling weight — the embedding-space twin of
    :func:`~ollama_ocr_spark.operators.textstats.data_budget_plan`
    (which balances by metadata source; this balances by CONTENT, the
    report that catches "half the corpus is one boilerplate topic" even
    when the source labels look diverse).

    ``tokens`` carries (key, tok_col) per document — computed upstream so
    the corpus text never reaches this operator.

    Output: (cluster, n_docs, n_tokens, token_share, weight) — one row
    per topic; ``weight`` is the sqrt-temperature allocation share.

    Engine parity: same idiom as ``data_budget_plan`` — the weight
    denominator sums 4dp-quantized sqrt masses through DECIMAL(18,4)
    (order-free exact sum); token_share divides exact BIGINTs.

    Scale shape: :func:`kmeans_assign` broadcasts the k-row codebook
    (map-side assign, one posexplode mean shuffle of k x dim groups);
    the rest is arithmetic on a k-row relation with a 1-row broadcast
    denominator. The corpus shuffles zero times beyond the token join on
    ``key`` (co-partitioned ids; AQE broadcasts whichever side is small).
    """
    assigned = kmeans_assign(vectors, key, vec, n_centroids)
    per = (
        assigned.select(key, "cluster")
        .join(tokens.select(key, tok_col), key)
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tok_col).alias("n_tokens"),
        )
    )
    rooted = per.withColumn("__rt", F.round(F.sqrt(F.col("n_tokens")), 4))
    denom = rooted.agg(
        F.sum(F.col("__rt").cast("decimal(18,4)")).alias("__denom"),
        F.sum(F.col("n_tokens")).alias("__total"),
    )
    return (
        rooted.crossJoin(F.broadcast(denom))
        .select(
            F.col("cluster").cast("int").alias("cluster"),
            "n_docs", "n_tokens",
            F.round(
                F.col("n_tokens") / F.col("__total"), 6
            ).alias("token_share"),
            F.round(
                F.col("__rt") / F.col("__denom").cast("double"), 6
            ).alias("weight"),
        )
    )
