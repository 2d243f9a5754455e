"""Deduplication family for web-scale training-data curation:

- exact (hash group-by),
- n-gram shingle Jaccard (all-pairs over an inverted shingle index),
- MinHash + LSH banding (scale path: candidate pairs via band-bucket join),
- SimHash (64-bit, Hamming-bucketed).

Scale notes (the point of each design):

- *exact*: one shuffle on the 128-bit digest, map-side partial agg; the
  digest (not the text) shuffles, so 100 TB of text shuffles as ~3 GB of
  keys per 10^9 docs.
- *shingle Jaccard* is quadratic in the worst case — it is the CORRECTNESS
  oracle for the LSH path, run on samples/buckets, never the full corpus.
- *MinHash+LSH* is the scale path: cost is linear in (docs × shingles) for
  signatures, then a shuffle on band keys whose buckets are tiny by
  construction. Hash functions are md5-based so the DuckDB oracle can
  reproduce signatures bit-for-bit (no library-specific hashing).
- *SimHash*: signature is a cheap per-doc fold; near-dup candidates share a
  16-bit prefix bucket (rotate for higher recall at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SHINGLE_K = 5  # words per shingle


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition CPU-bound small inputs up to the cluster's parallelism.

    A small compressed parquet table (one file < maxPartitionBytes) scans
    as ONE partition, so every expression-heavy stage over it — shingling,
    signatures, fingerprints — runs single-threaded no matter how many
    cores exist (measured: 3.8s → 2.2s for jaccard_pairs at sf0.1 on 32
    cores). The shuffle this inserts moves only the small input. No-op
    when the input already has >= defaultParallelism partitions (the 100 TB
    case — a big scan must NOT be collapsed or re-shuffled here).
    """
    if df.isStreaming:
        return df  # micro-batch sizing is the trigger's job, not ours
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_dupes(df: DataFrame, key: str = "doc_id",
                col: str = "text") -> DataFrame:
    """Group identical texts: (fingerprint, keeper, copies)."""
    return (
        df.withColumn("fingerprint", F.md5(F.col(col)))
        .groupBy("fingerprint")
        .agg(
            F.min(F.col(key)).alias("keeper"),
            F.count("*").alias("copies"),
        )
    )


def _let(expr, fn):
    """Single-element-transform let binding: evaluate ``expr`` ONCE per row
    and hand it to ``fn`` as a lambda variable. A free variable inside a
    HOF lambda is re-evaluated per ELEMENT (measured 20x on
    winnow_fingerprints: the captured md5 array re-hashed per window
    position), so any computed array a lambda closes over must be bound
    this way — bare column references are the only safe free variables.
    """
    return F.element_at(F.transform(F.array(expr), fn), 1)


def _shingle_set(col: str, k: int):
    """Per-row DISTINCT shingle array — native array lambdas only, so the
    whole shingling stage stays inside whole-stage codegen and the
    within-doc dedup happens map-side (``array_distinct``), never as a
    ``distinct()`` shuffle of exploded rows.
    """
    def sh(ws):
        # Guard: Spark's sequence(1, 0) yields a DESCENDING [1, 0] rather
        # than an empty array, so short texts need an explicit empty branch.
        idx = F.when(
            F.size(ws) >= k,
            F.sequence(F.lit(1), F.size(ws) - F.lit(k - 1)),
        ).otherwise(F.array().cast("array<int>"))
        return F.array_distinct(
            F.transform(idx, lambda i: F.array_join(F.slice(ws, i, k), " "))
        )

    # _let: an unbound split() here would re-tokenize the document once
    # per shingle position — O(W^2) char work.
    return _let(F.split(F.col(col), " "), sh)


def shingles(df: DataFrame, key: str = "doc_id", col: str = "text",
             k: int = SHINGLE_K) -> DataFrame:
    """(key, shingle) distinct pairs — the inverted-index build.

    Assumes ``key`` is unique per input row (true for doc_id), so the
    per-row ``array_distinct`` already yields globally distinct pairs with
    zero shuffle.
    """
    return df.select(F.col(key), F.explode(_shingle_set(col, k)).alias("shingle"))


def _posting_pairs(ids_col):
    """All ordered pairs (a < b) within a posting list — native array ops.

    ``flatten(transform(...))`` keeps pair generation inside codegen; with a
    sorted list, nested slicing yields each unordered pair exactly once.
    The sorted list is ``_let``-bound so the sort runs once per row — as a
    free variable inside the pair lambdas it would re-sort the posting
    list per generated pair.
    """
    def pairs(s):
        n = F.size(s)
        return F.flatten(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.transform(
                    F.slice(s, i + 1, n),
                    lambda y: F.struct(
                        F.element_at(s, i).alias("a"), y.alias("b")
                    ),
                ),
            )
        )

    return _let(F.sort_array(ids_col), pairs)


def _positional_spans(col: str, k: int):
    """(md5 digest, 1-based position) structs for every k-gram of ``col``
    — the shared map-side derivation of the span-coverage and
    span-removal operators. ``_let``-bound so the tokenize runs once per
    row, not once per span position.
    """
    def spans(ws):
        n = F.size(ws)
        idx = F.when(
            n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx,
            lambda i: F.struct(
                F.md5(F.array_join(F.slice(ws, i, k), " ")).alias("d"),
                i.alias("pos"),
            ),
        )

    return _let(F.split(F.col(col), " "), spans)


def jaccard_pairs(df: DataFrame, key: str = "doc_id", col: str = "text",
                  k: int = SHINGLE_K, threshold: float = 0.0,
                  max_posting: int | None = 1000) -> DataFrame:
    """All candidate pairs (a < b) sharing >=1 shingle, with exact Jaccard.

    Inverted-index plan that computes the shingle explode ONCE per branch:
    group by shingle → posting list → generate pairs inside the list (array
    ops, no self-join of the exploded lineage — a naive sh⨝sh re-derives the
    shingle scan 4× and shuffles the full shingle table twice). The pair
    keys that shuffle afterward are two longs, not text.

    ``max_posting`` drops hot shingles (stopword-like n-grams whose posting
    lists would explode quadratically: ONE shingle shared by 10^5 docs is
    10^10 pairs) — the standard web-scale guard, ON by default (1000);
    ``None`` keeps exact all-pairs semantics for oracle comparison at test
    scale. Set sizes in the jaccard denominator always count the FULL
    shingle set, so the cap only under-reports intersections of hot
    shingles, never inflates similarity.

    Single-scan plan: each doc's shingle-set size rides INTO the posting
    lists bit-packed with its id (``id * 2^22 + n``), so pair rows emerge
    already carrying both set sizes — no separate sizes branch (a second
    full corpus scan) and no post-hoc a/b size joins. Packing (rather than
    a struct) keeps posting lists ``array<bigint>``: long-only sort/slice
    codegen, and sorting packed values sorts by id since ids are unique.
    Limits (documented, asserted-at-scale trade): id < 2^41 (covers 10^12
    docs), n clamped at 2^22-1 distinct shingles ≈ a 4M-word document.
    Total: 1 source scan, 2 shuffles (postings groupBy, pair groupBy).
    """
    na, nb, inter = _packed_intersections(df, key, col, k, max_posting)
    out = inter.select(
        F.shiftrightunsigned(F.col("pa"), 22).alias("a"),
        F.shiftrightunsigned(F.col("pb"), 22).alias("b"),
        "inter",
        F.round(F.col("inter") / (na + nb - F.col("inter")), 4).alias("jaccard"),
    )
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


def _packed_intersections(df: DataFrame, key: str, col: str, k: int,
                          max_posting: int | None):
    """Shared core of :func:`jaccard_pairs` / :func:`containment_pairs`:
    the bit-packed inverted-index intersection plan. Returns
    (na_expr, nb_expr, inter_df) where inter_df carries (pa, pb, inter)
    packed ids and the exprs unpack each side's full shingle-set size."""
    PACK = 1 << 22
    df = ensure_parallelism(df)
    docs = df.select(F.col(key).alias("id"), _shingle_set(col, k).alias("shs"))
    exploded = docs.select(
        (
            F.shiftleft(F.col("id").cast("bigint"), 22)
            + F.least(F.size("shs"), F.lit(PACK - 1)).cast("bigint")
        ).alias("pid"),
        F.explode("shs").alias("shingle"),
    )
    postings = exploded.groupBy("shingle").agg(
        F.collect_list("pid").alias("ids")
    ).filter(F.size("ids") >= 2)
    if max_posting is not None:
        postings = postings.filter(F.size("ids") <= max_posting)

    inter = (
        postings.select(F.explode(_posting_pairs(F.col("ids"))).alias("p"))
        .groupBy(F.col("p.a").alias("pa"), F.col("p.b").alias("pb"))
        .agg(F.count("*").alias("inter"))
    )
    na = F.col("pa").bitwiseAND(PACK - 1)
    nb = F.col("pb").bitwiseAND(PACK - 1)
    return na, nb, inter


def containment_pairs(df: DataFrame, key: str = "doc_id", col: str = "text",
                      k: int = SHINGLE_K, threshold: float = 0.0,
                      max_posting: int | None = 1000) -> DataFrame:
    """Asymmetric near-dup detection: max shingle CONTAINMENT
    ``inter / min(|A|, |B|)`` per candidate pair — the signal Jaccard
    structurally misses: a page fully embedded in a longer page (quote
    expansion, article + comments, syndicated copy with added chrome)
    has containment 1.0 but Jaccard ``|A|/|B|`` — arbitrarily low when
    the host page is big, so a Jaccard threshold never fires. Broder's
    original resemblance/containment split; the small side is the
    contained one (``a < b`` by id, ``contained`` marks which).

    Same single-scan bit-packed inverted-index plan as
    :func:`jaccard_pairs` (1 source scan, 2 long-key shuffles, hot-
    shingle cap ON by default) — only the final arithmetic differs.
    Output: (a, b, inter, containment, contained_id).
    """
    na, nb, inter = _packed_intersections(df, key, col, k, max_posting)
    out = inter.select(
        F.shiftrightunsigned(F.col("pa"), 22).alias("a"),
        F.shiftrightunsigned(F.col("pb"), 22).alias("b"),
        "inter",
        F.round(F.col("inter") / F.least(na, nb), 4).alias("containment"),
        F.when(na <= nb, F.shiftrightunsigned(F.col("pa"), 22))
        .otherwise(F.shiftrightunsigned(F.col("pb"), 22))
        .alias("contained_id"),
    )
    if threshold > 0:
        out = out.filter(F.col("containment") >= threshold)
    return out


def duplicated_ngram_coverage(df: DataFrame, key: str = "doc_id",
                              col: str = "text", k: int = 8) -> DataFrame:
    """Exact-substring dedup signal (the Lee-et-al "Deduplicating Training
    Data" / ExactSubstr family): per document, how much of it is covered
    by word k-grams that also occur in ANOTHER document. Output:
    (key, n_words, n_dup_spans, covered, coverage) where `covered` is the
    interval-UNION length of all cross-doc-duplicated spans (overlapping
    spans never double-count) and coverage = covered / n_words.

    Plan, and why it scales where pair generation cannot:
    - positional shingle digests are derived map-side (md5 → 32-byte key;
      the shingle TEXT never shuffles);
    - the cross-doc duplicated set needs only a distinct-doc COUNT per
      digest (groupBy + two-phase countDistinct) — no posting lists, so a
      stopword-hot shingle costs one counter, never a quadratic or
      memory-heavy list (contrast `jaccard_pairs.max_posting`);
    - hit positions equi-join back to the flag set, then ONE array pass
      per doc computes the interval union over sorted starts:
      Σ min(k, next_start - start), last span counting k.
    The shingle derivation runs twice (count branch + hits branch) — a
    deliberate second scan instead of collect_list posting memory.

    Within-doc-only repeats are NOT flagged (count is per distinct doc);
    that matches the cross-document contamination use. Docs shorter than
    k words get coverage 0.
    """
    n_words = F.size(F.split(F.col(col), " "))
    exploded = (
        ensure_parallelism(df)
        .select(F.col(key), F.explode(_positional_spans(col, k)).alias("s"))
        .select(key, F.col("s.d").alias("d"), F.col("s.pos").alias("pos"))
    )
    dups = (
        exploded.groupBy("d")
        .agg(F.countDistinct(key).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("d")
    )
    arr = F.col("arr")
    covered = F.aggregate(
        F.transform(
            arr,
            lambda x, j: F.least(
                F.lit(k), F.coalesce(F.try_element_at(arr, j + 2), x + k) - x
            ),
        ),
        F.lit(0),
        lambda a, b: a + b,
    )
    cov = (
        exploded.join(dups, "d")
        .groupBy(key)
        .agg(
            F.count("*").alias("n_dup_spans"),
            F.array_sort(F.collect_list("pos")).alias("arr"),
        )
        .select(key, "n_dup_spans", covered.alias("covered"))
    )
    return (
        df.select(F.col(key), n_words.alias("n_words"))
        .join(cov, key, "left")
        .select(
            key,
            F.col("n_words").cast("bigint").alias("n_words"),
            F.coalesce("n_dup_spans", F.lit(0)).cast("bigint")
            .alias("n_dup_spans"),
            F.coalesce("covered", F.lit(0)).cast("bigint").alias("covered"),
            F.round(
                F.coalesce("covered", F.lit(0)) / F.col("n_words"), 4
            ).alias("coverage"),
        )
    )


def remove_duplicate_spans(df: DataFrame, key: str = "doc_id",
                           col: str = "text", k: int = 8) -> DataFrame:
    """Exact-substring dedup CUT (the removal stage of Lee et al.'s
    "Deduplicating Training Data Makes Language Models Better"):
    :func:`duplicated_ngram_coverage` measures cross-document duplicated
    spans; this operator actually removes them — every word position
    covered by a k-gram that also occurs in ANOTHER document is dropped,
    the remaining words keep their order.

    Scale shape mirrors the coverage operator: positional span digests
    map-side (text never shuffles), the cross-doc flag is a counter-only
    digest agg (no posting lists — a stopword-hot span costs one
    counter), hit STARTS equi-join back as (id, int) rows, and the cut
    itself is one array pass per doc inside codegen (positions filtered
    against the sorted start list, O(n·|starts|) within the row).

    Output: (key, n_words, n_removed, clean_text). Docs shorter than k
    words pass through uncut.
    """
    exploded = (
        ensure_parallelism(df)
        .select(F.col(key), F.explode(_positional_spans(col, k)).alias("s"))
        .select(key, F.col("s.d").alias("d"), F.col("s.pos").alias("pos"))
    )
    dups = (
        exploded.groupBy("d")
        .agg(F.countDistinct(key).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("d")
    )
    starts = (
        exploded.join(dups, "d")
        .groupBy(key)
        .agg(F.array_sort(F.collect_list("pos")).alias("__starts"))
    )
    base = df.join(starts, key, "left")
    st = F.coalesce(F.col("__starts"), F.array().cast("array<int>"))

    # The cut pass: tokens and the kept-position list are both _let-bound
    # (an unbound `words` inside the rebuild lambda re-splits per kept
    # word), folded into ONE struct so the three outputs share a single
    # evaluation — a non-cheap multi-referenced alias is not re-inlined
    # by projection collapse.
    def rebuild(ws):
        kept = F.filter(
            F.sequence(F.lit(1), F.size(ws)),
            lambda p: ~F.exists(st, lambda s: (s <= p) & (p < s + k)),
        )
        return _let(
            kept,
            lambda kp: F.struct(
                F.size(ws).cast("bigint").alias("n_words"),
                (F.size(ws) - F.size(kp)).cast("bigint").alias("n_removed"),
                F.array_join(
                    F.transform(kp, lambda p: F.element_at(ws, p)), " "
                ).alias("clean_text"),
            ),
        )

    return (
        base.select(F.col(key), _let(F.split(F.col(col), " "), rebuild)
                    .alias("__r"))
        .select(key, "__r.n_words", "__r.n_removed", "__r.clean_text")
    )


def benchmark_contamination(docs: DataFrame, benchmark: DataFrame,
                            key: str = "doc_id", col: str = "text",
                            bench_col: str = "text",
                            k: int = SHINGLE_K) -> DataFrame:
    """Eval-set contamination screen — the decontamination stage every
    LLM training pipeline runs before a corpus ships: flag documents that
    share any k-gram shingle with a benchmark/eval text (the standard
    n-gram overlap test, e.g. GPT-3 appendix C / PaLM-style 8-gram checks;
    k here defaults to the corpus shingle size).

    Scale shape: eval sets are tiny by definition, so their distinct
    shingle set BROADCASTS; the corpus side is the one map-side shingle
    explode + one groupBy(key) count — no shuffle of the benchmark, no
    join of two big sides. Output: (key, n_hits = distinct contaminated
    shingles, n_shingles, contaminated).
    """
    bench_sh = (
        benchmark.select(F.explode(_shingle_set(bench_col, k)).alias("shingle"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    # ONE shingle pass over the corpus: the broadcast left join marks
    # hits and the groupBy recovers (n_hits, n_shingles) together — no
    # second scan/shingle branch, no separate hits-join-back. The set
    # size is deliberately NOT a size(...) column next to the explode:
    # a non-generator column that references the generator's input
    # expression is re-evaluated per EXPLODED row (measured 109 s vs
    # 3 s on 5k docs), so n_shingles is recovered as count(shingle)
    # instead — the shingle array is distinct per doc, making the
    # post-explode row count equal its size (explode_outer keeps
    # empty/short docs as one NULL row that counts 0).
    doc_sh = ensure_parallelism(docs).select(
        F.col(key), F.explode_outer(_shingle_set(col, k)).alias("shingle")
    )
    flagged = doc_sh.join(F.broadcast(bench_sh), "shingle", "left")
    return (
        flagged.groupBy(key)
        .agg(
            F.count("__hit").cast("bigint").alias("n_hits"),
            F.count("shingle").cast("bigint").alias("n_shingles"),
        )
        .select(
            key, "n_hits", "n_shingles",
            (F.col("n_hits") > 0).alias("contaminated"),
        )
    )


def minhash_signatures(df: DataFrame, key: str = "doc_id", col: str = "text",
                       k: int = SHINGLE_K, num_hashes: int = 8) -> DataFrame:
    """MinHash signature per doc: sig[j] = min over shingles of
    md5(j || '|' || shingle) — md5 keeps the oracle bit-identical.

    Entirely map-side: the shingle set is a per-row array, so each sig
    element is ``array_min(transform(...))`` — no shuffle beyond the
    small-input parallelism guard (the previous explode→distinct→groupBy
    plan shuffled the full shingle table twice).
    Docs with no shingles produce no signature row (matches the grouped
    form and the oracle). Output: (key, sig array<string> len num_hashes).
    """
    shs = ensure_parallelism(df).select(
        F.col(key), _shingle_set(col, k).alias("shs")
    ).filter(
        F.size("shs") > 0
    )
    return shs.select(
        key,
        F.array(
            *[
                F.array_min(
                    F.transform(
                        F.col("shs"),
                        lambda s: F.md5(F.concat(F.lit(f"{j}|"), s)),
                    )
                )
                for j in range(num_hashes)
            ]
        ).alias("sig"),
    )


def band_buckets(sigs: DataFrame, key: str = "doc_id",
                 num_hashes: int = 8, bands: int = 4) -> DataFrame:
    """(key, band, bucket) rows from MinHash signature rows — the LSH
    banding step, factored out so the batch candidate generator and the
    incremental (streaming) pipeline share one definition. Map-side only.
    """
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [
            F.col("sig")[i] for i in range(b * rows_per_band, (b + 1) * rows_per_band)
        ]
        band_cols.append(
            F.struct(F.lit(b).alias("band"),
                     F.md5(F.concat(*parts)).alias("bucket"))
        )
    return sigs.select(
        key, F.explode(F.array(*band_cols)).alias("bb")
    ).select(key, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_lsh_candidates(df: DataFrame, key: str = "doc_id",
                           col: str = "text", k: int = SHINGLE_K,
                           num_hashes: int = 8, bands: int = 4) -> DataFrame:
    """Candidate near-dup pairs via LSH banding: docs sharing any band bucket.

    Output: distinct (a, b) with a < b.
    """
    sigs = minhash_signatures(df, key, col, k, num_hashes)
    buckets = band_buckets(sigs, key, num_hashes, bands)

    # Pair generation inside each bucket's posting list (one shuffle on the
    # band key) instead of a bucket×bucket self-join that would recompute
    # the signature lineage twice. LSH buckets are tiny by construction
    # FOR A DEDUPED INPUT: run exact dedup first — a corpus with
    # thousands of byte-identical documents puts them all in one bucket,
    # and the in-array expansion goes quadratic inside one task (the
    # simhash_band_recall hang; see that operator's join-form fix). If
    # exact dups can't be removed upstream, switch this stage to the
    # equi-join form over a localCheckpointed banded table.
    return (
        buckets.groupBy("band", "bucket")
        .agg(F.collect_list(F.col(key)).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(F.explode(_posting_pairs(F.col("ids"))).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .distinct()
    )


def winnow_fingerprints(df: DataFrame, key: str = "doc_id",
                        col: str = "text", k: int = SHINGLE_K,
                        window: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken MOSS
    scheme): hash every k-gram, slide a window of ``window`` consecutive
    hashes, keep each window's minimum — a provably-dense, position-robust
    fingerprint subset for plagiarism/overlap detection.

    Hashes are md5 hex strings (lexicographic min == numeric min on equal
    length) so the DuckDB oracle reproduces selection exactly. Output:
    (key, fingerprint) distinct — typically ~2/(window+1) of all k-grams.

    Evaluation shape (measured 20x, 5.3 s -> 0.26 s at sf0.1): a free
    variable inside a HOF lambda is RE-EVALUATED per element, so naming
    the hash array as a Python variable and sliding a window over it
    recomputes ALL the md5s per window position — O(W^2) md5 calls per
    document. Single-element-``transform`` let-bindings (``ws``/``hs``
    below) make the arrays lambda variables, evaluated once per row.
    The per-doc ``array_distinct`` replaces a corpus-sized global
    ``.distinct()`` shuffle: window mins repeat locally, and per-doc
    distinct == global distinct because ``key`` is in the output pair.
    """
    def mins_of(hs):
        n_h = F.size(hs)
        return (
            F.when(
                n_h >= window,
                F.transform(
                    F.sequence(F.lit(1), n_h - F.lit(window - 1)),
                    lambda i: F.array_min(F.slice(hs, i, window)),
                ),
            )
            .when(n_h > 0, F.array(F.array_min(hs)))
            .otherwise(F.array().cast("array<string>"))
        )

    def hashes_of(ws):
        idx = F.when(
            F.size(ws) >= k,
            F.sequence(F.lit(1), F.size(ws) - F.lit(k - 1)),
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx, lambda i: F.md5(F.array_join(F.slice(ws, i, k), " "))
        )

    mins = _let(
        F.split(F.col(col), " "),
        lambda ws: _let(hashes_of(ws), mins_of),
    )
    return ensure_parallelism(df).select(
        F.col(key), F.explode(F.array_distinct(mins)).alias("fingerprint")
    )


def embedding_near_dupes(df: DataFrame, key: str = "vec_id",
                         vec: str = "embedding",
                         threshold: float = 0.95,
                         strategy: str = "bucketed",
                         bands: int = 8, planes_per_band: int = 4,
                         dim: int = 64) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine >= threshold).

    The DEFAULT is the bucketed scale path — a bare call never plans the
    O(n²) nested-loop (plan-audited in CI).

    ``strategy="exact"`` is the all-pairs non-equi self-join — O(n²)
    compares, the test-scale CORRECTNESS ORACLE only; never run it on a
    full corpus. Opt in explicitly.

    ``strategy="bucketed"`` is the scale path: random-hyperplane LSH bands
    (md5-parity hyperplanes, disjoint plane sets per band via
    ``plane_offset``) produce ``bands`` signatures per vector; candidate
    pairs share any (band, sig) bucket and are exact-reranked in place.
    The self-join is a plain EQUI-join on (band, sig) — shuffle hash /
    sort-merge, never BroadcastNestedLoop/cartesian (plan-audited in CI).
    Cost: one shuffle of (bands × n) rows on the band key; per-bucket pair
    expansion is bounded by 2^planes_per_band spreading. Recall < 1 by
    design — raise ``bands`` (or lower ``planes_per_band``) for recall,
    the reverse for cost. Hyperplane weights are md5-derived so a DuckDB
    oracle reproduces bucket assignment bit-for-bit.

    Double math + round(4) for oracle parity in both strategies.
    """
    from .similarity import (_dot, _norm, _rh_signature,  # shared kernels
                             numpy_pair_cosines)

    def _cos(va, vb):
        return F.round(_dot(va, vb) / (_norm(va) * _norm(vb)), 4)

    if strategy == "bucketed":
        # Posting-list shape (same as minhash_lsh_candidates): signatures
        # computed ONCE, candidate pairs generated inside each (band, sig)
        # bucket as ID-ONLY rows, deduped as two longs, and only the
        # surviving distinct pairs join the vectors back for the exact
        # rerank — the heavy array<double> payload never rides through
        # the pair expansion or the distinct.
        base = df.select(F.col(key).alias("id"), F.col(vec).alias("v"))
        # NOTE: one zip_with+aggregate per plane is the FAST form. A fused
        # single-traversal variant (array-of-32 accumulator, transform
        # inside zip_with inside aggregate) measured 28x SLOWER on the
        # signature stage (13.5s vs 0.48s at sf0.1) — nested HOFs with
        # array accumulators fall out of codegen and allocate per element.
        band_sigs = F.array(*[
            F.struct(
                F.lit(b).alias("band"),
                _rh_signature(F.col("v"), planes_per_band, dim,
                              plane_offset=b * planes_per_band).alias("sig"),
            )
            for b in range(bands)
        ])
        buck = base.select(
            "id", F.explode(band_sigs).alias("bs")
        ).select(
            "id", F.col("bs.band").alias("band"),
            F.col("bs.sig").alias("sig"),
        )
        postings = (
            buck.groupBy("band", "sig")
            .agg(F.collect_list("id").alias("ids"))
            .filter(F.size("ids") >= 2)
        )
        # few-but-fat rows: AQE coalesces the bucket aggregate to a handful
        # of partitions, serializing the quadratic in-bucket pair explode —
        # spread the (tiny) posting rows across the cluster first
        postings = postings.repartition(
            df.sparkSession.sparkContext.defaultParallelism
        )
        cand = (
            postings
            .select(F.explode(_posting_pairs(F.col("ids"))).alias("p"))
            .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .distinct()
        )
        # Rerank: norms are computed ONCE per vector engine-side (n rows,
        # not once per candidate pair), then the per-pair dot products run
        # in the shared Arrow numpy kernel (similarity.numpy_pair_cosines
        # — bit-parity sequential fold, conservative prefilter; exact
        # round + threshold engine-side). Measured ~1.6x faster end-to-end
        # than the JVM HOF rerank at 1M candidate pairs.
        va = df.select(F.col(key).alias("a"), F.col(vec).alias("va"),
                       _norm(F.col(vec)).alias("na"))
        vb = df.select(F.col(key).alias("b"), F.col(vec).alias("vb"),
                       _norm(F.col(vec)).alias("nb"))
        joined = cand.join(va, "a").join(vb, "b")
        return (
            numpy_pair_cosines(joined, threshold)
            .withColumn("cosine", F.round(F.col("raw"), 4))
            .filter(F.col("cosine") >= threshold)
            .select("a", "b", "cosine")
        )

    a = df.select(F.col(key).alias("a"), F.col(vec).alias("va"))
    b = df.select(F.col(key).alias("b"), F.col(vec).alias("vb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .withColumn("cosine", _cos(F.col("va"), F.col("vb")))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


# Two's-complement bit masks: 1<<b for b<63, sign bit as Java long min.
_SIMHASH_POWS = [(1 << b) if b < 63 else -(1 << 63) for b in range(64)]


def _md5_word_hash(w):
    """64-bit word hash from the first 16 hex chars of md5 (big-endian) —
    engine-portable, so a DuckDB oracle reproduces every bit. The 32-bit
    halves go through ``conv`` (fits signed range) and reassemble with
    shift/or — pure bit ops, safe under ANSI overflow checking."""
    h = F.md5(w)
    hi = F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
    lo = F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def simhash64(df: DataFrame, key: str = "doc_id", col: str = "text",
              hash_fn: str = "xxhash64") -> DataFrame:
    """64-bit SimHash over word features.

    sig bit b = majority sign of sum over words of (+1 if bit b of
    hash(word) else -1). ``hash_fn="xxhash64"`` (default) is the cheap
    production hash; ``hash_fn="md5"`` derives the 64 bits from the md5 hex
    prefix so the DuckDB oracle reproduces signatures bit-for-bit.
    Output: (key, simhash bigint, bucket int — top 16 bits for blocking).

    Single-traversal plan: ONE ``aggregate`` over the hash array with an
    ``array<int>[64]`` accumulator (``zip_with`` adds all 64 bit signs per
    word) — the per-bit-aggregate formulation re-evaluated the
    words→xxhash64 transform 64 times per row. The signature folds back
    from the accumulator by summing the masks of positive bits (exact
    two's-complement reconstruction, so the sign bit mask is Java long
    min, never an overflowing ``1<<63``).
    """
    word_hash = F.xxhash64 if hash_fn == "xxhash64" else _md5_word_hash
    pows = F.array(*[F.lit(p).cast("bigint") for p in _SIMHASH_POWS])
    hashes = F.transform(
        F.array_distinct(F.split(F.col(col), " ")), lambda w: word_hash(w)
    )
    acc = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda a, h: F.zip_with(
            a,
            pows,
            lambda s, p: s
            + F.when(h.bitwiseAND(p) != 0, 1).otherwise(-1),
        ),
    )
    sig = F.aggregate(
        F.zip_with(
            acc, pows,
            lambda s, p: F.when(s > 0, p).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda x, y: x + y,
    )
    return ensure_parallelism(df).select(
        F.col(key),
        sig.alias("simhash"),
    ).withColumn("bucket", F.shiftrightunsigned(F.col("simhash"), 48).cast("int"))


def drop_duplicate_paragraphs(df: DataFrame, key: str = "doc_id",
                              col: str = "text", sep: str = "\n\n",
                              min_count: int = 2) -> DataFrame:
    """Inter-document boilerplate removal (Gopher/C4-style): drop every
    paragraph whose exact text occurs ``min_count``+ times across the
    corpus (nav bars, subscribe prompts, cookie banners), then reassemble
    each document preserving paragraph order.

    Scale shape (explicitly, for 100 TB):
    - paragraph frequency: group on ``md5(paragraph)`` — the 128-bit
      digest shuffles with map-side partial aggregation, the paragraph
      text itself never re-shuffles for counting;
    - the duplicated-digest set is boilerplate-sized (≪ corpus), so AQE
      turns the anti-join into a broadcast anti-join;
    - reassembly shuffles (doc_id, paragraph) once, sorting in-array per
      doc (``array_sort`` over (pos, para) structs — no window, no
      secondary sort).

    Output: (key, clean text, n_paras_in, n_paras_kept).
    """
    paras = df.select(
        F.col(key),
        F.posexplode(F.split(F.col(col), F.lit(sep))).alias("pos", "para"),
    ).withColumn("ph", F.md5(F.col("para")))
    dupes = (
        paras.groupBy("ph").agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
        .select("ph")
    )
    kept = paras.join(dupes, "ph", "left_anti")
    n_in = df.select(
        F.col(key),
        F.size(F.split(F.col(col), F.lit(sep))).alias("n_paras_in"),
    )
    rebuilt = kept.groupBy(key).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda x: x["para"],
            ),
            sep,
        ).alias(col),
        F.count("*").alias("n_paras_kept"),
    )
    return rebuilt.join(n_in, key).select(
        key, col, "n_paras_in", "n_paras_kept"
    )


def dedup_components(pairs: DataFrame, a: str = "a", b: str = "b",
                     max_iter: int = 20) -> DataFrame:
    """Connected components over candidate-pair edges → dedup clusters
    (node, label) with label = min doc id reachable — the step after
    LSH/SimHash candidate generation in every dedup pipeline: pick one
    keeper per near-duplicate CLUSTER, not per pair.

    Iterative min-label propagation (the simple alternating form of
    large-star/small-star): each round joins labels to the symmetric edge
    list, takes the min label seen per node, and stops when no label
    changed. Rounds needed = graph diameter in the worst case; web dup
    clusters are shallow (near-cliques), so 3-5 rounds typical. Each
    round is one shuffle join + one groupBy of (node, label) longs —
    ``localCheckpoint`` truncates the growing lineage so round N's plan
    does not replay rounds 1..N-1.
    """
    edges = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # Materialize the edge list ONCE: candidate pairs usually arrive as an
    # expensive plan (a full LSH/minhash pipeline), and every propagation
    # round joins against `sym` — without this, round N re-runs the whole
    # candidate generation N times (measured 16.4s -> 8.8s on the
    # curate_corpus composite at sf0.1, with the fused convergence flag).
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("src").alias("node")).distinct()
        .withColumn("label", F.col("node"))
    )
    changed = 0
    for _ in range(max_iter):
        prop = (
            sym.join(labels, sym.src == labels.node)
            .select(F.col("dst").alias("node"), F.col("label"))
        )
        # The changed-flag rides INSIDE the checkpointed frame: one heavy
        # job materializes propagation + convergence state together, and
        # the convergence count then reads cached checkpoint blocks — the
        # old separate join-and-count re-ran a shuffle join per round
        # (2 heavy jobs/round -> 1).
        new_labels = (
            prop.union(labels.select("node", "label"))
            .groupBy("node").agg(F.min("label").alias("label"))
            .join(
                labels.select("node", F.col("label").alias("__old")), "node"
            )
            .select(
                "node", "label",
                (F.col("label") != F.col("__old")).alias("__changed"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("__changed").count()
        labels = new_labels.select("node", "label")
        if changed == 0:
            break
    if changed != 0:
        # Propagation moves one hop per round: a component with diameter >
        # max_iter (plausible for chained near-dup candidates at web scale)
        # would otherwise return silently-wrong labels.
        import warnings

        warnings.warn(
            f"dedup_components: min-label propagation NOT converged after "
            f"{max_iter} rounds ({changed} labels still changing) — "
            f"cluster labels are incomplete; raise max_iter",
            stacklevel=2,
        )
    return labels


def lsh_precision_eval(df: DataFrame, key: str = "doc_id",
                       col: str = "text",
                       threshold: float = 0.5) -> DataFrame:
    """Candidate-quality evaluation for the MinHash-LSH tuning loop — the
    near-dup twin of :func:`similarity.ann_recall_eval`: score the LSH
    candidate set against exact n-gram Jaccard ground truth and report

    - ``precision_at_t`` — fraction of LSH candidate pairs whose TRUE
      Jaccard clears ``threshold`` (wasted verify work when low),
    - ``recall_at_t``    — fraction of true >=threshold pairs LSH
      surfaced (silent dup leakage into training data when low).

    One row out. Changing bands/rows-per-band moves this trade-off; this
    report is how you pick them before a 100 TB run.

    Scale shape: both sides are the existing bounded plans (inverted-index
    Jaccard with the hot-shingle cap; banded LSH pairs); the verdict join
    is pair-key longs, and the three counters reduce to 1-row relations
    that cross-join via broadcast.
    """
    exact = jaccard_pairs(df, key=key, col=col)
    truth = exact.filter(F.col("jaccard") >= threshold).select(
        "a", "b", F.lit(1).alias("__true"))
    cands = minhash_lsh_candidates(df, key=key, col=col).select(
        "a", "b", F.lit(1).alias("__cand"))
    # ONE execution of each (expensive) pair pipeline: a full-outer join
    # on the pair key, then a single counter agg — the three-separate-agg
    # form ran both pipelines twice (measured 15.9 s vs ~8 s at sf0.1).
    joined = cands.join(truth, ["a", "b"], "full_outer")
    counts = joined.agg(
        F.sum(F.coalesce(F.col("__cand"), F.lit(0))).alias("n_candidates"),
        F.sum(F.coalesce(F.col("__true"), F.lit(0))).alias("n_true_pairs"),
        F.sum(
            F.when(
                F.col("__cand").isNotNull() & F.col("__true").isNotNull(),
                1,
            ).otherwise(0)
        ).alias("n_hits"),
    )
    return (
        counts
        .select(
            F.lit(float(threshold)).alias("threshold"),
            "n_candidates", "n_true_pairs", "n_hits",
            F.round(
                F.col("n_hits") / F.nullif(F.col("n_candidates"), F.lit(0)),
                4,
            ).alias("precision_at_t"),
            F.round(
                F.col("n_hits") / F.nullif(F.col("n_true_pairs"), F.lit(0)),
                4,
            ).alias("recall_at_t"),
        )
    )


def drop_repeated_lines(df: DataFrame, key: str = "doc_id",
                        col: str = "text") -> DataFrame:
    """Within-document repeated-line removal (the intra-doc half of C4's
    line dedup; :func:`drop_duplicate_paragraphs` is the cross-doc half):
    keep each line's FIRST occurrence, preserve order, rebuild the text.
    Output: (key, col, n_lines_in, n_lines_kept).

    Scale shape: pure map-side array lambdas — zero shuffles, zero UDFs.
    The first-occurrence test is ``array_position(lines, x) == i+1``
    (O(n²) per doc in the worst case, on in-memory arrays; documents are
    pages, not books). DuckDB mirrors with ``list_filter(l, (x,i) ->
    list_position(l,x) = i)`` — DuckDB lambda indices are 1-based.
    """
    # Two projections, NOT one: with a single select that aliases the
    # rebuilt text back to `col`, sibling expressions' inner F.col(col)
    # references resolve against the NEW alias while others still see the
    # input column (Spark 4 select-item resolution) — the kept-count came
    # out computed over a MIX of old and new line arrays.
    base = df.select(
        F.col(key), F.split(F.col(col), "\n").alias("__lines")
    )
    lines = F.col("__lines")
    kept = F.filter(
        lines, lambda x, i: F.array_position(lines, x) == i + F.lit(1)
    )
    return base.select(
        F.col(key),
        F.array_join(kept, "\n").alias(col),
        F.size(lines).alias("n_lines_in"),
        F.size(kept).alias("n_lines_kept"),
    )


def dedup_cluster_sizes(df: DataFrame, key: str = "doc_id",
                        col: str = "text") -> DataFrame:
    """Near-duplicate family-size histogram — the report that says
    whether a corpus's duplication is a long tail of pairs (cheap to
    drop) or a few giant boilerplate families (worth a template rule):
    minhash-LSH candidate pairs → connected components → per-cluster
    size → histogram, with unclustered docs counted as size-1 families
    from corpus-count arithmetic (no corpus-sized join).

    Output: (cluster_size, n_clusters, n_docs) — ``n_docs`` column sums
    to the corpus size.

    Scale shape: everything after candidate generation operates on the
    (node, label) table, which is bounded by the candidate-pair doc set,
    not the corpus; the histogram is two counter aggs; the singleton row
    is a 1-row broadcast cross of two counts.
    """
    pairs = minhash_lsh_candidates(df, key=key, col=col)
    labels = dedup_components(pairs)
    sizes = labels.groupBy("label").agg(F.count("*").alias("cluster_size"))
    hist = sizes.groupBy("cluster_size").agg(
        F.count("*").alias("n_clusters"))
    total = df.agg(F.count("*").alias("__n_total"))
    clustered = labels.agg(F.count("*").alias("__n_clustered"))
    singles = total.crossJoin(F.broadcast(clustered)).select(
        F.lit(1).cast("bigint").alias("cluster_size"),
        (F.col("__n_total") - F.col("__n_clustered")).alias("n_clusters"),
    )
    return hist.unionByName(singles).select(
        "cluster_size", "n_clusters",
        (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
    )


def dedup_representatives(df: DataFrame, key: str = "doc_id",
                          col: str = "text") -> DataFrame:
    """Per near-dup cluster, the member a curation pipeline KEEPS — the
    longest doc (most whitespace tokens), tie-break lowest id — instead of
    the min-id keeper `curate_corpus` uses; CCNet/C4-style pipelines keep
    the best member, not an arbitrary one. One row per multi-member
    cluster: cluster, kept_doc, n_members, kept_tokens, tokens_dropped.

    Scale shape: clusters exist only for docs that appeared in an LSH
    candidate pair (a tiny fraction of the corpus), so the label join
    BROADCASTS and the ranking window partitions by cluster over that
    small relation — no corpus-sized sort. Token counts come from one
    map-side `size(split(...))` projection.
    """
    pairs = minhash_lsh_candidates(df, key=key, col=col)
    comps = dedup_components(pairs)
    members = (
        df.select(F.col(key), F.size(F.split(F.col(col), " ")).alias("n_tokens"))
        .join(F.broadcast(comps), F.col(key) == F.col("node"))
        .select(F.col("label").alias("cluster"), F.col(key), F.col("n_tokens"))
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("n_tokens").desc(), F.col(key).asc())
    ranked = members.withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("cluster")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col(key))).alias("kept_doc"),
            F.count("*").alias("n_members"),
            F.max(F.when(F.col("rn") == 1, F.col("n_tokens")))
            .alias("kept_tokens"),
            F.coalesce(
                F.sum(F.when(F.col("rn") > 1, F.col("n_tokens"))), F.lit(0)
            ).cast("bigint").alias("tokens_dropped"),
        )
        .select("cluster", "kept_doc", "n_members", "kept_tokens",
                "tokens_dropped")
    )


def shingle_novelty(df: DataFrame, round_col: str = "crawl_round",
                    col: str = "text", k: int = SHINGLE_K) -> DataFrame:
    """Per-crawl-round content novelty: of the distinct k-gram shingles
    observed in round r, what fraction had never been seen in ANY earlier
    round — the "how much of this crawl is actually new content" dial
    that decides recrawl cadence and incremental-dedup budgets (the
    corpus-level complement of :func:`duplicated_ngram_coverage`'s
    per-doc view).

    Scale shape: shingles digest map-side (only (round, md5) pairs ever
    shuffle — never text), the distinct collapses with map-side partial
    aggregation, first-seen is a second partial-agg min over digests, and
    the join back is a plain digest equi-join. Output rows = number of
    rounds (tiny). Output: (round_col, n_shingles, n_new, new_frac).
    """
    sh = (
        ensure_parallelism(df).select(
            F.col(round_col).alias("__r"),
            F.explode(_shingle_set(col, k)).alias("__s"),
        )
        .select("__r", F.md5("__s").alias("__d"))
        .distinct()
    )
    first = sh.groupBy("__d").agg(F.min("__r").alias("__first"))
    return (
        sh.join(first, "__d")
        .groupBy("__r")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum((F.col("__first") == F.col("__r")).cast("int"))
            .cast("bigint").alias("n_new"),
        )
        .select(
            F.col("__r").alias(round_col),
            "n_shingles",
            "n_new",
            F.round(F.col("n_new") / F.col("n_shingles"), 4)
            .alias("new_frac"),
        )
    )


def cross_corpus_near_dupes(new_df: DataFrame, ref_df: DataFrame | None,
                            key: str = "doc_id", col: str = "text",
                            k: int = SHINGLE_K, num_hashes: int = 8,
                            bands: int = 4,
                            ref_buckets: DataFrame | None = None) -> DataFrame:
    """Flag NEW documents that near-duplicate an EXISTING corpus — the
    incremental-ingest dedup shape (tonight's crawl vs the training set
    already on disk), as opposed to :func:`minhash_lsh_candidates` which
    pairs documents WITHIN one corpus.

    Plan: MinHash signatures and band buckets are map-side on both
    inputs (shared :func:`minhash_signatures` / :func:`band_buckets`
    definitions keep batch, streaming, and cross-corpus paths
    bit-identical); the only shuffle is the (band, bucket) equi-join,
    and neither side's text payload ever shuffles. No new×new or
    ref×ref pairs are generated — cost is linear in bucket collisions.
    At 100 TB the reference side's buckets are computed once and kept
    as a bucketed table (:func:`~ollama_ocr_spark.operators.maintenance.
    write_bucketed` on ``bucket``) so nightly increments join
    exchange-free on the ref side.

    Output: one row per colliding new doc —
    (key, n_ref_hits = distinct ref docs sharing ≥1 band, first_ref =
    smallest colliding ref key). Non-colliding new docs are absent
    (anti-join this result against the new corpus to keep novel docs).

    ``ref_buckets`` is the nightly fast path: pass the PERSISTED
    (key, band, bucket) rows (written once with ``write_bucketed(...,
    "band", "bucket")``) instead of ``ref_df``, and the reference side
    reads its bucketed layout straight into the join — no signature
    recompute and no ref-side exchange; only tonight's delta shuffles.
    """
    if ref_buckets is not None:
        ref_b = ref_buckets.withColumnRenamed(key, "__ref")
    else:
        if ref_df is None:
            raise ValueError("pass ref_df or ref_buckets")
        ref_b = band_buckets(
            minhash_signatures(ref_df, key, col, k, num_hashes),
            key, num_hashes, bands,
        ).withColumnRenamed(key, "__ref")
    new_b = band_buckets(
        minhash_signatures(new_df, key, col, k, num_hashes),
        key, num_hashes, bands,
    ).withColumnRenamed(key, "__new")
    pairs = (
        new_b.join(ref_b, ["band", "bucket"])
        .select("__new", "__ref")
        .distinct()
    )
    return (
        pairs.groupBy("__new")
        .agg(
            F.count("*").alias("n_ref_hits"),
            F.min("__ref").alias("first_ref"),
        )
        .withColumnRenamed("__new", key)
    )


def lsh_bucket_histogram(df: DataFrame, key: str = "doc_id",
                         col: str = "text", k: int = SHINGLE_K,
                         num_hashes: int = 8, bands: int = 4) -> DataFrame:
    """LSH bucket-size histogram — the skew diagnostic for banded dedup
    at scale: the in-bucket pair expansion is quadratic in posting-list
    length, so ONE hot bucket (boilerplate-heavy shards, near-empty docs
    hashing alike) can dominate a 100 TB candidate stage. This is the
    report that says whether a hot-bucket cap is needed before the run.

    Size classes are exact integer boundaries (1 / 2 / 3-4 / 5-8 / 9-16 /
    17+) — no float log2, whose floor is not bit-portable at the class
    edges. pair_bound = Σ n·(n−1)/2, the candidate pairs the class would
    expand to (integer math, engine-exact).

    Scale shape: map-side sigs → one (band, bucket) count agg (partial
    combine) → a 6-row-per-band rollup. Output: (band, size_class,
    n_buckets, n_docs, pair_bound).
    """
    sizes = (
        band_buckets(minhash_signatures(df, key, col, k, num_hashes),
                     key, num_hashes, bands)
        .groupBy("band", "bucket")
        .agg(F.count("*").alias("n"))
    )
    n = F.col("n")
    cls = (
        F.when(n <= 1, "1").when(n <= 2, "2").when(n <= 4, "3-4")
        .when(n <= 8, "5-8").when(n <= 16, "9-16").otherwise("17+")
    )
    return (
        sizes.select("band", cls.alias("size_class"), n)
        .groupBy("band", "size_class")
        .agg(
            F.count("*").cast("bigint").alias("n_buckets"),
            F.sum(n).cast("bigint").alias("n_docs"),
            F.sum(n * (n - 1) / 2).cast("bigint").alias("pair_bound"),
        )
    )


def split_leakage(docs_with_split: DataFrame, split_col: str = "split",
                  key: str = "doc_id", col: str = "text",
                  k: int = SHINGLE_K, num_hashes: int = 8,
                  bands: int = 4) -> DataFrame:
    """Near-duplicate LEAKAGE audit across train/val/test splits — the
    measurement that motivates group-level holdout: a row-level split
    (hash_split) scatters near-duplicate pages across splits, so eval
    content effectively appears in train. Counts LSH candidate pairs per
    unordered split combination; any (train, test)/(train, val) mass is
    the leak.

    Scale shape: candidate pairs ride id-only out of
    :func:`minhash_lsh_candidates`; the two split-label joins shuffle
    (id, label) rows, never text; the final rollup groups a handful of
    split combos. Output: (split_a, split_b, n_pairs), split_a <=
    split_b lexicographically.
    """
    pairs = minhash_lsh_candidates(docs_with_split, key, col, k,
                                   num_hashes, bands)
    labels = docs_with_split.select(F.col(key), F.col(split_col))
    joined = (
        pairs.join(labels.select(F.col(key).alias("a"),
                                 F.col(split_col).alias("__sa")), "a")
        .join(labels.select(F.col(key).alias("b"),
                            F.col(split_col).alias("__sb")), "b")
    )
    return (
        joined.select(
            F.least("__sa", "__sb").alias("split_a"),
            F.greatest("__sa", "__sb").alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
    )


def dedup_savings(df: DataFrame, group_col: str = "source",
                  col: str = "text") -> DataFrame:
    """Per-source exact-dedup savings report — what deduplication BUYS,
    the before/after a data lead checks before paying for a training run:
    docs and whitespace-token counts per source before vs after
    within-source digest dedup, with the saved fractions.

    Scale shape: digest and token count are map-side scan expressions;
    one (source, digest) partial-agg shuffle of counter rows (hot dup
    digests forward ONE partial per partition, never text), then a
    per-source rollup. Output: (source, n_docs, n_unique_docs, doc_savings,
    n_tokens, n_kept_tokens, token_savings).
    """
    per = (
        df.select(
            F.col(group_col),
            F.md5(F.col(col)).alias("__d"),
            F.size(F.split(F.col(col), " ")).cast("bigint").alias("__t"),
        )
        .groupBy(group_col, "__d")
        .agg(F.count("*").alias("__c"), F.min("__t").alias("__t"))
    )
    n_docs = F.sum("__c").cast("bigint")
    n_uniq = F.count("*").cast("bigint")
    n_tok = F.sum(F.col("__c") * F.col("__t")).cast("bigint")
    n_kept = F.sum("__t").cast("bigint")
    return per.groupBy(group_col).agg(
        n_docs.alias("n_docs"),
        n_uniq.alias("n_unique_docs"),
        F.round(F.lit(1.0) - n_uniq / n_docs, 4).alias("doc_savings"),
        n_tok.alias("n_tokens"),
        n_kept.alias("n_kept_tokens"),
        F.round(F.lit(1.0) - n_kept / n_tok, 4).alias("token_savings"),
    )


def contamination_by_source(docs: DataFrame, benchmark: DataFrame,
                            group_col: str = "source", key: str = "doc_id",
                            col: str = "text", bench_col: str = "text",
                            k: int = SHINGLE_K) -> DataFrame:
    """Per-source decontamination drill-down — the report a data lead
    reads before a training run: :func:`benchmark_contamination` rolled
    up by source/host, so a contaminated SOURCE (a site mirroring eval
    sets, a scrape of a benchmark hub) is visible as one row instead of
    thousands of doc flags.

    Same one-pass scale shape as the doc-level screen: benchmark shingles
    broadcast, one corpus shingle explode, and the group column rides the
    doc rows map-side — the per-doc agg keys on (source, doc) in a single
    shuffle with partial combine, then collapses to one row per source.

    Output: (source, n_docs, n_contaminated, doc_rate,
    n_shingles, n_hit_shingles, hit_rate) — doc_rate = contaminated-doc
    fraction, hit_rate = contaminated-shingle (≈ token) fraction.
    """
    bench_sh = (
        benchmark.select(
            F.explode(_shingle_set(bench_col, k)).alias("shingle"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    doc_sh = ensure_parallelism(docs).select(
        F.col(group_col), F.col(key),
        F.explode_outer(_shingle_set(col, k)).alias("shingle"),
    )
    per_doc = (
        doc_sh.join(F.broadcast(bench_sh), "shingle", "left")
        .groupBy(group_col, key)
        .agg(
            F.count("__hit").alias("__h"),
            F.count("shingle").alias("__s"),
        )
    )
    n_hits = F.sum("__h").cast("bigint")
    n_sh = F.sum("__s").cast("bigint")
    n_docs = F.count("*").cast("bigint")
    n_cont = F.sum((F.col("__h") > 0).cast("int")).cast("bigint")
    return per_doc.groupBy(group_col).agg(
        n_docs.alias("n_docs"),
        n_cont.alias("n_contaminated"),
        F.round(n_cont / n_docs, 4).alias("doc_rate"),
        n_sh.alias("n_shingles"),
        n_hits.alias("n_hit_shingles"),
        F.when(n_sh > 0, F.round(n_hits / n_sh, 4))
        .otherwise(F.lit(0.0)).alias("hit_rate"),
    )


def write_band_buckets(df: DataFrame, table: str, key: str = "doc_id",
                       col: str = "text", k: int = SHINGLE_K,
                       num_hashes: int = 8, bands: int = 4,
                       num_buckets: int = 16) -> None:
    """Build step of the nightly incremental near-dedup: persist a
    corpus's LSH band buckets as a table bucketed by ``(band, bucket)``.
    Run once per reference corpus (and append per accepted delta);
    every nightly :func:`cross_corpus_near_dupes` call then passes
    ``spark.table(table)`` as ``ref_buckets`` and pays zero reference-side
    signature compute and zero reference-side shuffle — only tonight's
    delta hashes and exchanges. At 100 TB the reference bucket table is
    ~1% the corpus bytes (ids + 32-char digests, no text).
    """
    from .maintenance import write_bucketed

    b = band_buckets(
        minhash_signatures(df, key, col, k, num_hashes), key, num_hashes,
        bands,
    )
    write_bucketed(b, table, "band", "bucket", num_buckets=num_buckets)


def boilerplate_paragraphs(df: DataFrame, key: str = "doc_id",
                           col: str = "text", sep: str = "\n\n",
                           min_docs: int = 2, k: int = 20) -> DataFrame:
    """Boilerplate MINING — the report that tells you what
    :func:`drop_duplicate_paragraphs` is about to remove and feeds
    rule-based filters (C4's "subscribe / cookie notice" lists were built
    from exactly this view): the top-k paragraphs by how many distinct
    documents they appear in.

    Scale shape: paragraphs group on their md5 digest with map-side
    partial aggregation — per partition, each distinct digest forwards
    ONE (count, doc-set partial, sample) row, so hot boilerplate (the
    whole point of the query) costs counters, not repeated text rows;
    the `min(para)` sample is exact because all texts under one digest
    are identical. The top-k is a TakeOrderedAndProject over the ≥
    ``min_docs`` survivors, strictly ordered by (n_docs desc, digest) so
    the cut is deterministic on any engine.
    Output: (paragraph, n_docs, n_total).
    """
    paras = ensure_parallelism(df).select(
        F.col(key), F.explode(F.split(F.col(col), F.lit(sep))).alias("para")
    )
    agg = (
        paras.groupBy(F.md5("para").alias("ph"))
        .agg(
            F.countDistinct(key).alias("n_docs"),
            F.count("*").alias("n_total"),
            F.min("para").alias("paragraph"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )
    return (
        agg.orderBy(F.desc("n_docs"), "ph")
        .limit(k)
        .select("paragraph", "n_docs", "n_total")
    )


def jaccard_histogram(df: DataFrame, key: str = "doc_id", col: str = "text",
                      k: int = SHINGLE_K, buckets: int = 20,
                      max_posting: int | None = 1000) -> DataFrame:
    """Candidate-pair Jaccard distribution — the threshold-tuning report
    read before committing a dedup cutoff: how many near-dup pairs does
    each 1/``buckets`` similarity band hold, i.e. what does moving the
    threshold from 0.8 to 0.7 actually delete?

    Buckets are EXACT integer arithmetic — ``(inter * buckets) div union``
    on the raw intersection/union counts (never ``floor(j * buckets)`` on
    the rounded double, which flips at band edges); j = 1.0 clamps into
    the top band. Output: (bucket, lo, n_pairs) where ``lo`` is the
    band's inclusive lower similarity bound.

    Same single-scan bit-packed inverted-index plan as
    :func:`jaccard_pairs` (shares ``_packed_intersections``), plus one
    ``buckets``-row aggregate — the histogram adds no corpus-sized
    shuffle, so it costs the same as the pair listing it summarizes.
    """
    na, nb, inter = _packed_intersections(df, key, col, k, max_posting)
    pairs = inter.select(
        F.col("inter").alias("i"), (na + nb - F.col("inter")).alias("u")
    )
    bucket = F.least(
        F.expr(f"int((i * {buckets}) div u)"), F.lit(buckets - 1)
    )
    return (
        pairs.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_pairs"))
        .select(
            "bucket",
            F.round(F.col("bucket") / float(buckets), 4).alias("lo"),
            "n_pairs",
        )
    )


def simhash_band_keys(simhash_col: str):
    """The 4×16-bit blocking keys for a 64-bit simhash column: band i's
    chunk ``(sig >>> 16i) & 0xFFFF`` with the band index packed into
    bits 16+ so ONE bigint column equi-groups across bands. Shared by
    :func:`simhash_near_pairs` and the streaming twin
    (``streaming.incremental.incremental_simhash``) so both block
    identically."""
    return F.array(*[
        (
            F.shiftrightunsigned(F.col(simhash_col), 16 * i)
            .bitwiseAND(F.lit(0xFFFF))
            + F.lit(i << 16)
        ).cast("bigint")
        for i in range(4)
    ])


def simhash_near_pairs(df: DataFrame, key: str = "doc_id", col: str = "text",
                       hash_fn: str = "xxhash64", max_hamming: int = 3,
                       max_bucket: int | None = 1000) -> DataFrame:
    """SimHash near-duplicate pairs: all (a < b) with Hamming distance
    ``<= max_hamming`` between their 64-bit signatures — the retrieval
    step :func:`simhash64` blocks for, completing the Charikar dedup
    path (sign hashing -> banded blocking -> popcount verify).

    Recall is EXACT for ``max_hamming <= 3``: signatures are blocked on
    4 disjoint 16-bit bands, and by pigeonhole two signatures within
    Hamming 3 agree on at least one whole band — so the banded equi-join
    misses nothing the verify step would keep. Output: (a, b, hamming).

    Scale shape: same inverted-index discipline as :func:`jaccard_pairs`
    — ONE signature scan, band keys explode map-side (4 small longs per
    doc; band index packs into the key's bits 16+ so one column
    equi-groups), per-bucket members collect to an array and pairs
    generate IN the array (no self-join re-deriving the signature scan),
    ``max_bucket`` caps degenerate buckets (the all-same-boilerplate
    pathology; ``None`` keeps exact semantics for oracle comparison).
    Cross-band duplicate candidates collapse in the final distinct,
    which runs AFTER the cheap popcount filter.
    """
    sigs = simhash64(df, key, col, hash_fn).select(
        F.col(key).alias("id"), "simhash"
    )
    banded = sigs.select(
        "id", "simhash", F.explode(simhash_band_keys("simhash")).alias("bkey")
    )
    postings = banded.groupBy("bkey").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("id"), F.col("simhash")))
        ).alias("ms")
    ).filter(F.size("ms") >= 2)
    if max_bucket is not None:
        postings = postings.filter(F.size("ms") <= max_bucket)
    pairgen = F.expr(
        "flatten(transform(ms, (x, i) ->"
        " transform(slice(ms, i + 2, size(ms)), y -> struct(x, y))))"
    )
    return (
        postings.select(F.explode(pairgen).alias("p"))
        .select(
            F.col("p.x.id").alias("a"),
            F.col("p.y.id").alias("b"),
            F.expr("bit_count(p.x.simhash ^ p.y.simhash)")
            .cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def minhash_accuracy_eval(df: DataFrame, key: str = "doc_id",
                          col: str = "text", k: int = SHINGLE_K,
                          num_hashes: int = 8, buckets: int = 20,
                          max_posting: int | None = 1000) -> DataFrame:
    """MinHash ESTIMATOR accuracy report — the companion to
    :func:`lsh_precision_eval` (which scores the BUCKETING): per exact-
    Jaccard band, how far is the signature-agreement estimate
    ``agree / num_hashes`` from the true Jaccard? The report that decides
    whether ``num_hashes`` is big enough before a threshold is trusted at
    scale (E[est] = J, stddev = sqrt(J(1-J)/H) — 8 hashes is a coarse
    estimator, and this view shows exactly how coarse, per band).

    Engine parity: est = agree/num_hashes and true j = inter/union are
    both exact BIGINT-over-BIGINT doubles; per-pair |est - j| quantizes
    to 6dp DECIMAL so the band mean is order-free; bands use the same
    exact-integer ``(inter*buckets) div union`` edges as
    :func:`jaccard_histogram`. Output: (bucket, lo, n_pairs,
    mean_abs_err).

    Scale shape: LSH candidates (banded, bounded buckets) join the
    signature table twice on single keys and the exact-intersection
    pairs once — every join input is candidate-pair- or doc-sized,
    never shingle-exploded; this is an EVAL meant for corpus samples,
    and cost tracks the candidate count like the dedup itself.
    """
    cands = minhash_lsh_candidates(df, key, col, k, num_hashes)
    sigs = minhash_signatures(df, key, col, k, num_hashes)
    na, nb, inter = _packed_intersections(df, key, col, k, max_posting)
    exact = inter.select(
        F.shiftrightunsigned(F.col("pa"), 22).alias("a"),
        F.shiftrightunsigned(F.col("pb"), 22).alias("b"),
        F.col("inter").alias("i"),
        (na + nb - F.col("inter")).alias("u"),
    )
    sa = sigs.select(F.col(key).alias("a"), F.col("sig").alias("sa"))
    sb = sigs.select(F.col(key).alias("b"), F.col("sig").alias("sb"))
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sa"), F.col("sb"), lambda x, y: x == y),
            lambda m: m,
        )
    )
    joined = (
        cands.join(sa, "a").join(sb, "b").join(exact, ["a", "b"])
        .select(
            F.least(
                F.expr(f"int((i * {buckets}) div u)"), F.lit(buckets - 1)
            ).alias("bucket"),
            F.round(
                F.abs(agree / F.lit(num_hashes) - F.col("i") / F.col("u")),
                6,
            ).cast("decimal(18,6)").alias("err"),
        )
    )
    return (
        joined.groupBy("bucket")
        .agg(F.count("*").alias("n_pairs"), F.sum("err").alias("__se"))
        .select(
            "bucket",
            F.round(F.col("bucket") / float(buckets), 4).alias("lo"),
            "n_pairs",
            F.round(
                F.col("__se").cast("double") / F.col("n_pairs"), 4
            ).alias("mean_abs_err"),
        )
    )


def bbit_minhash_eval(df: DataFrame, key: str = "doc_id",
                      col: str = "text", k: int = SHINGLE_K,
                      num_hashes: int = 8, b_bits: int = 4,
                      buckets: int = 20,
                      max_posting: int | None = 1000) -> DataFrame:
    """b-bit minwise hashing accuracy (Li & König, WWW'10): keep only the
    low ``b_bits`` of each minhash value — at b=4 that is 1/32 the
    signature bytes of the 128-bit digests — and correct the random-
    collision inflation with the unbiased estimator
    ``J = (c - c0) / (1 - c0)`` where ``c`` is the matched fraction and
    ``c0 = 2^-b`` the chance collision rate. Per exact-Jaccard band this
    reports the FULL-width estimator's mean |error| next to the b-bit
    one — the table that decides how many bits a 100 TB signature store
    actually keeps (more hashes at fewer bits usually wins at equal
    bytes).

    Engine parity: the low bits are the last ``b_bits/4`` hex chars of
    the md5 minhash (b_bits must be a multiple of 4); c0 literals
    (0.0625, 0.9375 at b=4) are written identically on both engines
    (never computed on one and literal on the other); per-pair errors
    quantize to 6dp DECIMAL so band means are order-free. The raw b-bit
    estimate may go slightly negative for dissimilar pairs — reported
    unclamped, as published.

    Scale shape identical to :func:`minhash_accuracy_eval`: every join
    input is candidate-pair- or doc-sized; a sample-scale EVAL.
    """
    if b_bits % 4 != 0:
        raise ValueError("b_bits must be a multiple of 4 (hex-digit slices)")
    nchars = b_bits // 4
    c0 = 1.0 / (1 << b_bits)
    cands = minhash_lsh_candidates(df, key, col, k, num_hashes)
    sigs = minhash_signatures(df, key, col, k, num_hashes)
    na, nb, inter = _packed_intersections(df, key, col, k, max_posting)
    exact = inter.select(
        F.shiftrightunsigned(F.col("pa"), 22).alias("a"),
        F.shiftrightunsigned(F.col("pb"), 22).alias("b"),
        F.col("inter").alias("i"),
        (na + nb - F.col("inter")).alias("u"),
    )
    sa = sigs.select(F.col(key).alias("a"), F.col("sig").alias("sa"))
    sb = sigs.select(F.col(key).alias("b"), F.col("sig").alias("sb"))
    agree = F.size(
        F.filter(
            F.zip_with(F.col("sa"), F.col("sb"), lambda x, y: x == y),
            lambda m: m,
        )
    )
    lo_eq = F.zip_with(
        F.col("sa"), F.col("sb"),
        lambda x, y: (
            F.substring(x, 33 - nchars, nchars)
            == F.substring(y, 33 - nchars, nchars)
        ),
    )
    agree_b = F.size(F.filter(lo_eq, lambda m: m))
    true_j = F.col("i") / F.col("u")
    est_full = agree / F.lit(num_hashes)
    est_b = (agree_b / F.lit(num_hashes) - F.lit(c0)) / F.lit(1.0 - c0)
    joined = (
        cands.join(sa, "a").join(sb, "b").join(exact, ["a", "b"])
        .select(
            F.least(
                F.expr(f"int((i * {buckets}) div u)"), F.lit(buckets - 1)
            ).alias("bucket"),
            F.round(F.abs(est_full - true_j), 6)
            .cast("decimal(18,6)").alias("ef"),
            F.round(F.abs(est_b - true_j), 6)
            .cast("decimal(18,6)").alias("eb"),
        )
    )
    return (
        joined.groupBy("bucket")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum("ef").alias("__sf"),
            F.sum("eb").alias("__sb"),
        )
        .select(
            "bucket",
            F.round(F.col("bucket") / float(buckets), 4).alias("lo"),
            "n_pairs",
            F.round(F.col("__sf").cast("double") / F.col("n_pairs"), 4)
            .alias("err_full"),
            F.round(F.col("__sb").cast("double") / F.col("n_pairs"), 4)
            .alias("err_bbit"),
        )
    )


def dedup_methods_overlap(df: DataFrame, key: str = "doc_id",
                          col: str = "text", k: int = SHINGLE_K,
                          jaccard_threshold: float = 0.5,
                          max_hamming: int = 3, min_shared: int = 2,
                          hash_fn: str = "xxhash64") -> DataFrame:
    """Which near-dup family catches what: the pairwise overlap of the
    FOUR pair detectors over ONE corpus — exact n-gram Jaccard at
    ``jaccard_threshold``, MinHash-LSH banding, SimHash Hamming
    ``<= max_hamming``, and winnowing local overlap (``>= min_shared``
    shared fingerprints). Grouped by presence vector, so the 15 possible
    cells read directly as a Venn diagram: pairs only SimHash sees
    (word-order rearrangements), pairs only winnowing sees (one long
    quoted passage inside otherwise-different docs), pairs only Jaccard
    sees (LSH band misses near the threshold), full agreement, etc. The
    report a data lead reads before picking (and budgeting) a dedup
    method.

    Scale shape: four independent candidate pipelines (each already
    bounded — capped postings, tiny LSH buckets, capped simhash bands,
    capped fingerprint postings) full-outer-joined on bare (a, b) long
    pairs, then a ≤15-row aggregate; nothing corpus-sized is added on
    top of the detectors themselves. This is an EVAL: run it on a
    corpus sample, not 100 TB.
    """
    jp = jaccard_pairs(
        df, key, col, k, threshold=jaccard_threshold
    ).select("a", "b", F.lit(True).alias("in_jaccard"))
    lp = minhash_lsh_candidates(df, key, col, k).select(
        "a", "b", F.lit(True).alias("in_lsh")
    )
    sp = simhash_near_pairs(
        df, key, col, hash_fn=hash_fn, max_hamming=max_hamming
    ).select("a", "b", F.lit(True).alias("in_simhash"))
    wp = winnow_near_pairs(
        df, key, col, k, min_shared=min_shared
    ).select("a", "b", F.lit(True).alias("in_winnow"))
    u = (
        jp.join(lp, ["a", "b"], "full_outer")
        .join(sp, ["a", "b"], "full_outer")
        .join(wp, ["a", "b"], "full_outer")
    )
    return (
        u.select(
            F.coalesce("in_jaccard", F.lit(False)).alias("in_jaccard"),
            F.coalesce("in_lsh", F.lit(False)).alias("in_lsh"),
            F.coalesce("in_simhash", F.lit(False)).alias("in_simhash"),
            F.coalesce("in_winnow", F.lit(False)).alias("in_winnow"),
        )
        .groupBy("in_jaccard", "in_lsh", "in_simhash", "in_winnow")
        .agg(F.count("*").alias("n_pairs"))
    )


def winnow_near_pairs(df: DataFrame, key: str = "doc_id",
                      col: str = "text", k: int = SHINGLE_K,
                      window: int = 4, min_shared: int = 2,
                      max_posting: int | None = 1000) -> DataFrame:
    """Winnowing-based overlap pairs — the MOSS pair stage on top of
    :func:`winnow_fingerprints`, completing the fourth dedup family's
    retrieval step (Jaccard, MinHash-LSH and SimHash already have
    theirs): all (a < b) sharing at least ``min_shared`` selected
    fingerprints. Winnowing guarantees any shared run of ~window+k-1
    words yields a shared fingerprint, so this finds LOCAL overlap
    (quoted passages, partial plagiarism) that whole-document Jaccard
    dilutes away. Output: (a, b, n_shared).

    Scale shape: identical discipline to :func:`minhash_lsh_candidates`
    — fingerprint postings group once, pairs generate IN the posting
    array, ``max_posting`` caps boilerplate fingerprints (a footer
    every page shares; cap only under-counts n_shared for capped
    fingerprints, never invents pairs), and only (a, b) long pairs
    shuffle to the final count.
    """
    fps = winnow_fingerprints(df, key, col, k, window)
    postings = fps.groupBy("fingerprint").agg(
        F.collect_list(F.col(key)).alias("ids")
    ).filter(F.size("ids") >= 2)
    if max_posting is not None:
        postings = postings.filter(F.size("ids") <= max_posting)
    return (
        postings.select(F.explode(_posting_pairs(F.col("ids"))).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def dedup_chunks(chunks: DataFrame, doc_col: str = "doc_id",
                 chunk_col: str = "chunk_id",
                 col: str = "chunk") -> DataFrame:
    """Chunk-level exact dedup — the hygiene step between
    ``textstats.chunk_documents`` and chunk embedding/indexing: syndicated
    or copied passages chunk into byte-identical windows across
    documents, and embedding them all wastes index space and skews
    retrieval toward duplicated content. Keeper = the minimum
    (doc, chunk) position per chunk digest; every copy carries the
    digest's total multiplicity.

    Output: (doc_col, chunk_col, keep, n_copies) — filter ``keep`` before
    the embed stage, or weight by ``1/n_copies`` instead.

    Scale shape: the digest groupBy shuffles (digest, packed-position)
    pairs — never chunk text (exact-dedup discipline, dedup.py top
    doc); the keeper position bit-packs ``doc * 2^22 + chunk`` into one
    bigint (long-only min; limits: doc < 2^41, chunk < 2^22 — a 4M-word
    document at stride 24), and the verdict joins back on the 128-bit
    digest.
    """
    pack = (
        F.col(doc_col).cast("bigint") * F.lit(1 << 22).cast("bigint")
        + F.col(chunk_col).cast("bigint")
    )
    d = chunks.select(
        F.col(doc_col), F.col(chunk_col), pack.alias("__p"),
        F.md5(F.col(col)).alias("__d"),
    )
    agg = d.groupBy("__d").agg(
        F.min("__p").alias("__keep"), F.count("*").alias("n_copies")
    )
    return d.join(agg, "__d").select(
        doc_col, chunk_col,
        (F.col("__p") == F.col("__keep")).alias("keep"),
        "n_copies",
    )


def simhash_band_recall(df: DataFrame, key: str = "doc_id",
                        col: str = "text", hash_fn: str = "xxhash64",
                        max_hamming: int = 3,
                        band_counts: tuple[int, ...] = (2, 4, 8)) -> DataFrame:
    """Banding tuning curve for SimHash blocking: for each candidate band
    count, how many candidate pairs does the banded join surface and what
    fraction of the TRUE Hamming-``<= max_hamming`` pair set does it
    recall? Pigeonhole says bands > max_hamming gives recall 1.0 — this
    report shows the price (candidate volume explodes as chunks narrow)
    and what recall 2 coarse bands actually lose. The
    :func:`ann_recall_eval` pattern applied to the Hamming family.

    Ground truth is a brute-force all-pairs popcount over the signature
    table (broadcast self-join) — inherent to recall evaluation; run it
    on a corpus SAMPLE, exactly like ann_recall_eval's exact baseline.
    Output: (n_bands, n_candidates, n_hits, n_truth, recall).
    """
    sigs = simhash64(df, key, col, hash_fn).select(
        F.col(key).alias("id"), "simhash"
    )
    right = sigs.select(F.col("id").alias("id2"),
                        F.col("simhash").alias("sim2"))
    truth = (
        sigs.crossJoin(F.broadcast(right))
        .filter(F.col("id") < F.col("id2"))
        .filter(F.expr("bit_count(simhash ^ sim2)") <= max_hamming)
        .select(F.col("id").alias("a"), F.col("id2").alias("b"))
    )
    n_truth = truth.agg(F.count("*").alias("n_truth"))
    outs = []
    for nb in band_counts:
        width = 64 // nb
        mask = (1 << width) - 1
        bkeys = F.array(*[
            (
                F.shiftrightunsigned(F.col("simhash"), width * i)
                .bitwiseAND(F.lit(mask))
                + F.shiftleft(F.lit(i).cast("bigint"), width)
            ).cast("bigint")
            for i in range(nb)
        ])
        banded = sigs.select("id", F.explode(bkeys).alias("bkey"))
        # Equi-JOIN pair generation, NOT collect_list + in-array pairs:
        # narrow chunks make buckets pathologically hot (measured at
        # sf0.1: the top 8-bit bucket held 3058 of 5000 docs, and the
        # in-array C(3058,2) ~ 4.7M-struct transform ran quadratically
        # inside ONE task — a multi-minute hang on an idle box). The
        # join spreads the same pair volume across the shuffle and AQE
        # can split the skewed bucket.
        right = banded.select(F.col("id").alias("id2"), "bkey")
        cands = (
            banded.join(right, "bkey")
            .filter(F.col("id") < F.col("id2"))
            .select(F.col("id").alias("a"), F.col("id2").alias("b"))
            .distinct()
        )
        hit = cands.join(truth, ["a", "b"], "left_semi")
        outs.append(
            cands.agg(F.count("*").alias("n_candidates"))
            .crossJoin(F.broadcast(hit.agg(F.count("*").alias("n_hits"))))
            .select(F.lit(nb).alias("n_bands"), "n_candidates", "n_hits")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.crossJoin(F.broadcast(n_truth)).select(
        "n_bands", "n_candidates", "n_hits", "n_truth",
        F.round(F.col("n_hits") * F.lit(1.0) / F.col("n_truth"), 4)
        .alias("recall"),
    )


def containment_histogram(df: DataFrame, key: str = "doc_id",
                          col: str = "text", k: int = SHINGLE_K,
                          buckets: int = 20,
                          max_posting: int | None = 1000) -> DataFrame:
    """Candidate-pair CONTAINMENT distribution — :func:`jaccard_histogram`
    for the asymmetric signal: how many pairs sit in each
    ``inter / min(|A|, |B|)`` band, i.e. what a containment threshold
    move would actually catch (embedded copies whose Jaccard stays low).
    Same exact integer band edges (``(inter * buckets) div min``), same
    shared inverted-index plan, one ``buckets``-row aggregate on top.
    Output: (bucket, lo, n_pairs)."""
    na, nb, inter = _packed_intersections(df, key, col, k, max_posting)
    pairs = inter.select(
        F.col("inter").alias("i"), F.least(na, nb).alias("m")
    )
    bucket = F.least(
        F.expr(f"int((i * {buckets}) div m)"), F.lit(buckets - 1)
    )
    return (
        pairs.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_pairs"))
        .select(
            "bucket",
            F.round(F.col("bucket") / float(buckets), 4).alias("lo"),
            "n_pairs",
        )
    )


def minhash_band_recall(df: DataFrame, key: str = "doc_id",
                        col: str = "text", k: int = SHINGLE_K,
                        num_hashes: int = 8,
                        band_counts: tuple[int, ...] = (2, 4, 8),
                        threshold: float = 0.5,
                        max_posting: int | None = 1000) -> DataFrame:
    """The LSH S-curve, measured instead of assumed: for each (bands,
    rows-per-band) split of the ``num_hashes`` MinHash signature, how
    many candidate pairs does banding surface and what fraction of the
    TRUE Jaccard-``>= threshold`` pair set does it recall? More bands =
    higher recall but more false candidates to verify (the datasketch
    b/r tuning knob, evaluated on THIS corpus rather than the
    theoretical 1-(1-s^r)^b curve). Companion evals:
    :func:`lsh_precision_eval` scores the shipped config;
    :func:`simhash_band_recall` is the Hamming twin.

    Candidate pairs use the EQUI-JOIN form, not in-array posting pairs —
    1-row bands bucket on a single minhash value and can be
    pathologically hot (the cap-or-join rule from simhash_band_recall's
    measured single-task hang). Truth reuses the exact inverted-index
    intersections with the standard hot-shingle cap, banded on the
    ROUNDED 4dp Jaccard (the same value a threshold filter would see).
    Output: (n_bands, rows_per_band, n_candidates, n_hits, n_truth,
    recall). A sample-scale EVAL, like its companions.
    """
    sigs = minhash_signatures(df, key, col, k, num_hashes)
    na, nb, inter = _packed_intersections(df, key, col, k, max_posting)
    truth = inter.select(
        F.shiftrightunsigned(F.col("pa"), 22).alias("a"),
        F.shiftrightunsigned(F.col("pb"), 22).alias("b"),
    ).where(
        F.round(F.col("inter") / (na + nb - F.col("inter")), 4)
        >= threshold
    )
    n_truth = truth.agg(F.count("*").alias("n_truth"))
    outs = []
    for bands in band_counts:
        bb = band_buckets(sigs, key, num_hashes, bands).select(
            F.col(key).alias("id"), "band", "bucket"
        )
        right = bb.select(F.col("id").alias("id2"), "band", "bucket")
        cands = (
            bb.join(right, ["band", "bucket"])
            .filter(F.col("id") < F.col("id2"))
            .select(F.col("id").alias("a"), F.col("id2").alias("b"))
            .distinct()
        )
        hits = cands.join(truth, ["a", "b"], "left_semi")
        outs.append(
            cands.agg(F.count("*").alias("n_candidates"))
            .crossJoin(F.broadcast(hits.agg(F.count("*").alias("n_hits"))))
            .select(
                F.lit(bands).alias("n_bands"),
                F.lit(num_hashes // bands).alias("rows_per_band"),
                "n_candidates", "n_hits",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.crossJoin(F.broadcast(n_truth)).select(
        "n_bands", "rows_per_band", "n_candidates", "n_hits", "n_truth",
        F.round(F.col("n_hits") * F.lit(1.0) / F.col("n_truth"), 4)
        .alias("recall"),
    )
