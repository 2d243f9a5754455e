"""Unit tests for dedup / similarity / textstats operators + plan shape."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_exact_dupes_finds_copies(spark):
    from ollama_ocr_spark.operators.dedup import exact_dupes

    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other")], ["doc_id", "text"]
    )
    out = {r["keeper"]: r["copies"] for r in exact_dupes(df).collect()}
    assert out == {1: 2, 3: 1}


def test_shingles_short_text_guard(spark):
    from ollama_ocr_spark.operators.dedup import shingles

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d e f")], ["doc_id", "text"]
    )
    rows = shingles(df).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["shingle"])
    assert 1 not in by_doc  # 3 words < k=5 → no shingles (not bogus ones)
    assert sorted(by_doc[2]) == ["a b c d e", "b c d e f"]


def test_jaccard_identical_docs(spark):
    from ollama_ocr_spark.operators.dedup import jaccard_pairs

    df = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5 w6"), (2, "w1 w2 w3 w4 w5 w6"), (3, "x " * 10)],
        ["doc_id", "text"],
    )
    rows = jaccard_pairs(df).collect()
    assert len(rows) == 1
    assert (rows[0]["a"], rows[0]["b"], rows[0]["jaccard"]) == (1, 2, 1.0)


def test_minhash_lsh_catches_exact_dupes(spark):
    from ollama_ocr_spark.operators.dedup import minhash_lsh_candidates

    text = " ".join(f"w{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, " ".join(f"z{i}" for i in range(30)))],
        ["doc_id", "text"],
    )
    pairs = {(r["a"], r["b"]) for r in minhash_lsh_candidates(df).collect()}
    assert (1, 2) in pairs
    assert all(p == (1, 2) for p in pairs)


def test_simhash_near_dupes_close(spark):
    from ollama_ocr_spark.operators.dedup import simhash64

    base = " ".join(f"tok{i}" for i in range(40))
    near = base + " extra"
    far = " ".join(f"other{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], ["doc_id", "text"]
    )
    sig = {r["doc_id"]: r["simhash"] for r in simhash64(df).collect()}
    d12 = bin(sig[1] ^ sig[2]).count("1")
    d13 = bin(sig[1] ^ sig[3]).count("1")
    assert d12 < d13
    assert d12 <= 12


def test_cosine_topk_exact(spark):
    from ollama_ocr_spark.operators.similarity import cosine_topk

    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (10, [1.0, 0.0, 0.0]),   # identical → cos 1.0
        (11, [0.9, 0.1, 0.0]),
        (12, [0.0, 1.0, 0.0]),   # orthogonal
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    out = cosine_topk(
        df.filter("vec_id >= 10"), df.filter("vec_id < 10"), k=2
    ).collect()
    ranked = sorted(out, key=lambda r: r["rank"])
    assert ranked[0]["neighbor_id"] == 10 and ranked[0]["cosine"] == 1.0
    assert ranked[1]["neighbor_id"] == 11
    assert math.isclose(ranked[1]["cosine"], 0.9939, abs_tol=1e-4)


def test_ivf_topk_recall(spark):
    from ollama_ocr_spark.operators.similarity import cosine_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    corpus = emb.filter("vec_id >= 10")
    queries = emb.filter("vec_id < 10")
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(corpus, queries, 5).collect()
    }
    # probing ALL cells must recover the exact answer (IVF is a pure
    # partition of the corpus)
    full = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(corpus, queries, 5, n_centroids=8, n_probe=8).collect()
    }
    assert full == exact
    # partial probing trades recall for a bounded candidate set; on
    # UNclustered random vectors the floor is ~n_probe/n_centroids
    part = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(corpus, queries, 5, n_centroids=16, n_probe=4).collect()
    }
    assert len(part & exact) / len(exact) >= 0.3


def test_ivf_recall_eval_report(spark):
    from ollama_ocr_spark.operators.similarity import ivf_recall_eval

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    corpus = emb.filter("vec_id >= 10")
    queries = emb.filter("vec_id < 10")
    # full probe: IVF is a pure partition of the corpus, recall == 1.0
    full = ivf_recall_eval(corpus, queries, k=5,
                           n_centroids=8, n_probe=8).collect()
    assert len(full) == 10
    assert all(r["recall_at_k"] == 1.0 and r["n_hits"] == 5 for r in full)
    # pruned probe: exactly one row per query, recall in [0, 1] and
    # genuinely < 1 for at least one query (the pruning is exercised)
    part = ivf_recall_eval(corpus, queries, k=5,
                           n_centroids=8, n_probe=2).collect()
    assert {r["query_id"] for r in part} == set(range(10))
    assert all(0.0 <= r["recall_at_k"] <= 1.0 for r in part)
    assert any(r["recall_at_k"] < 1.0 for r in part)


def test_bigram_logprob_flags_scrambled_order(spark):
    from ollama_ocr_spark.operators.textstats import (
        bigram_logprob_scores, unigram_logprob_scores)

    typical = "the quick brown fox jumps over the lazy dog"
    rows = [(i, typical) for i in range(8)]
    # same unigram distribution, scrambled order
    rows.append((100, "dog the lazy over jumps fox brown quick the"))
    rows.append((101, "hi"))  # single token → no bigrams, no row
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    bg = {r["doc_id"]: r for r in bigram_logprob_scores(df).collect()}
    assert 101 not in bg
    assert bg[0]["n_bigrams"] == 8
    # the scrambled doc's bigrams are all rare → clearly higher nats
    assert bg[100]["nats_per_bigram"] > bg[0]["nats_per_bigram"] + 0.5
    # ...while the unigram proxy cannot tell them apart
    ug = {r["doc_id"]: r for r in unigram_logprob_scores(df).collect()}
    assert ug[100]["nats_per_token"] == ug[0]["nats_per_token"]


def test_zipf_slope_ols_fit(spark):
    from ollama_ocr_spark.operators.textstats import zipf_slope

    # freq(token_r) = 2^(5-r): a perfect power law — OLS on ln/ln is an
    # exact line through the points, slope = -5*ln2/ln5 on ranks 1..5? No:
    # x = ln(rank) is NOT equispaced, so just check against numpy-free
    # closed form via the moments on 3 well-separated points.
    rows = []
    did = 0
    for rank, (tok, n) in enumerate([("aa", 64), ("bb", 16), ("cc", 4)], 1):
        for _ in range(n):
            rows.append((did, tok))
            did += 1
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    r = zipf_slope(df).collect()[0]
    assert r["n_ranked"] == 3
    # ln(freq) vs ln(rank): points (0, ln64), (ln2, ln16), (ln3, ln4).
    import math

    xs = [0.0, math.log(2), math.log(3)]
    ys = [math.log(64), math.log(16), math.log(4)]
    n = 3
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(r["slope"] - round(slope, 4)) <= 1e-4
    assert abs(r["intercept"] - round((sy - slope * sx) / n, 4)) <= 1e-4
    # flat distribution → zero slope
    flat = spark.createDataFrame(
        [(i, t) for i, t in enumerate(["xx", "yy", "zz"])],
        ["doc_id", "text"],
    )
    assert zipf_slope(flat).collect()[0]["slope"] == 0.0


def test_quality_deciles_equal_cut(spark):
    from ollama_ocr_spark.operators.textstats import quality_deciles

    # 20 docs from two populations → 10 deciles of 2 docs each; decile 1
    # holds the most typical (lowest-nats) docs.
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(10)]
    rows += [(100 + i, f"zq{i}x gibberish{i} qqq{i}") for i in range(10)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["decile"]: r for r in quality_deciles(df).collect()}
    assert sorted(out) == list(range(1, 11))
    assert all(out[d]["n_docs"] == 2 for d in out)
    assert sum(r["n_tokens"] for r in out.values()) == 10 * 9 + 10 * 3
    assert out[1]["mean_nats"] < out[10]["mean_nats"]


def test_dedup_representatives_keeps_longest(spark):
    from ollama_ocr_spark.operators.dedup import dedup_representatives

    base = " ".join(f"alpha{i}" for i in range(20))
    rows = [
        (1, base),
        (2, base + " omega extra"),  # near-dup of 1, longer → keeper
        (3, "totally different words here about nothing shared at all"),
        (10, "beta " + " ".join(f"g{i}" for i in range(15))),
        (11, "beta " + " ".join(f"g{i}" for i in range(15))),  # exact dup
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["cluster"]: r for r in dedup_representatives(df).collect()}
    assert set(out) == {1, 10}
    assert out[1]["kept_doc"] == 2 and out[1]["n_members"] == 2
    assert out[1]["kept_tokens"] == 22 and out[1]["tokens_dropped"] == 20
    # identical lengths tie-break to the lowest doc_id
    assert out[10]["kept_doc"] == 10 and out[10]["tokens_dropped"] == 16


def test_lsh_precision_eval_perfect_on_exact_dups(spark):
    from ollama_ocr_spark.operators.dedup import lsh_precision_eval

    base = " ".join(f"tok{i}" for i in range(20))
    other = " ".join(f"zzz{i}" for i in range(20))
    rows = [(1, base), (2, base), (3, other), (4, other), (5, "short one")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    r = lsh_precision_eval(df).collect()[0]
    # identical texts: LSH surfaces both pairs, both clear jaccard 1.0
    assert r["n_candidates"] == 2 and r["n_true_pairs"] == 2
    assert r["n_hits"] == 2
    assert r["precision_at_t"] == 1.0 and r["recall_at_t"] == 1.0
    assert r["threshold"] == 0.5


def test_curation_funnel_rows_and_cumulative(spark):
    from ollama_ocr_spark.operators.textstats import curation_funnel

    good = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away to the old stone house in the valley")
    rows = [
        (1, good),
        (2, good),            # exact dup of 1 → duplicate
        (3, "tiny"),          # < 10 words → quality
        (4, good + " extra words to stay unique and long enough here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["stage"]: r for r in curation_funnel(df).collect()}
    assert [out[s]["gate"] for s in (1, 2, 3)] == [
        "duplicate", "quality", "repetition"]
    assert out[1]["n_failed"] == 1 and out[1]["n_surviving"] == 3
    assert out[2]["n_failed"] == 1 and out[2]["n_surviving"] == 2
    # zero-failure gates still emit a row (inline gate table, left join)
    assert out[3]["n_failed"] == 0 and out[3]["n_surviving"] == 2


def test_drop_repeated_lines_keeps_first_occurrence(spark):
    from ollama_ocr_spark.operators.dedup import drop_repeated_lines

    df = spark.createDataFrame(
        [(1, "a\nb\na\nc\nb"), (2, "solo")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in drop_repeated_lines(df).collect()}
    assert out[1]["text"] == "a\nb\nc"
    assert out[1]["n_lines_in"] == 5 and out[1]["n_lines_kept"] == 3
    assert out[2]["text"] == "solo" and out[2]["n_lines_kept"] == 1


def test_encoding_health_attributes_damage(spark):
    from ollama_ocr_spark.operators.textstats import encoding_health

    rows = [
        (1, "s1", "clean text"),
        (2, "s1", "itâ€™s broken"),   # 'â€™' mojibake
        (3, "s1", "lost � char"),
        (4, "s2", "ctl \x07 byte"),
        (5, "s2", "fine"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {r["source"]: r for r in encoding_health(df).collect()}
    assert out["s1"]["mojibake_docs"] == 1
    assert out["s1"]["replacement_docs"] == 1
    assert out["s1"]["control_docs"] == 0
    assert out["s1"]["damaged_frac"] == round(2 / 3, 4)
    assert out["s2"]["control_docs"] == 1 and out["s2"]["n_docs"] == 2


def test_crawl_budget_integer_allocation(spark):
    from datetime import datetime

    from ollama_ocr_spark.operators.maintenance import crawl_budget

    t0, t1 = datetime(2024, 1, 1), datetime(2024, 1, 2)
    rows = [
        # host a: one changed recrawl + one single-capture url
        ("https://a.com/x", t0, b"v1"), ("https://a.com/x", t1, b"v2"),
        ("https://a.com/y", t0, b"s"),
        # host b: one stable recrawl + one single-capture url
        ("https://b.com/x", t0, b"same"), ("https://b.com/x", t1, b"same"),
        ("https://b.com/y", t0, b"s"),
    ]
    pages = spark.createDataFrame(rows, ["url", "warc_ts", "html"])
    out = {r["host"]: r for r in crawl_budget(pages, 1000).collect()}
    a, b = out["a.com"], out["b.com"]
    assert a["n_urls"] == 2 and b["n_urls"] == 2
    assert a["n_changed"] == 1 and b["n_changed"] == 0
    # churn per-mille: 1 changed of 1 recrawled vs 0 of 1
    assert a["churn_pm"] == 1000 and b["churn_pm"] == 0
    assert a["weight"] == 4000 and b["weight"] == 2000
    # integer div allocation: 1000*4000//6000=666, 1000*2000//6000=333
    assert a["budget"] == 666 and b["budget"] == 333
    assert a["budget"] + b["budget"] <= 1000


def test_robots_filter_longest_match(spark):
    from ollama_ocr_spark.operators.maintenance import robots_filter

    pages = spark.createDataFrame(
        [("https://a.com/docs/guide-1.html",),
         ("https://a.com/docs/guide-1.html",),   # duplicate capture
         ("https://a.com/blog/post-2.html",),
         ("https://b.com/docs/guide-3.html",),   # host with no rules
         ("https://a.com/docs/api-4.html?x=1",)],
        ["url"],
    )
    rules = spark.createDataFrame(
        [("a.com", "/docs/"), ("a.com", "/docs/guide")],
        ["host", "disallow"],
    )
    out = {r["url"]: r for r in robots_filter(pages, rules).collect()}
    assert len(out) == 4  # distinct urls, duplicate capture collapsed
    g = out["https://a.com/docs/guide-1.html"]
    # most-specific (longest) rule wins
    assert not g["allowed"] and g["rule"] == "/docs/guide"
    a = out["https://a.com/docs/api-4.html?x=1"]
    # query string stripped before the prefix match
    assert not a["allowed"] and a["rule"] == "/docs/" and a["path"] == "/docs/api-4.html"
    assert out["https://a.com/blog/post-2.html"]["allowed"]
    assert out["https://b.com/docs/guide-3.html"]["allowed"]


def test_robots_rule_stats_shadowed_rule_is_dead(spark):
    """A rule fully shadowed by a longer rule reports n_blocked=0 (every
    blocked url attributes to its LONGEST match), and rules with no
    matching urls at all also surface with fires=False."""
    from ollama_ocr_spark.operators.maintenance import robots_rule_stats

    pages = spark.createDataFrame(
        [("https://a.com/docs/guide-1.html",),
         ("https://a.com/docs/guide-2.html",),
         ("https://a.com/blog/post-3.html",)],
        ["url"],
    )
    rules = spark.createDataFrame(
        [("a.com", "/docs/"),          # shadowed: every /docs/ url is guide*
         ("a.com", "/docs/guide"),     # wins both docs urls
         ("a.com", "/admin/"),         # dead: nothing matches
         ("b.com", "/docs/")],         # dead: host absent from corpus
        ["host", "disallow"],
    )
    out = {(r["host"], r["rule"]): r
           for r in robots_rule_stats(pages, rules).collect()}
    assert len(out) == 4  # one row per rule, dead ones included
    assert out[("a.com", "/docs/guide")]["n_blocked"] == 2
    assert out[("a.com", "/docs/guide")]["fires"]
    for dead in [("a.com", "/docs/"), ("a.com", "/admin/"),
                 ("b.com", "/docs/")]:
        assert out[dead]["n_blocked"] == 0 and not out[dead]["fires"]


def test_nb_quality_separates_seed_tokens(spark):
    from ollama_ocr_spark.operators.textstats import nb_quality_scores

    rows = (
        [(i, "alpha alpha beam alpha", "wiki") for i in range(4)]
        + [(i + 10, "spam spam junk spam", "web") for i in range(4)]
        # held-out docs written in each side's vocabulary
        + [(20, "alpha beam alpha", "web"), (21, "spam junk junk", "web")]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = {
        r["doc_id"]: r
        for r in nb_quality_scores(df, F.col("source") == "wiki").collect()
    }
    assert len(out) == 10
    # seed flag echoes the label; token counts are real
    assert out[0]["is_seed"] and not out[10]["is_seed"]
    assert out[0]["n_tokens"] == 4
    # the classifier separates its own vocabulary: seed-voc docs score
    # positive (nb_keep), spam-voc docs negative — including held-out
    # docs NOT in the positive seed
    assert out[20]["log_odds"] > 0 and out[20]["nb_keep"]
    assert out[21]["log_odds"] < 0 and not out[21]["nb_keep"]
    assert all(out[i]["nb_keep"] for i in range(4))
    assert not any(out[i + 10]["nb_keep"] for i in range(4))


def test_winnow_fingerprints_shape(spark):
    from ollama_ocr_spark.operators.dedup import winnow_fingerprints

    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(20))), (2, "a b")],
        ["doc_id", "text"],
    )
    rows = winnow_fingerprints(df).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    # 20 words → 16 k-grams → 13 windows; winnowing keeps a strict subset
    assert 1 <= len(by_doc[1]) <= 13
    assert 2 not in by_doc  # too short for any k-gram


def test_quality_and_langid(spark):
    from ollama_ocr_spark.operators.textstats import (
        with_langid,
        with_quality_score,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog and runs away"),
         (2, "zzz")],
        ["doc_id", "text"],
    )
    q = {r["doc_id"]: r for r in with_quality_score(df).collect()}
    assert q[1]["quality_ok"] is True
    assert q[2]["quality_ok"] is False
    langs = {r["doc_id"]: r["pred_lang"] for r in with_langid(df).collect()}
    assert langs == {1: "en", 2: "und"}


def test_repetition_stats(spark):
    from ollama_ocr_spark.operators.textstats import with_repetition_stats

    df = spark.createDataFrame(
        [(1, "spam " * 19 + "spam"),                       # 20x one word
         (2, "the quick brown fox jumps over a lazy dog today")],
        ["doc_id", "text"],
    )
    r = {row["doc_id"]: row for row in with_repetition_stats(df).collect()}
    assert r[1]["distinct_word_frac"] == 0.05
    assert r[1]["top_word_frac"] == 1.0
    assert r[1]["dup_kgram_frac"] == round(1 - 1 / 16, 4)
    assert r[1]["repetition_ok"] is False
    assert r[2]["distinct_word_frac"] == 1.0
    assert r[2]["dup_kgram_frac"] == 0.0
    assert r[2]["repetition_ok"] is True
    # zero shuffles: all map-side array expressions
    from ollama_ocr_spark.plans.audit import plan_report
    assert plan_report(with_repetition_stats(df)).n_exchanges == 0


def test_dedup_components_multi_hop(spark):
    from ollama_ocr_spark.operators.dedup import dedup_components

    # two components: chain 1-2-3-4 (diameter 3, needs >1 round) and 7-8
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 8)], ["a", "b"]
    )
    labels = {r["node"]: r["label"]
              for r in dedup_components(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 8: 7}


def test_drop_duplicate_paragraphs(spark):
    from ollama_ocr_spark.operators.dedup import drop_duplicate_paragraphs

    boiler = "subscribe now"
    df = spark.createDataFrame(
        [(1, f"{boiler}\n\nalpha body one\n\nfooter x"),
         (2, f"{boiler}\n\nbeta body two\n\nfooter x"),
         (3, f"{boiler}\n\ngamma body three\n\nunique tail")],
        ["doc_id", "text"],
    )
    r = {row["doc_id"]: row
         for row in drop_duplicate_paragraphs(df).collect()}
    # boiler (3x) and "footer x" (2x) dropped; order preserved
    assert r[1]["text"] == "alpha body one"
    assert r[2]["text"] == "beta body two"
    assert r[3]["text"] == "gamma body three\n\nunique tail"
    assert r[3]["n_paras_in"] == 3 and r[3]["n_paras_kept"] == 2


def test_pii_scrub(spark):
    from ollama_ocr_spark.operators.textstats import with_pii_scrub

    df = spark.createDataFrame(
        [(1, "mail bob.smith@corp.example.org from 192.168.1.20 "
             "or ring +44 123 456 7890 now"),
         (2, "no pii here, just words and 42 numbers")],
        ["doc_id", "text"],
    )
    r = {row["doc_id"]: row for row in with_pii_scrub(df).collect()}
    assert (r[1]["n_emails"], r[1]["n_ipv4"], r[1]["n_phones"]) == (1, 1, 1)
    assert r[1]["scrubbed"] == (
        "mail [EMAIL] from [IP] or ring [PHONE] now")
    assert r[1]["pii_free"] is False
    assert r[2]["scrubbed"] == r[2]["text"] and r[2]["pii_free"] is True
    # zero shuffles: all map-side regexp expressions
    from ollama_ocr_spark.plans.audit import plan_report
    assert plan_report(with_pii_scrub(df)).n_exchanges == 0


def test_single_shuffle_extract_plan(spark, documents_smoke):
    """Plan shape: balance_by_url + latest_capture + extract = ONE exchange,
    and the parquet scan is pruned to the 4 kernel columns."""
    from ollama_ocr_spark.operators.extract import extract_stage
    from ollama_ocr_spark.operators.maintenance import balance_by_url, latest_capture

    pages = synthesized = None
    from ollama_ocr_spark.operators.extract import synthesize_stage

    pages = synthesize_stage(documents_smoke)
    plan = (
        extract_stage(latest_capture(balance_by_url(pages, 8)))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "WindowGroupLimit" in plan


def test_hash_split_total_disjoint_deterministic(spark):
    from ollama_ocr_spark.operators.maintenance import hash_split

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    counts = {r["split"]: r["count"]
              for r in hash_split(df, key="doc_id")
              .groupBy("split").count().collect()}
    assert sum(counts.values()) == 2000          # total: every row assigned
    assert set(counts) == {"train", "val", "test"}
    assert 0.85 < counts["train"] / 2000 < 0.95  # ~0.9 within md5 noise
    # determinism: identical assignment on re-evaluation
    a = dict(hash_split(df, key="doc_id").select("doc_id", "split").collect())
    b = dict(hash_split(df, key="doc_id").select("doc_id", "split").collect())
    assert a == b


def test_family_split_cluster_atomic(spark):
    """Every near-dup family lands in exactly ONE split; documents with no
    family fall back to hash_split of their own id (leakage-safe split)."""
    from ollama_ocr_spark.operators.dedup import dedup_components
    from ollama_ocr_spark.operators.maintenance import family_split, hash_split

    docs = spark.range(300).withColumnRenamed("id", "doc_id")
    # chains 0-1-2, 10-11-12, ... : multi-hop families
    pairs = (
        docs.filter((F.col("doc_id") % 10) < 2)
        .select(F.col("doc_id").alias("a"),
                (F.col("doc_id") + 1).alias("b"))
    )
    labels = dedup_components(pairs)
    out = family_split(docs, labels, key="doc_id")
    # atomicity: one split per family
    per_fam = out.groupBy("family").agg(
        F.count_distinct("split").alias("ns")).collect()
    assert all(r["ns"] == 1 for r in per_fam)
    rows = {r["doc_id"]: (r["family"], r["split"]) for r in out.collect()}
    # chained docs share the min-id family label
    assert rows[0][0] == rows[1][0] == rows[2][0] == 0
    assert rows[10][0] == rows[12][0] == 10
    # singletons degrade to plain hash_split of their own id
    single = dict(
        hash_split(docs.filter(F.col("doc_id") % 10 >= 3), key="doc_id")
        .select("doc_id", "split").collect()
    )
    for did, split in single.items():
        assert rows[did] == (did, split)


def test_export_shards_layout_and_pruning(spark, tmp_path):
    """export_shards writes hive-partitioned (split, shard) dirs and a
    single-cell read partition-prunes: the scan touches one directory."""
    from ollama_ocr_spark.operators.maintenance import (
        export_shards, hash_split, shard_plan)

    docs = spark.createDataFrame(
        [(i, "w " * (i % 9 + 1)) for i in range(300)], ["doc_id", "text"]
    )
    out = shard_plan(hash_split(docs, key="doc_id"), n_shards=4,
                     within=("split",))
    path = str(tmp_path / "export")
    export_shards(out, path)
    import os
    splits = sorted(d for d in os.listdir(path) if d.startswith("split="))
    assert splits == ["split=test", "split=train", "split=val"]
    assert sorted(os.listdir(f"{path}/split=train")) == [
        "shard=0", "shard=1", "shard=2", "shard=3"]
    back = spark.read.parquet(path)
    assert back.count() == 300
    one = back.filter((F.col("split") == "train") & (F.col("shard") == 2))
    plan = one._jdf.queryExecution().executedPlan().toString()
    # partition pruning reached the scan: the split+shard filters are
    # partition filters, not data filters
    assert "PartitionFilters" in plan
    assert one.count() == out.filter(
        (F.col("split") == "train") & (F.col("shard") == 2)).count()


def test_shard_plan_single_exchange(spark):
    """Sharding costs exactly ONE shuffle (the (band, cell) window) — no
    global sort, no second exchange: the 100 TB contract of shard_plan."""
    from ollama_ocr_spark.operators.maintenance import shard_plan

    docs = spark.createDataFrame(
        [(i, "w " * (i % 9 + 1)) for i in range(100)], ["doc_id", "text"]
    )
    plan = (
        shard_plan(docs, n_shards=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert plan.count("Window") == 1


def test_compaction_plan_grouping_semantics(spark):
    """Exclusive-cumsum bucketing: a file that crosses the target boundary
    stays in the group it started; an oversized file gets its own group;
    partitions plan independently."""
    from ollama_ocr_spark.operators.maintenance import compaction_plan

    files = spark.createDataFrame(
        [("p1", 1, 600), ("p1", 2, 600), ("p1", 3, 600),   # 600+600 | 600
         ("p1", 4, 5000),                                   # giant: own group
         ("p1", 5, 100),
         ("p2", 1, 100)],                                   # fresh partition
        ["part", "file_id", "bytes"],
    )
    out = {(r["part"], r["file_id"]): r["grp"]
           for r in compaction_plan(files, target_bytes=1000).collect()}
    assert out[("p1", 1)] == 0 and out[("p1", 2)] == 0   # 0, 600 < 1000
    assert out[("p1", 3)] == 1                            # starts at 1200
    assert out[("p1", 4)] == 1                            # starts at 1800
    assert out[("p1", 5)] == 6                            # after the giant
    assert out[("p2", 1)] == 0


def test_shard_plan_token_balance(spark):
    """Banded round-robin sharding: every doc assigned, shards within a
    tight token-mass band of each other, assignment deterministic."""
    from ollama_ocr_spark.operators.maintenance import shard_plan

    docs = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        # heavy-tailed doc sizes: 1..~60 words
        F.concat_ws(
            " ",
            F.array_repeat(F.lit("w"), (F.pmod(F.col("id") * 37, F.lit(60))
                                        + 1).cast("int")),
        ).alias("text"),
    )
    out = shard_plan(docs, n_shards=8)
    per = {r["shard"]: r["tokens"] for r in
           out.groupBy("shard").agg(F.sum("n_tokens").alias("tokens"))
           .collect()}
    assert set(per) == set(range(8))
    assert out.count() == 3000
    mean = sum(per.values()) / 8
    for tok in per.values():
        assert abs(tok - mean) / mean < 0.05   # token mass balanced
    a = sorted(out.select("doc_id", "shard").collect())
    b = sorted(shard_plan(docs, n_shards=8)
               .select("doc_id", "shard").collect())
    assert a == b


def test_pretraining_export_reconciles_with_curate(spark):
    """The export manifest's doc total equals curate_corpus's keep count
    (same gates, same corpus) and every (split, shard) cell is nonempty
    at sf0.001 — the two composites must tell one story."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    manifest = entry.queries()["pretraining_export"](spark, sf).collect()
    kept = (
        entry.queries()["curate_corpus"](spark, sf)
        .filter(F.col("keep")).count()
    )
    assert sum(r["n_docs"] for r in manifest) == kept
    assert {r["split"] for r in manifest} == {"train", "val", "test"}
    train = {r["shard"]: r["tokens"] for r in manifest
             if r["split"] == "train"}
    mean = sum(train.values()) / len(train)
    for tok in train.values():
        assert abs(tok - mean) / mean < 0.2   # balanced at tiny scale


def test_containment_catches_subset_dup_jaccard_misses(spark):
    """A short doc fully embedded in a long doc: containment = 1.0 while
    Jaccard stays low — the asymmetric signal the operator exists for."""
    from ollama_ocr_spark.operators.dedup import containment_pairs, jaccard_pairs

    small = "alpha beta gamma delta epsilon zeta eta theta"
    big = small + " " + " ".join(f"filler{i} pad{i} more{i}" for i in range(20))
    df = spark.createDataFrame([(1, small), (2, big)], ["doc_id", "text"])
    c = containment_pairs(df).collect()
    assert len(c) == 1 and c[0]["containment"] == 1.0
    assert c[0]["contained_id"] == 1
    j = jaccard_pairs(df).collect()
    assert j[0]["jaccard"] < 0.2   # same pair, Jaccard under-scores it


def test_bm25_ranking_semantics(spark):
    """Rare-term matches outrank common-term matches; higher tf wins
    within a term; k caps the result."""
    from ollama_ocr_spark.operators.search import bm25_topk, positional_postings

    rows = [
        (1, "rare filler a b c d e f"),          # 1x rare
        (2, "rare rare filler g h i j k"),       # 2x rare -> beats doc 1
        (3, "common stuff here p q r s t"),      # only the common term
    ] + [(10 + i, f"common pad{i} x{i} y{i} z{i} w{i} v{i} u{i}")
         for i in range(8)]                       # make 'common' common
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = bm25_topk(positional_postings(df), ["rare", "common"], k=3)
    got = [r["doc_id"] for r in out.collect()]
    assert len(got) == 3
    assert got[0] == 2 and got[1] == 1   # rare-term docs lead, tf breaks
    s = {r["doc_id"]: r["score"] for r in
         bm25_topk(positional_postings(df), ["rare", "common"], k=20)
         .collect()}
    assert s[2] > s[1] > s[3] > 0


def test_topic_mix_weights_normalized(spark):
    """Per-topic weights ~sum to 1, token_share exact, every vector
    assigned to exactly one topic."""
    from ollama_ocr_spark.operators.similarity import topic_mix

    vecs = spark.range(64).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 4).cast("float"),
            ((F.col("id") + 1) % 3).cast("float"),
            F.lit(1.0).cast("float"),
        ).alias("embedding"),
    )
    toks = spark.range(64).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 7 + 1).alias("n_tokens"),
    )
    out = topic_mix(vecs, toks, n_centroids=4).collect()
    assert sum(r["n_docs"] for r in out) == 64
    assert abs(sum(r["weight"] for r in out) - 1.0) < 1e-4
    assert abs(sum(r["token_share"] for r in out) - 1.0) < 1e-4
    total = sum(r["n_tokens"] for r in out)
    for r in out:
        assert abs(r["token_share"] - r["n_tokens"] / total) < 1e-6


def test_line_filter_idempotent(spark):
    from ollama_ocr_spark.operators.textstats import with_line_filter

    df = spark.createDataFrame(
        [(1, "A good long sentence with many words here.\nshort\n"
             "Please enable javascript now.\nAnother fine sentence "
             "that clearly qualifies today!")],
        ["doc_id", "text"],
    )
    once = with_line_filter(df).select(
        "doc_id", F.col("clean_text").alias("text"))
    twice = with_line_filter(once).first()
    # every kept line passes the rules, so a second pass keeps everything
    assert twice["n_lines"] == twice["n_lines_kept"] == 2
    assert twice["clean_text"] == twice["text"]


def test_pack_sequences_respects_budget(spark):
    from ollama_ocr_spark.operators.textstats import pack_sequences

    df = spark.range(500).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.col("id") * 37, F.lit(900)) + 1).alias("n_ws_tokens"),
    )
    packed = pack_sequences(df, budget=1000, buckets=4)
    per_bin = packed.groupBy("bucket", "bin_id").agg(
        F.sum("tokens").alias("total"), F.max("tokens").alias("biggest")
    )
    # greedy rule: all docs before the overflowing one fit the budget
    bad = per_bin.filter(F.col("total") - F.col("biggest") >= 1000).count()
    assert bad == 0
    assert packed.count() == 500


def test_benchmark_contamination_flags_and_broadcasts(spark):
    from ollama_ocr_spark.operators.dedup import benchmark_contamination

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "a completely different sentence about sailing ships at sea"),
         (3, "the quick brown fox jumps over something else entirely"),
         (4, "tiny")],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)], ["text"]
    )
    out = {r["doc_id"]: r for r in
           benchmark_contamination(docs, bench).collect()}
    assert out[1]["contaminated"] and out[1]["n_hits"] == out[1]["n_shingles"]
    assert not out[2]["contaminated"] and out[2]["n_hits"] == 0
    assert out[3]["contaminated"]        # shares the leading 4-grams
    assert 0 < out[3]["n_hits"] < out[3]["n_shingles"]
    assert out[4]["n_shingles"] == 0 and not out[4]["contaminated"]
    # plan: the benchmark shingle set must broadcast (eval sets are tiny);
    # the corpus side never shuffles into a big-big join
    from ollama_ocr_spark.plans.audit import plan_report

    assert plan_report(benchmark_contamination(docs, bench)).n_broadcasts >= 1

    # monotone in the benchmark set: growing the eval set only ADDS flags
    bigger = bench.union(spark.createDataFrame(
        [("a completely different sentence about sailing ships at sea",)],
        ["text"]))
    more = {r["doc_id"] for r in
            benchmark_contamination(docs, bigger)
            .filter("contaminated").collect()}
    assert {1, 3} < more and 2 in more


def test_contamination_by_source_rollup(spark):
    """Per-source drill-down agrees with the doc-level screen rolled up by
    hand; empty-shingle docs count in n_docs but contribute 0 shingles."""
    from ollama_ocr_spark.operators.dedup import (benchmark_contamination,
                                                  contamination_by_source)

    docs = spark.createDataFrame(
        [(1, "mirror", "the quick brown fox jumps over the lazy dog"),
         (2, "mirror", "the quick brown fox jumps over something else"),
         (3, "clean", "a completely different sentence about sailing ships"),
         (4, "clean", "tiny")],
        ["doc_id", "source", "text"],
    )
    bench = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)], ["text"])
    per_doc = {r["doc_id"]: r
               for r in benchmark_contamination(docs, bench).collect()}
    got = {r["source"]: r
           for r in contamination_by_source(docs, bench).collect()}
    m = got["mirror"]
    assert m["n_docs"] == 2 and m["n_contaminated"] == 2
    assert m["n_hit_shingles"] == per_doc[1]["n_hits"] + per_doc[2]["n_hits"]
    assert m["n_shingles"] == (per_doc[1]["n_shingles"]
                               + per_doc[2]["n_shingles"])
    c = got["clean"]
    assert c["n_docs"] == 2 and c["n_contaminated"] == 0
    assert c["doc_rate"] == 0.0 and c["hit_rate"] == 0.0
    # all-shingle-less source: hit_rate guards the 0/0
    empty = spark.createDataFrame([(9, "s", "x")],
                                  ["doc_id", "source", "text"])
    row = contamination_by_source(empty, bench).collect()[0]
    assert row["n_shingles"] == 0 and row["hit_rate"] == 0.0


def test_remove_duplicate_spans_cut(spark):
    """The cut removes exactly the interval-union the coverage operator
    measures; kept words stay in order; within-doc-only repeats survive."""
    from ollama_ocr_spark.operators.dedup import (duplicated_ngram_coverage,
                                                  remove_duplicate_spans)

    shared = "one two three four"          # k=4 span shared across docs
    docs = spark.createDataFrame(
        [(1, shared + " alpha beta gamma"),
         (2, "prefix words here " + shared),
         (3, "totally novel text with no overlap at all"),
         (4, "loop loop loop loop loop loop")],   # within-doc only
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r
           for r in remove_duplicate_spans(docs, k=4).collect()}
    assert got[1]["clean_text"] == "alpha beta gamma"
    assert got[1]["n_removed"] == 4
    assert got[2]["clean_text"] == "prefix words here"
    assert got[3]["n_removed"] == 0 and got[3]["clean_text"].startswith(
        "totally novel")
    # 'loop loop loop loop' repeats only WITHIN doc 4 — not removed
    assert got[4]["n_removed"] == 0
    cov = {r["doc_id"]: r["covered"]
           for r in duplicated_ngram_coverage(docs, k=4).collect()}
    assert all(got[d]["n_removed"] == cov[d] for d in cov)


def test_lsh_bucket_histogram_classes(spark):
    """Identical docs collapse into one bucket per band; the pair bound is
    the quadratic in-bucket expansion n*(n-1)/2."""
    from ollama_ocr_spark.operators.dedup import lsh_bucket_histogram

    t = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [(i, t) for i in range(3)]
        + [(9, "a completely different sentence about sailing ships")],
        ["doc_id", "text"],
    )
    rows = lsh_bucket_histogram(docs).collect()
    got = {(r["band"], r["size_class"]): (r["n_buckets"], r["n_docs"],
                                          r["pair_bound"])
           for r in rows}
    # per band: one 3-doc bucket (identical texts) + one singleton
    assert all(got[(b, "3-4")] == (1, 3, 3) for b in range(4)), got
    assert all(got[(b, "1")] == (1, 1, 0) for b in range(4)), got


def test_split_leakage_counts_cross_split_pairs(spark):
    """Near-dup pairs crossing a split boundary surface as (train, test)
    rows; the pair count matches the candidate generator's."""
    from ollama_ocr_spark.operators.dedup import (minhash_lsh_candidates,
                                                  split_leakage)

    t = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [(1, t, "train"), (2, t, "test"), (3, t, "train"),
         (4, "a completely different sentence about sailing ships", "val")],
        ["doc_id", "text", "split"],
    )
    got = {(r["split_a"], r["split_b"]): r["n_pairs"]
           for r in split_leakage(docs).collect()}
    # pairs (1,2) train-test, (1,3) train-train, (2,3) train-test
    assert got == {("test", "train"): 2, ("train", "train"): 1}
    assert sum(got.values()) == minhash_lsh_candidates(docs).count()


def test_dedup_savings_per_source(spark):
    from ollama_ocr_spark.operators.dedup import dedup_savings

    docs = spark.createDataFrame(
        [("a", "same text here"), ("a", "same text here"),
         ("a", "unique one two"), ("b", "only row")],
        ["source", "text"],
    )
    got = {r["source"]: r for r in dedup_savings(docs).collect()}
    a = got["a"]
    assert a["n_docs"] == 3 and a["n_unique_docs"] == 2
    assert a["n_tokens"] == 9 and a["n_kept_tokens"] == 6
    assert a["doc_savings"] == round(1 - 2 / 3, 4)
    assert a["token_savings"] == round(1 - 6 / 9, 4)
    b = got["b"]
    assert b["n_docs"] == b["n_unique_docs"] == 1
    assert b["doc_savings"] == 0.0 and b["token_savings"] == 0.0


def test_vocab_coverage_curve(spark):
    """Coverage is the cumulative top-N occurrence share: monotone in N,
    saturating at 1.0 once N >= vocab size; vocab_size clamps to V."""
    from ollama_ocr_spark.operators.textstats import vocab_coverage

    docs = spark.createDataFrame(
        [(1, "aa aa aa bb bb cc"), (2, "aa dd")], ["doc_id", "text"])
    got = {r["n_vocab"]: r
           for r in vocab_coverage(docs, sizes=(1, 2, 10)).collect()}
    # counts: aa=4, bb=2, cc=1, dd=1 → total 8, V=4
    assert got[1]["covered_tokens"] == 4 and got[1]["coverage"] == 0.5
    assert got[2]["covered_tokens"] == 6 and got[2]["coverage"] == 0.75
    assert got[10]["covered_tokens"] == 8 and got[10]["coverage"] == 1.0
    assert got[10]["vocab_size"] == 4 and got[2]["vocab_size"] == 2
    assert all(r["total_tokens"] == 8 for r in got.values())


def test_domain_mix_deterministic_and_weighted(spark):
    from ollama_ocr_spark.operators.maintenance import domain_mix

    df = spark.range(8000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("src"), (F.col("id") % 4).cast("string"))
        .alias("source"),
    )
    weights = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "*": 0.05}
    out = domain_mix(df, weights, key="doc_id")
    counts = {r["source"]: r["count"]
              for r in out.groupBy("source").count().collect()}
    assert counts["src0"] == 2000            # weight 1.0 keeps ALL rows
    assert 0.42 < counts["src1"] / 2000 < 0.58
    assert 0.19 < counts["src2"] / 2000 < 0.31
    assert 0.02 < counts.get("src3", 0) / 2000 < 0.09  # "*" default
    # determinism: same rows on re-evaluation
    a = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in
               domain_mix(df, weights, key="doc_id")
               .select("doc_id").collect())
    assert a == b
    # monotone in weight: raising a source's weight only ADDS rows (md5
    # bucket thresholds nest), so mixes are refinable without resampling
    lo = {r["doc_id"] for r in
          domain_mix(df, {"src1": 0.2, "*": 0.0}, key="doc_id")
          .select("doc_id").collect()}
    hi = {r["doc_id"] for r in
          domain_mix(df, {"src1": 0.6, "*": 0.0}, key="doc_id")
          .select("doc_id").collect()}
    assert lo < hi


def test_duplicated_ngram_coverage_interval_union(spark):
    from ollama_ocr_spark.operators.dedup import duplicated_ngram_coverage

    base = " ".join(f"w{i}" for i in range(10))  # 10 words, 3 shingles
    partial = "a b c " + " ".join(f"w{i}" for i in range(8)) + " d e f"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, partial), (4, "short doc only")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r for r in duplicated_ngram_coverage(df, k=8).collect()
    }
    # docs 1/2 are full copies: overlapping spans union to the whole doc,
    # never 3*8=24 (the double-count trap)
    assert (out[1]["covered"], out[1]["coverage"]) == (10, 1.0)
    assert out[2]["coverage"] == 1.0
    # doc 3 shares exactly one 8-gram (w0..w7) -> one span of 8 / 14 words
    assert (out[3]["n_dup_spans"], out[3]["covered"]) == (1, 8)
    assert out[3]["coverage"] == 0.5714
    # sub-k doc: zero coverage, present in output
    assert (out[4]["n_dup_spans"], out[4]["coverage"]) == (0, 0.0)


def test_semantic_dedup_clusters_and_flags(spark):
    """SemDeDup: handcrafted 2-D vectors with an obvious 2-cluster split —
    exact copies / near-copies flag as dups, the lowest-id member of each
    near-dup group survives, and the pair stage stays an equi-join."""
    from ollama_ocr_spark.operators.similarity import semantic_dedup

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.999, 0.01]),
         (4, [0.0, 1.0]), (5, [0.6, 0.8])],
        ["vec_id", "embedding"],
    )
    out = semantic_dedup(emb, n_centroids=2, threshold=0.999)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4, 5}
    # 3 is a near-copy of 1; 4 an exact copy of 2; 5 is close to neither
    assert [rows[i]["is_dup"] for i in (1, 2, 3, 4, 5)] == [0, 0, 1, 1, 0]
    # same cluster for each near-dup pair
    assert rows[1]["cluster"] == rows[3]["cluster"]
    assert rows[2]["cluster"] == rows[4]["cluster"]
    assert rows[1]["cluster"] != rows[2]["cluster"]
    # the lowest-keyed member of a cluster can never be flagged
    by_cluster = {}
    for r in rows.values():
        by_cluster.setdefault(r["cluster"], []).append(r)
    for members in by_cluster.values():
        keeper = min(members, key=lambda r: r["vec_id"])
        assert keeper["is_dup"] == 0
    # scale shape: pairs come from an equi-join on cluster id — the only
    # nested-loop allowed is the broadcast codebook assign, never a
    # CartesianProduct
    from ollama_ocr_spark.plans.audit import plan_report

    assert "CartesianProduct" not in plan_report(out).raw


def test_phrase_and_and_search(spark):
    """Positional phrase search finds only consecutive matches, counts
    overlapping occurrences, and stays equi-join-only; AND search needs
    every word but not adjacency."""
    from ollama_ocr_spark.operators.search import (and_search, phrase_search,
                                                   positional_postings)

    docs = spark.createDataFrame(
        [(1, "big table part one"),
         (2, "part table big"),
         (3, "table part table part"),
         (4, "Table PART"),
         (5, "table only here")],
        ["doc_id", "text"],
    )
    posts = positional_postings(docs)
    ph = {r["doc_id"]: r["n_matches"]
          for r in phrase_search(posts, ["table", "part"]).collect()}
    assert ph == {1: 1, 3: 2, 4: 1}     # 2 has the words, wrong order
    an = {r["doc_id"]: r["n_hits"]
          for r in and_search(posts, ["table", "part"]).collect()}
    assert an == {1: 2, 2: 2, 3: 4, 4: 2}
    # duplicate query words dedupe: ['table','table'] is the same query as
    # ['table'] — without the dedupe, count_distinct(term)=1 can never
    # reach len(words)=2 and the search silently returns zero rows
    dup = {r["doc_id"]: r["n_hits"]
           for r in and_search(posts, ["table", "Table"]).collect()}
    assert dup == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}
    # scale shape: joins on (doc, pos) are hash/sort-merge equi-joins
    from ollama_ocr_spark.plans.audit import audit_plan

    audit_plan(phrase_search(posts, ["table", "part"]),
               forbid_ops=["BroadcastNestedLoopJoin", "CartesianProduct"])


def test_bpe_pair_counts(spark):
    from ollama_ocr_spark.operators.textstats import bpe_pair_counts

    df = spark.createDataFrame(
        [(1, "abab abab cd"), (2, "abab x")],   # 'ab' dominates; 'x' no pair
        ["doc_id", "text"],
    )
    got = {r["pair"]: r["n"] for r in bpe_pair_counts(df).collect()}
    # "abab" x3 → per word: ab,ba,ab → ab twice; plus cd once
    assert got["ab"] == 6 and got["ba"] == 3 and got["cd"] == 1
    assert "x" not in got  # length-1 word contributes no pair


def test_dsir_importance_sign(spark):
    from ollama_ocr_spark.operators.textstats import dsir_importance_weights

    raw = spark.createDataFrame(
        [(1, "good clean prose flows here"),
         (2, "good clean prose flows here"),
         (3, "buy cheap pills now online"),
         (4, "buy cheap pills now online")],
        ["doc_id", "text"],
    )
    target = raw.filter("doc_id <= 2")   # target domain = the clean docs
    got = {r["doc_id"]: r for r in dsir_importance_weights(raw, target).collect()}
    # target-like docs score above the spam docs; keep == (log_weight > 0)
    assert got[1]["log_weight"] > got[3]["log_weight"]
    for r in got.values():
        assert r["keep"] == (r["log_weight"] > 0)
    assert got[1]["n_feats"] == 4


def test_group_holdout_split_coherent_and_on_target(spark):
    from ollama_ocr_spark.operators.maintenance import group_holdout_split

    # zipf-ish: one head group with half the rows + many tail groups
    rows = [(i, "g0") for i in range(50)] + [
        (50 + i, f"g{1 + i % 10}") for i in range(50)
    ]
    df = spark.createDataFrame(rows, ["row_id", "grp"])
    out = group_holdout_split(df, group_col="grp").collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], set()).add(r["split"])
    # leakage-safe: every group entirely inside ONE split
    assert all(len(s) == 1 for s in by_grp.values())
    # row fractions on target to one-group granularity (tail groups = 5 rows)
    n_train = sum(1 for r in out if r["split"] == "train")
    assert abs(n_train / len(out) - 0.9) <= 0.5  # head group is 50% of rows
    assert {r["split"] for r in out} <= {"train", "val", "test"}


def test_temperature_mix_flattens_sources(spark):
    from ollama_ocr_spark.operators.maintenance import temperature_mix

    rows = [(i, "head") for i in range(900)] + [
        (900 + i, "tail") for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["url", "source"])
    kept = temperature_mix(df, alpha=0.5, target_frac=0.5).collect()
    n = len(kept)
    assert 0.4 * 1000 <= n <= 0.6 * 1000          # total tracks target
    tail_share = sum(1 for r in kept if r["source"] == "tail") / n
    assert tail_share > 0.15                      # flatter than the 10% input
    # deterministic: second run keeps the identical set
    again = {r["url"] for r in temperature_mix(
        df, alpha=0.5, target_frac=0.5).collect()}
    assert again == {r["url"] for r in kept}


def test_zorder_key_and_layout(spark):
    from ollama_ocr_spark.operators.maintenance import (cluster_by_zorder,
                                                        zorder_key)

    # interleave check: x=0b101, y=0b011 → z = 1,1 0,0 1,1... bit i of x at
    # position 2i, bit i of y at 2i+1: x=5,y=3 → 0b011011 = 27
    df = spark.createDataFrame([(5, 3)], ["x", "y"])
    got = df.select(zorder_key(F.col("x"), F.col("y"), bits=3)
                    .alias("z")).collect()[0]["z"]
    assert got == 27
    # out-of-domain coordinates saturate to the edge cell (bits=3 → max 7)
    # instead of dropping high bits (x=9 would otherwise alias to x=1,
    # landing far from the domain edge and destroying locality)
    sat = spark.createDataFrame([(9, 3), (7, 3)], ["x", "y"])
    zs = [r["z"] for r in sat.select(
        zorder_key(F.col("x"), F.col("y"), bits=3).alias("z")).collect()]
    assert zs[0] == zs[1]   # 9 clamps to 7

    grid = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("bigint").alias("y"),
    )
    def extents(frame):
        per = (
            frame.groupBy(F.spark_partition_id().alias("p"))
            .agg((F.max("x") - F.min("x")).alias("ex"),
                 (F.max("y") - F.min("y")).alias("ey"))
            .collect()
        )
        return (sum(r["ex"] for r in per) / len(per),
                sum(r["ey"] for r in per) / len(per))

    zx, zy = extents(
        cluster_by_zorder(grid, "x", "y", num_partitions=16, bits=6))
    # x-sorted layout: each partition is a stripe covering the FULL y range
    sx, sy = extents(grid.repartitionByRange(16, "x")
                     .sortWithinPartitions("x"))
    assert zy < sy * 0.5      # z-order bounds y too, stripes don't
    assert zx <= 64 and zy <= 64


def test_shingle_novelty_rounds(spark):
    from ollama_ocr_spark.operators.dedup import shingle_novelty

    t1 = "alpha beta gamma delta epsilon zeta eta"
    df = spark.createDataFrame(
        [(0, t1),                                  # round 0: all new
         (1, t1),                                  # round 1: pure re-crawl
         (2, t1 + " fresh words appended here now")],  # round 2: partly new
        ["crawl_round", "text"],
    )
    got = {r["crawl_round"]: r for r in shingle_novelty(df).collect()}
    assert got[0]["new_frac"] == 1.0
    assert got[1]["n_new"] == 0 and got[1]["new_frac"] == 0.0
    assert 0.0 < got[2]["new_frac"] < 1.0
    assert got[0]["n_shingles"] == 3               # 7 words → 3 5-gram shingles


def test_chunk_documents_windows(spark):
    from ollama_ocr_spark.operators.textstats import chunk_documents

    words = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame(
        [(1, " ".join(words)), (2, "short text")], ["doc_id", "text"]
    )
    got = chunk_documents(df, size=4, stride=3).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 10 words, size=4, stride=3 → ceil((10-4)/3)+1 = 3 chunks
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert [r["chunk"] for r in c1] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9"]
    assert [r["n_words"] for r in c1] == [4, 4, 4]
    # last chunk starts at stride*2=6 and covers through word 9 — full cover
    # short doc (< size words) → exactly one chunk, the whole text
    assert len(by_doc[2]) == 1
    assert by_doc[2][0]["chunk"] == "short text"
    assert by_doc[2][0]["n_words"] == 2


def test_cdc_chunk_documents_properties(spark):
    """Content-defined chunking invariants: (a) chunks partition the
    exact word sequence (reassembly is byte-identical), (b) boundaries
    match a pure-Python reimplementation of the gear rule (the
    acc*2+u fold over a window-8 md5-u32 slice), (c) a 3-word prepend
    shifts positions but re-synchronizes — all chunk digests except the
    edited head region survive, where fixed-stride chunking shares
    none."""
    import hashlib
    import random

    from pyspark.sql import functions as F

    from ollama_ocr_spark.operators.textstats import (cdc_chunk_documents,
                                                      chunk_documents)

    rng = random.Random(11)
    vocab = [f"tok{i}" for i in range(40)]
    rows = [(d, " ".join(rng.choice(vocab) for _ in range(90 + 17 * d)))
            for d in range(4)]
    rows.append((4, "single"))
    # window-boundary lengths (7/8/9 words vs window=8) and a repeated
    # single token (every gear window identical — either every position
    # bounds or only the last does).
    rows += [(5 + k, " ".join(rng.choice(vocab) for _ in range(7 + k)))
             for k in range(3)]
    rows.append((8, " ".join(["same"] * 30)))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = cdc_chunk_documents(df).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)

    def py_u32(word):
        return int(hashlib.md5(word.encode()).hexdigest()[:8], 16)

    def py_chunks(text, window=8, mask=16):
        ws = text.split(" ")
        us = [py_u32(w) for w in ws]
        bounds = []
        for i in range(1, len(ws) + 1):
            acc = 0
            for u in us[max(0, i - window):i]:
                acc = acc * 2 + u
            if acc % mask == 0 or i == len(ws):
                bounds.append(i)
        out, prev = [], 0
        for b in bounds:
            out.append(" ".join(ws[prev:b]))
            prev = b
        return out

    for doc_id, text in rows:
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_id"])
        assert [r["chunk"] for r in chunks] == py_chunks(text)
        assert " ".join(r["chunk"] for r in chunks) == text
        assert all(r["n_words"] == len(r["chunk"].split(" "))
                   for r in chunks)

    # resync under a prepend edit: CDC shares every digest after the
    # first boundary; the fixed 32/24 grid of doc 0 (90 words, 4 chunks)
    # shares none.
    base = df.filter("doc_id = 0")
    edited = base.select(
        (F.col("doc_id") + 100).alias("doc_id"),
        F.concat(F.lit("aa bb cc "), "text").alias("text"),
    )
    both = base.unionByName(edited)

    def digest_sets(chunks_df):
        out = {}
        for r in chunks_df.select("doc_id", "chunk").collect():
            out.setdefault(r["doc_id"], set()).add(r["chunk"])
        return out

    cdc = digest_sets(cdc_chunk_documents(both))
    assert len(cdc[0] & cdc[100]) >= len(cdc[0]) - 2
    fixed = digest_sets(chunk_documents(both, size=32, stride=24))
    assert not (fixed[0] & fixed[100])

    import pytest

    with pytest.raises(ValueError):
        cdc_chunk_documents(df, window=0)
    with pytest.raises(ValueError):
        cdc_chunk_documents(df, mask_bits=0)


def test_token_mass_gini_hand_values(spark):
    """Masses [1,3,6]: G = 2*25/(3*10) - 4/3 = 1/3; top decile (k=1) is
    the 6-token host. Equal masses → G = 0."""
    from ollama_ocr_spark.operators.textstats import token_mass_gini

    df = spark.createDataFrame(
        [("hx", "a"), ("hy", "a a a"), ("hz", "a a a a a a")],
        ["host", "text"],
    )
    r = token_mass_gini(df).collect()[0]
    assert (r["n_hosts"], r["total_tokens"]) == (3, 10)
    assert r["gini"] == round(2 * 25 / 30 - 4 / 3, 6)
    assert r["top_decile_share"] == 0.6

    eq = spark.createDataFrame(
        [("hx", "a a"), ("hy", "b b")], ["host", "text"]
    )
    r2 = token_mass_gini(eq).collect()[0]
    assert r2["gini"] == 0.0
    assert r2["top_decile_share"] == 0.5


def test_cross_corpus_near_dupes(spark):
    from ollama_ocr_spark.operators.dedup import cross_corpus_near_dupes

    base = "the quick brown fox jumps over the lazy dog again and again"
    new = spark.createDataFrame(
        [(100, base),                        # exact dup of ref 1 → collides
         (101, "completely unrelated words nothing shared with reference")],
        ["doc_id", "text"],
    )
    ref = spark.createDataFrame(
        [(1, base), (2, base), (3, "other distinct reference text here ok")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in cross_corpus_near_dupes(new, ref).collect()}
    assert 101 not in got                    # novel doc absent
    assert got[100]["n_ref_hits"] == 2       # collides with ref 1 AND 2
    assert got[100]["first_ref"] == 1        # smallest colliding ref key


def test_url_filter_rules_and_precedence(spark):
    from ollama_ocr_spark.operators.maintenance import url_filter

    rows = [
        ("https://a.com/x/page.html",),                      # ok
        ("https://a.com/x/pic.JPG",),                        # binary_ext (ci)
        ("https://a.com/x/pic.jpg?a=1&b=2&c=3",),            # ext beats params
        ("https://a.com/x/p.html?a=1&b=2&c=3",),             # too_many_params
        ("https://a.com/x/p.html?q=" + "z" * 100,),          # too_long
        ("https://a.com/spam/casino.html",),                 # blocked_pattern
        ("https://a.com/x/p.html?a=1&&b=2&",),               # empty segs: 2 params
    ]
    df = spark.createDataFrame(rows, ["url"])
    got = {r["url"]: r["reason"]
           for r in url_filter(df, blocked_pattern="casino").collect()}
    assert got["https://a.com/x/page.html"] == "ok"
    assert got["https://a.com/x/pic.JPG"] == "binary_ext"
    assert got["https://a.com/x/pic.jpg?a=1&b=2&c=3"] == "binary_ext"
    assert got["https://a.com/x/p.html?a=1&b=2&c=3"] == "too_many_params"
    assert got["https://a.com/x/p.html?q=" + "z" * 100] == "too_long"
    assert got["https://a.com/spam/casino.html"] == "blocked_pattern"
    # 'a=1&&b=2&' is TWO real params — separators don't count
    assert got["https://a.com/x/p.html?a=1&&b=2&"] == "ok"


def test_new_round3_ops_plan_shapes(spark):
    """Scale-shape audits: chunking and URL filtering stay shuffle-free
    map-side codegen; cross-corpus dedup never degrades to a nested-loop
    or cartesian plan (its only join must be the (band,bucket) equi-join).
    """
    from pyspark.sql import functions as F

    from ollama_ocr_spark.operators.dedup import cross_corpus_near_dupes
    from ollama_ocr_spark.operators.maintenance import url_filter
    from ollama_ocr_spark.operators.textstats import chunk_documents
    from ollama_ocr_spark.plans.audit import audit_plan

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 10) for i in range(20)],
        ["doc_id", "text"],
    )
    audit_plan(chunk_documents(docs), max_exchanges=0)
    urls = docs.select(
        F.concat(F.lit("https://a.com/p-"), "doc_id", F.lit(".html"))
        .alias("url")
    )
    audit_plan(url_filter(urls, blocked_pattern="spam"), max_exchanges=0)
    audit_plan(
        cross_corpus_near_dupes(
            docs.filter("doc_id % 2 = 0"), docs.filter("doc_id % 2 = 1")
        ),
        forbid_ops=["BroadcastNestedLoopJoin", "CartesianProduct"],
    )


def test_domain_quality_blocklist_mining(spark):
    from ollama_ocr_spark.operators.textstats import domain_quality

    good = ("the quick brown fox jumps over the lazy dog and runs on "
            "in the morning light across a field of tall green grass")
    bad = "zz zz"                                # fails n_words >= 10
    rows = [("good.com", good)] * 5 + [("bad.com", bad)] * 5 + \
           [("tiny.com", bad)]                   # low rate but < min_docs
    df = spark.createDataFrame(rows, ["host", "text"])
    got = {r["host"]: r for r in
           domain_quality(df, min_docs=5, min_ok_rate=0.5).collect()}
    assert got["good.com"]["ok_rate"] == 1.0
    assert not got["good.com"]["blocklist_candidate"]
    assert got["bad.com"]["ok_rate"] == 0.0
    assert got["bad.com"]["blocklist_candidate"]
    assert not got["tiny.com"]["blocklist_candidate"]   # evidence floor


def test_boilerplate_paragraphs_topk(spark):
    from ollama_ocr_spark.operators.dedup import boilerplate_paragraphs

    header = "subscribe now"
    rows = [(i, f"{header}\n\nbody {i}\n\ncommon footer" if i % 2 == 0
             else f"{header}\n\nbody {i}\n\ncommon footer\n\ncommon footer")
            for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = boilerplate_paragraphs(df, min_docs=2, k=2).collect()
    assert len(got) == 2
    by_para = {r["paragraph"]: r for r in got}
    assert by_para[header]["n_docs"] == 6
    assert by_para[header]["n_total"] == 6
    # footer appears in all 6 docs but 9 times total (twice in odd docs)
    assert by_para["common footer"]["n_docs"] == 6
    assert by_para["common footer"]["n_total"] == 9


def test_oov_rate_against_vocab(spark):
    from ollama_ocr_spark.operators.textstats import oov_rate

    docs = spark.createDataFrame(
        [(1, "aa bb aa cc"), (2, "aa aa aa aa"), (3, "zz yy xx ww")],
        ["doc_id", "text"],
    )
    vocab = spark.createDataFrame([("aa",), ("bb",)], ["token"])
    got = {r["doc_id"]: r for r in oov_rate(docs, vocab).collect()}
    assert got[1]["n_tokens"] == 4 and got[1]["n_oov"] == 1   # cc
    assert got[1]["oov_rate"] == 0.25
    assert got[2]["n_oov"] == 0 and got[2]["oov_rate"] == 0.0
    assert got[3]["n_oov"] == 4 and got[3]["oov_rate"] == 1.0


def test_chunk_documents_coverage_invariants(spark):
    """Grid invariants across every word count 1..129 (spanning the
    size/stride boundaries): chunk count matches ceil((n-size)/stride)+1,
    the last source word is always covered, and every chunk is exactly
    the stride-aligned slice of the source."""
    import math

    from ollama_ocr_spark.operators.textstats import chunk_documents

    size, stride = 32, 24
    rows = [(n, " ".join(f"w{i}" for i in range(n))) for n in range(1, 130)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    by_doc = {}
    for r in chunk_documents(df, size=size, stride=stride).collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for n, text in rows:
        words = text.split(" ")
        cs = sorted(by_doc[n], key=lambda r: r["chunk_id"])
        expected = 1 if n <= size else math.ceil((n - size) / stride) + 1
        assert len(cs) == expected, (n, len(cs), expected)
        assert cs[-1]["chunk"].split(" ")[-1] == f"w{n - 1}"   # coverage
        for c in cs:
            lo = c["chunk_id"] * stride
            assert c["chunk"] == " ".join(words[lo:lo + size])
            assert c["n_words"] == len(words[lo:lo + size])


def test_latest_ops_plan_shapes(spark):
    """Scale-shape audits for the late-round operators: OOV joins must
    BROADCAST the vocab (never shuffle the token table against it);
    boilerplate mining and domain quality must stay equi-join/agg only."""
    from pyspark.sql import functions as F

    from ollama_ocr_spark.operators.dedup import boilerplate_paragraphs
    from ollama_ocr_spark.operators.textstats import domain_quality, oov_rate
    from ollama_ocr_spark.plans.audit import audit_plan

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog %d" % i,
          f"h{i % 3}.com")
         for i in range(30)],
        ["doc_id", "text", "host"],
    )
    vocab = spark.createDataFrame([("the",), ("fox",)], ["token"])
    audit_plan(oov_rate(docs, vocab), require_broadcast=True,
               forbid_ops=["BroadcastNestedLoopJoin", "CartesianProduct"])
    audit_plan(boilerplate_paragraphs(docs),
               forbid_ops=["BroadcastNestedLoopJoin", "CartesianProduct"])
    audit_plan(domain_quality(docs),
               forbid_ops=["BroadcastNestedLoopJoin", "CartesianProduct",
                           "SortMergeJoin"])


def test_zorder_bucket_partition_pruning(spark, tmp_path):
    """The point of z-ordering on disk: a 2-D box predicate maps to a
    SMALL set of z-bucket partitions (derivable driver-side from the same
    bit-interleave), so the scan prunes whole directories — the manual
    analog of Delta/Hudi min-max file skipping."""
    from pyspark.sql import functions as F

    from ollama_ocr_spark.operators.maintenance import zorder_key
    from ollama_ocr_spark.plans.audit import plan_report

    path = str(tmp_path / "ztab")
    grid = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("bigint").alias("y"),
    )
    grid.withColumn(
        "zb", F.shiftright(zorder_key(F.col("x"), F.col("y"), bits=6), 8)
    ).write.partitionBy("zb").mode("overwrite").parquet(path)

    def zbucket(x, y, bits=6, shift=8):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z >> shift

    # query box x<8, y<8 → exactly one z bucket out of 16
    buckets = sorted({zbucket(x, y) for x in range(8) for y in range(8)})
    assert buckets == [0]
    rd = spark.read.parquet(path)
    pruned = rd.filter(
        F.col("zb").isin(buckets) & (F.col("x") < 8) & (F.col("y") < 8)
    )
    rep = plan_report(pruned)
    assert any("zb" in p for p in rep.partition_filters), rep.partition_filters
    # pruning must not change the answer
    full = rd.filter((F.col("x") < 8) & (F.col("y") < 8))
    assert pruned.count() == full.count() == 64


def test_fix_encoding_repairs_bytes(spark):
    from ollama_ocr_spark.operators.textstats import fix_encoding

    garbled_rdq = "â€"  # cp1252-garbled right double quote
    rows = [
        (1, "cafÃ© itâ€™s fine"),
        (2, "â€œquoted" + garbled_rdq + " end"),
        (3, "lost � char"),
        (4, "ctl \x01 byte"),
        (5, "already clean"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in fix_encoding(df).collect()}
    assert out[1]["text"] == "café it’s fine"
    assert out[2]["text"] == "“quoted” end"
    assert out[3]["text"] == "lost  char"
    assert out[4]["text"] == "ctl  byte"
    assert out[5]["text"] == "already clean"
    assert [out[i]["was_damaged"] for i in (1, 2, 3, 4, 5)] == [
        True, True, True, True, False]
    # char accounting: out lengths match the repaired strings
    for i in (1, 2, 3, 4, 5):
        assert out[i]["n_chars_out"] == len(out[i]["text"])
        assert out[i]["n_chars_in"] == len(rows[i - 1][1])


def test_hapax_rate_counts(spark):
    from ollama_ocr_spark.operators.textstats import hapax_rate

    rows = [
        (1, "s1", "the cat sat"),       # s1 tokens: the cat sat the dog
        (2, "s1", "the dog"),
        (3, "s2", "aa aa aa"),          # s2: one type, 3 occurrences
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {r["source"]: r for r in hapax_rate(df).collect()}
    # s1: types {the:2, cat:1, sat:1, dog:1} -> 4 types, 5 tokens, 3 hapax
    assert out["s1"]["n_types"] == 4 and out["s1"]["n_tokens"] == 5
    assert out["s1"]["n_hapax"] == 3
    assert out["s1"]["hapax_frac"] == 0.75
    assert out["s1"]["ttr"] == 0.8
    assert out["s2"]["n_types"] == 1 and out["s2"]["n_hapax"] == 0


def test_packing_efficiency_invariants(spark):
    from ollama_ocr_spark.operators.textstats import (
        packing_efficiency, with_token_counts)

    rows = [(i, "w " * (i % 37 + 1) + "end") for i in range(200)]
    df = with_token_counts(
        spark.createDataFrame(rows, ["doc_id", "text"]))
    out = packing_efficiency(df, budgets=(64, 256), buckets=4).collect()
    by_budget = {r["budget"]: r for r in out}
    assert set(by_budget) == {64, 256}
    for b, r in by_budget.items():
        # every doc lands in exactly one bin; token mass is conserved
        assert r["n_docs"] == 200
        # capacity identity: bins*budget = tokens + padding - overflow
        assert r["n_bins"] * b == (
            r["total_tokens"] + r["padding_tokens"] - r["overflow_tokens"])
    # a bigger budget never needs more bins
    assert by_budget[256]["n_bins"] <= by_budget[64]["n_bins"]
    # both budgets pack the same token mass
    assert (by_budget[64]["total_tokens"]
            == by_budget[256]["total_tokens"])


def test_quality_sample_soft_gate(spark):
    from ollama_ocr_spark.operators.textstats import quality_sample

    rows = [
        (1, "the cat of the house and the dog in a yard is here"),
        (2, "zzz qqq xxx www vvv"),  # zero stopwords -> floor prob 0.1
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in quality_sample(df).collect()}
    assert out[1]["keep_prob"] == 1.0 and out[1]["kept"]
    assert out[2]["keep_prob"] == 0.1
    # deterministic: identical verdicts on a re-run
    again = {r["doc_id"]: r["kept"] for r in quality_sample(df).collect()}
    assert again == {k: v["kept"] for k, v in out.items()}


def test_mix_manifest_repeats_match_plan(spark):
    from ollama_ocr_spark.operators.textstats import mix_manifest

    rows = [(i, "s1", "a b c d") for i in range(4)] + [
        (10, "s2", "a b c d")]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = mix_manifest(df, target_tokens=60, max_epochs=4).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    # s1: epochs 2.5 -> every doc repeats 2 or 3 times
    assert all(r["n_repeats"] in (2, 3) for r in by_src["s1"])
    assert all(r["epochs"] == 2.5 for r in by_src["s1"])
    # s2: epochs exactly 4.0 -> frac 0, no acceptance repeat
    assert [r["n_repeats"] for r in by_src["s2"]] == [4]


def test_data_budget_plan_allocation(spark):
    from ollama_ocr_spark.operators.textstats import data_budget_plan

    # s1: 4 tokens/doc x 4 docs = 16 tokens; s2: 4 tokens (1 doc).
    # sqrt weights: 4 and 2 -> 2/3 and 1/3 of the target.
    rows = [(i, "s1", "a b c d") for i in range(4)] + [
        (10, "s2", "a b c d")]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    df = df.withColumnRenamed("lang", "source")
    out = {r["source"]: r for r in
           data_budget_plan(df, target_tokens=60, max_epochs=4).collect()}
    s1, s2 = out["s1"], out["s2"]
    assert s1["n_tokens"] == 16 and s2["n_tokens"] == 4
    assert s1["target_alloc"] == 40 and s2["target_alloc"] == 20
    # s1 serves its full 40 (2.5 epochs); s2 caps at 4 epochs = 16 tokens
    assert s1["served_tokens"] == 40 and s1["epochs"] == 2.5
    assert not s1["capped"]
    assert s2["served_tokens"] == 16 and s2["epochs"] == 4.0
    assert s2["capped"]


def test_tokenizer_fertility_per_lang(spark):
    from ollama_ocr_spark.operators.textstats import tokenizer_fertility

    rows = [
        (1, "en", "ab cd"),          # 2 ws words, 2 re tokens, 5 chars
        (2, "en", "e-f"),            # 1 ws word, 2 re tokens ('e','f')
        (3, "xx", "one two three"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = {r["lang"]: r for r in tokenizer_fertility(df).collect()}
    en = out["en"]
    assert en["n_docs"] == 2 and en["n_chars"] == 8
    assert en["n_ws_tokens"] == 3 and en["n_re_tokens"] == 4
    assert en["fertility"] == round(4 / 3, 4)
    assert en["chars_per_token"] == 2.0
    assert out["xx"]["fertility"] == 1.0


def test_dedup_cluster_sizes_histogram(spark):
    from ollama_ocr_spark.operators.dedup import dedup_cluster_sizes

    tri = "alpha beta gamma delta epsilon zeta eta theta"
    duo = "one two three four five six seven eight nine"
    uniq = [
        "red orange yellow green blue indigo violet colors here",
        "north south east west compass points navigation chart maps",
        "apple banana cherry date elderberry fig grape kiwi lemon",
    ]
    rows = (
        [(i, tri) for i in range(3)]
        + [(10 + i, duo) for i in range(2)]
        + [(20 + i, t) for i, t in enumerate(uniq)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["cluster_size"]: r for r in dedup_cluster_sizes(df).collect()}
    assert out[3]["n_clusters"] == 1 and out[3]["n_docs"] == 3
    assert out[2]["n_clusters"] == 1 and out[2]["n_docs"] == 2
    assert out[1]["n_clusters"] == 3 and out[1]["n_docs"] == 3
    # n_docs column must sum to the corpus size
    assert sum(r["n_docs"] for r in out.values()) == len(rows)


def test_url_aliases_mirror_clusters(spark):
    from datetime import datetime

    from ollama_ocr_spark.operators.maintenance import url_aliases

    t1, t2 = datetime(2024, 1, 1), datetime(2024, 1, 2)
    rows = [
        # a.com and b.com serve identical latest content -> one cluster
        ("https://a.com/x", t1, b"same"),
        ("https://b.com/x", t1, b"same"),
        # c.com's OLD capture matched, but its LATEST differs -> no alias
        ("https://c.com/x", t1, b"same"),
        ("https://c.com/x", t2, b"changed"),
        # NULL payloads never cluster, even together
        ("https://d.com/x", t1, None),
        ("https://e.com/x", t1, None),
        # singleton content -> dropped
        ("https://f.com/x", t1, b"unique"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary")
    out = url_aliases(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["canonical_url"] == "https://a.com/x"
    assert r["n_urls"] == 2 and r["n_hosts"] == 2


def test_round4_report_plan_shapes(spark):
    """Scale-shape audits for the newest operators: fix_encoding must stay
    a pure codegen map stage (no Python eval, no exchange); hapax_rate is
    two partial-agg shuffles; packing_efficiency's budget sweep must reuse
    ONE window (one cumsum shuffle), never one per budget."""
    from ollama_ocr_spark.operators.textstats import (
        fix_encoding, hapax_rate, packing_efficiency, with_token_counts)
    from ollama_ocr_spark.plans.audit import audit_plan, plan_report

    docs = spark.createDataFrame(
        [(i, "some text %d" % i, f"s{i % 3}") for i in range(40)],
        ["doc_id", "text", "source"],
    )
    rep = audit_plan(fix_encoding(docs), max_exchanges=0,
                     forbid_ops=["BatchEvalPython", "ArrowEvalPython"])
    assert rep.has_wholestage_codegen
    audit_plan(hapax_rate(docs),
               forbid_ops=["BatchEvalPython", "ArrowEvalPython",
                           "BroadcastNestedLoopJoin", "CartesianProduct"])
    sweep = packing_efficiency(
        with_token_counts(docs), budgets=(64, 128, 256, 512), buckets=4)
    rep = plan_report(sweep)
    assert rep.raw.count("Window") == 1, rep.raw
    # one exchange for the bucket window + the two agg exchanges at most
    assert rep.n_exchanges <= 3, rep.raw


def test_jaccard_histogram_exact_buckets(spark):
    """Integer band edges: identical docs clamp into the top band
    (j=1.0 -> bucket 19); a 1-of-3-shingle overlap lands in band 6
    ((1*20) div 3); counts sum to the pair count."""
    from ollama_ocr_spark.operators.dedup import jaccard_histogram

    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f"), (3, "a b c d e x")],
        ["doc_id", "text"],
    )
    rows = {r["bucket"]: r for r in
            jaccard_histogram(docs, max_posting=None).collect()}
    # pairs: (1,2) j=2/2=1.0 -> 19; (1,3),(2,3) j=1/3 -> (20 div 3)=6
    assert rows[19]["n_pairs"] == 1 and rows[19]["lo"] == 0.95
    assert rows[6]["n_pairs"] == 2 and rows[6]["lo"] == 0.3
    assert sum(r["n_pairs"] for r in rows.values()) == 3


def test_group_entropy_mix_shapes(spark):
    """Uniform 2-cat mix gives the quantized ln(2); single-cat groups give
    exactly 0.0; n_rows/n_cats count rows and distinct categories."""
    from ollama_ocr_spark.operators.textstats import group_entropy

    df = spark.createDataFrame(
        [("h1", "article"), ("h1", "memo"), ("h1", "article"), ("h1", "memo"),
         ("h2", "article"), ("h2", "article")],
        ["host", "template"],
    )
    rows = {r["host"]: r for r in group_entropy(df, "host", "template").collect()}
    # 2 x round(-0.5 * round(ln(0.5), 8), 6) = 0.693148 -> 0.6931
    assert rows["h1"]["entropy"] == 0.6931
    assert (rows["h1"]["n_rows"], rows["h1"]["n_cats"]) == (4, 2)
    assert rows["h2"]["entropy"] == 0.0
    assert (rows["h2"]["n_rows"], rows["h2"]["n_cats"]) == (2, 1)


def test_simhash_near_pairs_matches_bruteforce(spark):
    """Banded retrieval is exactly the Hamming-<=3 pair set (pigeonhole:
    4 disjoint 16-bit bands): compare against a Python popcount over all
    signature pairs, including planted exact dups (hamming 0)."""
    from ollama_ocr_spark.operators.dedup import simhash64, simhash_near_pairs

    base = [(i, f"w{i} w{(i*3) % 11} common tokens shared by every doc "
                f"x{i % 4} y{i % 5}") for i in range(20)]
    docs = spark.createDataFrame(
        base + [(100, base[0][1]), (101, base[1][1])], ["doc_id", "text"]
    )
    sigs = {r["doc_id"]: r["simhash"]
            for r in simhash64(docs, hash_fn="md5").collect()}
    ids = sorted(sigs)
    want = {(a, b, bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1"))
            for ai, a in enumerate(ids) for b in ids[ai + 1:]
            if bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= 3}
    got = {(r["a"], r["b"], r["hamming"])
           for r in simhash_near_pairs(docs, hash_fn="md5",
                                       max_bucket=None).collect()}
    assert got == want
    assert (0, 100, 0) in got and (1, 101, 0) in got  # planted exact dups


def test_new_report_plan_shapes(spark):
    """Scale-shape audits for the corpus-shape reports: no Python eval,
    no nested-loop/cartesian joins anywhere; simhash_near_pairs generates
    pairs IN the posting array (single SortAggregate/HashAggregate
    collect, no signature-scan self-join re-derivation — the plan has
    exactly one Generate for the band explode and one for the pair
    explode); jaccard_histogram adds no exchange beyond jaccard_pairs'
    two long-key shuffles + the 20-row aggregate."""
    from ollama_ocr_spark.operators.dedup import (jaccard_histogram,
                                                  simhash_near_pairs)
    from ollama_ocr_spark.operators.textstats import group_entropy
    from ollama_ocr_spark.plans.audit import audit_plan, plan_report

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon w{i} w{i % 7}") for i in range(30)],
        ["doc_id", "text"],
    )
    forbid = ["BatchEvalPython", "ArrowEvalPython",
              "BroadcastNestedLoopJoin", "CartesianProduct"]
    rep = plan_report(simhash_near_pairs(docs))
    assert not any(op in rep.raw for op in forbid), rep.raw
    assert rep.raw.count("Generate") == 2, rep.raw  # band + pair explodes
    audit_plan(jaccard_histogram(docs), forbid_ops=forbid)
    audit_plan(group_entropy(docs.selectExpr("doc_id % 3 AS g", "text"),
                             "g", "text"), forbid_ops=forbid)


def test_minhash_accuracy_eval_matches_python_model(spark):
    """Independent Python replication (hashlib md5, set algebra) of the
    whole estimator report: same candidates (band buckets), same
    agree/8 estimate, same exact-Jaccard bands, same banded mean error."""
    import hashlib
    from collections import defaultdict

    from ollama_ocr_spark.operators.dedup import minhash_accuracy_eval

    base = "the quick brown fox jumps over the lazy dog near the old river"
    texts = {i: base + f" tail{i % 3} extra{i % 2}" for i in range(12)}
    texts[20] = texts[0]                       # exact dup
    texts[21] = texts[1] + " one more tail"    # near dup
    docs = spark.createDataFrame(
        [(i, t) for i, t in sorted(texts.items())], ["doc_id", "text"])

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()
    def shingle_set(t):
        ws = t.split(" ")
        return {" ".join(ws[i:i + 5]) for i in range(len(ws) - 4)} \
            if len(ws) >= 5 else set()
    shs = {i: shingle_set(t) for i, t in texts.items()}
    sigs = {i: [min(md5(f"{j}|{s}") for s in sh) for j in range(8)]
            for i, sh in shs.items() if sh}
    buckets = defaultdict(set)
    for i, m in sigs.items():
        for b in range(4):
            buckets[(b, md5(m[2 * b] + m[2 * b + 1]))].add(i)
    cands = {tuple(sorted(p)) for mem in buckets.values() if len(mem) >= 2
             for p in __import__("itertools").combinations(mem, 2)}
    bands = defaultdict(list)
    for a, b in cands:
        inter = len(shs[a] & shs[b]); union = len(shs[a] | shs[b])
        agree = sum(x == y for x, y in zip(sigs[a], sigs[b]))
        err = abs(agree / 8 - inter / union)
        bands[min(inter * 20 // union, 19)].append(err)
    rows = {r["bucket"]: r for r in
            minhash_accuracy_eval(docs, max_posting=None).collect()}
    assert set(rows) == set(bands)
    for bk, errs in bands.items():
        assert rows[bk]["n_pairs"] == len(errs)
        # engine quantizes per-pair to 6dp then 4dp on the mean
        assert abs(rows[bk]["mean_abs_err"] - sum(errs) / len(errs)) < 1e-4
    assert rows[19]["n_pairs"] >= 1  # the planted exact dup reaches band 19


def test_fetch_frontier_precedence_and_waves(spark):
    """First-failing verdict order (hygiene > robots > blocklist > fetch)
    and the per-host wave cap: a url that is both robots-disallowed AND
    on a blocked host reports robots; hygiene beats robots; fetchable
    urls of one host fill waves of 2 in url order."""
    from ollama_ocr_spark.operators.maintenance import fetch_frontier

    urls = spark.createDataFrame(
        [("https://a.com/x/p1.html",),      # fetch, wave 0
         ("https://a.com/x/p2.html",),      # fetch, wave 0
         ("https://a.com/x/p3.html",),      # fetch, wave 1
         ("https://a.com/priv/p.html",),    # robots
         ("https://b.com/priv/p.jpg",),     # hygiene wins over robots+block
         ("https://b.com/x/p.html",),       # blocked_host (not robots path)
         ],
        ["url"],
    )
    rules = spark.createDataFrame(
        [("a.com", "/priv/"), ("b.com", "/priv/")],
        "host string, disallow string",
    )
    blocked = spark.createDataFrame([("b.com",)], ["host"])
    rows = {r["url"]: r for r in
            fetch_frontier(urls, rules, blocked, per_host_burst=2).collect()}
    v = {u.rsplit("/", 2)[-2] + "/" + u.rsplit("/", 1)[-1]:
         (r["verdict"], r["wave"]) for u, r in rows.items()}
    assert v["x/p1.html"] == ("fetch", 0)
    assert v["x/p2.html"] == ("fetch", 0)
    assert v["x/p3.html"] == ("fetch", 1)
    assert v["priv/p.html"] == ("robots", -1)
    assert v["priv/p.jpg"] == ("filtered:binary_ext", -1)
    assert v["x/p.html"] == ("blocked_host", -1)


def test_agreement_matrix_cells_and_shares(spark):
    """Cell counts and shares over a hand frame: 4 rows across 3 cells;
    share is the exact (n * 1.0) / total division."""
    from ollama_ocr_spark.operators.reports import agreement_matrix

    df = spark.createDataFrame(
        [(True, "ok"), (True, "ok"), (True, "quality"), (False, "ok")],
        ["pred", "rule"],
    )
    rows = {(r["pred"], r["rule"]): r
            for r in agreement_matrix(df, "pred", "rule").collect()}
    assert rows[(True, "ok")]["n_docs"] == 2
    assert rows[(True, "ok")]["share"] == 0.5
    assert rows[(True, "quality")]["share"] == 0.25
    assert rows[(False, "ok")]["share"] == 0.25
    assert sum(r["n_docs"] for r in rows.values()) == 4


def test_dedup_methods_overlap_consistency(spark):
    """The Venn table must equal the presence-vector histogram derived
    from the three detectors run individually; a planted identical pair
    lands in the all-three cell."""
    from collections import Counter

    from ollama_ocr_spark.operators.dedup import (dedup_methods_overlap,
                                                  jaccard_pairs,
                                                  minhash_lsh_candidates,
                                                  simhash_near_pairs,
                                                  winnow_near_pairs)

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(i, base + f" suffix{i % 4} tail{i % 3}") for i in range(10)]
        + [(50, base + " suffix0 tail0")],     # identical to doc 0
        ["doc_id", "text"],
    )
    jp = {(r["a"], r["b"]) for r in
          jaccard_pairs(docs, threshold=0.5).collect()}
    lp = {(r["a"], r["b"]) for r in minhash_lsh_candidates(docs).collect()}
    sp = {(r["a"], r["b"]) for r in
          simhash_near_pairs(docs, hash_fn="md5").collect()}
    wp = {(r["a"], r["b"]) for r in winnow_near_pairs(docs).collect()}
    want = Counter((p in jp, p in lp, p in sp, p in wp)
                   for p in jp | lp | sp | wp)
    got = {(r["in_jaccard"], r["in_lsh"], r["in_simhash"], r["in_winnow"]):
           r["n_pairs"]
           for r in dedup_methods_overlap(docs, hash_fn="md5").collect()}
    assert got == dict(want)
    assert (0, 50) in jp & lp & sp & wp
    assert got[(True, True, True, True)] >= 1


def test_winnow_near_pairs_local_overlap(spark):
    """A long quoted passage shared between two otherwise-different docs
    produces a pair with n_shared >= 2; an unrelated doc pairs with
    nobody; counts match a Python replication over the operator's own
    fingerprints."""
    from ollama_ocr_spark.operators.dedup import (winnow_fingerprints,
                                                  winnow_near_pairs)

    quote = " ".join(f"q{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, "intro words here " + quote + " closing remarks alpha"),
         (2, "different opening " + quote + " other ending beta"),
         (3, " ".join(f"z{i}" for i in range(30)))],
        ["doc_id", "text"],
    )
    pairs = {(r["a"], r["b"]): r["n_shared"]
             for r in winnow_near_pairs(docs).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert not any(3 in p for p in pairs)
    by_doc = {}
    for r in winnow_fingerprints(docs).collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert pairs[(1, 2)] == len(by_doc[1] & by_doc[2])


def test_export_jsonl_roundtrip(spark, tmp_path):
    """export_jsonl writes per-split gzip JSONL a plain-Python reader can
    consume line-by-line; the roundtrip preserves every row and field."""
    import gzip
    import json
    import os

    from ollama_ocr_spark.operators.maintenance import export_jsonl, hash_split

    docs = spark.createDataFrame(
        [(i, f"doc body {i}", i % 7 + 1) for i in range(120)],
        ["doc_id", "text", "n_tokens"],
    )
    path = str(tmp_path / "jsonl")
    export_jsonl(hash_split(docs, key="doc_id"), path)
    splits = sorted(d for d in os.listdir(path) if d.startswith("split="))
    assert splits == ["split=test", "split=train", "split=val"]
    rows = []
    for split in splits:
        for f in os.listdir(f"{path}/{split}"):
            if f.endswith(".gz"):
                with gzip.open(f"{path}/{split}/{f}", "rt") as fh:
                    rows += [json.loads(l) for l in fh]
    assert len(rows) == 120
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[5]["text"] == "doc body 5" and by_id[5]["n_tokens"] == 6


def test_dedup_chunks_keeper_and_multiplicity(spark):
    """Min bit-packed (doc, chunk) position keeps; every copy carries the
    digest multiplicity; unique chunks keep with n_copies=1."""
    from ollama_ocr_spark.operators.dedup import dedup_chunks

    chunks = spark.createDataFrame(
        [(1, 0, "shared passage"), (1, 1, "only here"),
         (2, 0, "shared passage"), (2, 1, "shared passage"),
         (3, 0, "another one")],
        ["doc_id", "chunk_id", "chunk"],
    )
    rows = {(r["doc_id"], r["chunk_id"]): r
            for r in dedup_chunks(chunks).collect()}
    assert rows[(1, 0)]["keep"] and rows[(1, 0)]["n_copies"] == 3
    assert not rows[(2, 0)]["keep"] and not rows[(2, 1)]["keep"]
    assert rows[(1, 1)]["keep"] and rows[(1, 1)]["n_copies"] == 1
    assert rows[(3, 0)]["keep"]


def test_simhash_band_recall_pigeonhole(spark):
    """bands > max_hamming guarantees recall 1.0 (pigeonhole); candidate
    volume is monotone in band count; truth is shared across rows."""
    from ollama_ocr_spark.operators.dedup import simhash_band_recall

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(i, base + f" s{i % 4} t{i % 3}") for i in range(12)]
        + [(90, base + " s0 t0")],
        ["doc_id", "text"],
    )
    rows = {r["n_bands"]: r
            for r in simhash_band_recall(docs, hash_fn="md5").collect()}
    assert set(rows) == {2, 4, 8}
    assert rows[4]["n_truth"] == rows[2]["n_truth"] > 0
    assert rows[4]["recall"] == 1.0 and rows[8]["recall"] == 1.0
    assert rows[2]["recall"] <= 1.0
    assert (rows[2]["n_candidates"] <= rows[4]["n_candidates"]
            <= rows[8]["n_candidates"])
    assert all(r["n_hits"] <= r["n_truth"] for r in rows.values())


def test_wave_makespan_simulation(spark):
    """Python replication of the simulator on hand counts: the big host
    alone sets the wave count; shrinking bursts adds waves but each wave
    is cheaper; makespans match exactly (integer arithmetic)."""
    import hashlib

    from ollama_ocr_spark.operators.maintenance import wave_makespan

    hosts = {"big.com": 40, "mid.com": 10, "tiny.com": 2}
    urls = spark.createDataFrame(
        [(f"https://{h}/p{i}.html",) for h, n in hosts.items()
         for i in range(n)],
        ["url"],
    )
    def lat(h):
        return int(hashlib.md5(h.encode()).hexdigest()[:8], 16) % 200 + 50
    def model(b):
        waves = {}
        for h, n in hosts.items():
            for w in range((n + b - 1) // b):
                d = min(b, n - w * b) * lat(h)
                waves[w] = max(waves.get(w, 0), d)
        return len(waves), sum(waves.values())
    rows = {r["burst"]: r for r in wave_makespan(urls, (8, 16, 32)).collect()}
    for b in (8, 16, 32):
        nw, ms = model(b)
        assert (rows[b]["n_waves"], rows[b]["makespan_ms"]) == (nw, ms), b
    assert rows[8]["n_waves"] == 5 and rows[32]["n_waves"] == 2


def test_containment_histogram_asymmetric_bands(spark):
    """A short doc fully embedded in a long one lands in the TOP
    containment band even though its Jaccard band is low — the asymmetry
    the report exists to expose."""
    from ollama_ocr_spark.operators.dedup import (containment_histogram,
                                                  jaccard_histogram)

    short = "a b c d e f"                       # 2 shingles
    long_ = short + " " + " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame([(1, short), (2, long_)],
                                 ["doc_id", "text"])
    c = {r["bucket"]: r["n_pairs"]
         for r in containment_histogram(docs, max_posting=None).collect()}
    j = {r["bucket"]: r["n_pairs"]
         for r in jaccard_histogram(docs, max_posting=None).collect()}
    assert c == {19: 1}          # containment 2/2 = 1.0 -> top band
    assert max(j) < 19           # jaccard 2/32 -> a low band


def test_minhash_band_recall_monotone(spark):
    """Recall and candidate volume are non-decreasing in band count;
    truth is shared across rows; an identical-doc pair is recalled by
    every banding (equal signatures share every band)."""
    from ollama_ocr_spark.operators.dedup import minhash_band_recall

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(i, base + f" s{i % 5} t{i % 3} u{i % 2}") for i in range(14)]
        + [(70, base + " s0 t0 u0")],     # identical to doc 0
        ["doc_id", "text"],
    )
    rows = {r["n_bands"]: r
            for r in minhash_band_recall(docs, max_posting=None).collect()}
    assert set(rows) == {2, 4, 8}
    assert rows[2]["rows_per_band"] == 4 and rows[8]["rows_per_band"] == 1
    assert rows[2]["n_truth"] == rows[8]["n_truth"] > 0
    assert (rows[2]["n_candidates"] <= rows[4]["n_candidates"]
            <= rows[8]["n_candidates"])
    assert rows[2]["recall"] <= rows[4]["recall"] <= rows[8]["recall"]
    assert all(r["n_hits"] >= 1 for r in rows.values())  # the planted dup


def test_selection_drift_biased_slice(spark):
    """A recrawl policy perfectly correlated with one source (all of a's
    ids hit %5==0, none of b's) reads TVD 0.5; shares are 8dp-rounded and
    the TVD headline repeats on every group row."""
    from ollama_ocr_spark.operators.maintenance import selection_drift

    rows = [(i, "a") for i in (0, 5, 10)] + [(i, "b") for i in (1, 2, 3)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = {r["source"]: r for r in selection_drift(df).collect()}
    assert set(out) == {"a", "b"}
    a, b = out["a"], out["b"]
    assert a["n_full"] == 3 and a["n_recrawl"] == 3
    assert b["n_full"] == 3 and b["n_recrawl"] == 0
    assert a["share_full"] == 0.5 and a["share_recrawl"] == 1.0
    assert b["share_recrawl"] == 0.0
    assert a["abs_delta"] == 0.5 and b["abs_delta"] == 0.5
    assert a["tvd"] == b["tvd"] == 0.5


def test_selection_drift_unbiased_slice(spark):
    """An unbiased slice (each source contributes proportionally) reads
    TVD 0 — the no-drift baseline."""
    from ollama_ocr_spark.operators.maintenance import selection_drift

    rows = [(0, "a"), (1, "a"), (5, "b"), (6, "b")]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = selection_drift(df).collect()
    assert all(r["tvd"] == 0.0 and r["abs_delta"] == 0.0 for r in out)


def test_filter_attribution_marginal_vs_shadowed(spark):
    """Atomic-rule audit: n_fail counts every failing doc, n_fail_only
    only docs no OTHER rule also rejects — a rule with n_fail > 0 but
    n_fail_only == 0 is fully shadowed."""
    from ollama_ocr_spark.operators.textstats import filter_attribution

    good = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away to the old stone house in the valley")
    rows = [
        (1, good),
        (2, good),                                    # duplicate ONLY
        (3, "tiny"),                   # too_few_words + low_stopword + top
        (4, " ".join(["the"] * 12)),   # low_distinct + top + dup_kgrams
        (5, "the the the the w1 w2 w3 w4 w5 w6"),     # top_word_heavy ONLY
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["rule"]: r for r in filter_attribution(df).collect()}
    assert set(out) == {
        "too_few_words", "mean_wl_low", "mean_wl_high", "low_stopword",
        "low_distinct", "top_word_heavy", "dup_kgrams", "duplicate",
    }
    assert all(r["n_keep"] == 1 for r in out.values())      # only doc 1
    assert out["duplicate"]["n_fail"] == 1
    assert out["duplicate"]["n_fail_only"] == 1              # marginal
    assert out["top_word_heavy"]["n_fail"] == 3
    assert out["top_word_heavy"]["n_fail_only"] == 1         # doc 5
    assert out["too_few_words"]["n_fail"] == 1
    assert out["too_few_words"]["n_fail_only"] == 0          # shadowed
    assert out["low_stopword"]["n_fail"] == 1
    assert out["low_distinct"]["n_fail"] == 1
    assert out["dup_kgrams"]["n_fail"] == 1
    assert out["dup_kgrams"]["n_fail_only"] == 0
    assert out["mean_wl_low"]["n_fail"] == 0
    assert out["mean_wl_high"]["n_fail"] == 0
    assert out["top_word_heavy"]["fail_rate"] == 0.6


def test_token_drift_biased_slice(spark):
    """Slice docs (id%5==0) use disjoint vocabulary from the rest: slice
    tokens read share_recrawl ≈ 1·share, absent tokens read 0, and
    head_tvd is the decimal-summed half-L1 over the top-k rows; ties in
    n_full break by token text (k limit deterministic)."""
    from ollama_ocr_spark.operators.textstats import token_drift

    rows = [(0, "aa aa bb"), (5, "aa bb cc"),       # in slice
            (1, "dd dd ee"), (2, "dd ee ff")]       # out of slice
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["token"]: r for r in token_drift(df, k=3).collect()}
    # full counts: aa=3 dd=3 bb=2 ee=2 cc=1 ff=1 → top3 = aa, dd, bb
    assert set(out) == {"aa", "bb", "dd"}
    assert out["aa"]["n_full"] == 3 and out["aa"]["n_recrawl"] == 3
    assert out["dd"]["n_full"] == 3 and out["dd"]["n_recrawl"] == 0
    assert out["aa"]["share_full"] == 0.25           # 3/12
    assert out["aa"]["share_recrawl"] == 0.5         # 3/6
    assert out["dd"]["share_recrawl"] == 0.0
    # deltas are computed from the 8dp-ROUNDED shares (the oracle
    # contract): bb reads |0.16666667 - 0.33333333| = 0.16666666
    assert out["bb"]["abs_delta"] == 0.16666666
    assert all(r["head_tvd"] == 0.33333333 for r in out.values())


def test_pii_stats_per_source_rollup(spark):
    """Per-source audit counts hit-docs once regardless of hit count,
    totals per type, and rates against the group size."""
    from ollama_ocr_spark.operators.textstats import pii_stats

    rows = [
        (1, "s1", "mail a@b.com and c@d.org here"),     # 2 emails
        (2, "s1", "clean text"),
        (3, "s2", "server 10.0.0.1 ring +1 555 010 1234"),  # ip + phone
        (4, "s2", "also clean"),
        (5, "s2", "still clean"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    out = {r["source"]: r for r in pii_stats(df).collect()}
    s1, s2 = out["s1"], out["s2"]
    assert s1["n_docs"] == 2 and s1["n_docs_with_pii"] == 1
    assert s1["total_emails"] == 2 and s1["total_ipv4"] == 0
    assert s1["pii_doc_rate"] == 0.5
    assert s2["n_docs"] == 3 and s2["n_docs_with_pii"] == 1
    assert s2["total_ipv4"] == 1 and s2["total_phones"] == 1
    assert s2["pii_doc_rate"] == 0.3333


def test_shard_manifest_checksum_order_free_and_swap_sensitive(spark):
    """The manifest checksum is order-free (same docs, any order/shard
    layout → same value) but moves when a doc is SWAPPED even if counts
    and token mass stay identical."""
    from ollama_ocr_spark.operators.maintenance import shard_manifest

    base = [(1, 5, 0), (2, 5, 0), (3, 5, 1)]
    swapped = [(1, 5, 0), (4, 5, 0), (3, 5, 1)]     # doc 2 -> doc 4
    cols = ["doc_id", "n_tokens", "shard"]
    m = {r["shard"]: r for r in shard_manifest(
        spark.createDataFrame(base, cols)).collect()}
    m_rev = {r["shard"]: r for r in shard_manifest(
        spark.createDataFrame(list(reversed(base)), cols)).collect()}
    m_swp = {r["shard"]: r for r in shard_manifest(
        spark.createDataFrame(swapped, cols)).collect()}
    assert m[0]["n_docs"] == 2 and m[0]["n_tokens"] == 10
    assert m[0]["min_key"] == 1 and m[0]["max_key"] == 2
    assert m[0]["checksum"] == m_rev[0]["checksum"]       # order-free
    assert m[1] == m_rev[1] == m_swp[1]                   # untouched shard
    assert m_swp[0]["n_docs"] == 2 and m_swp[0]["n_tokens"] == 10
    assert m_swp[0]["checksum"] != m[0]["checksum"]       # swap detected


def test_normalize_text_nfc_kernel(spark):
    """NFC composes decomposed sequences (changed=true, one code point
    shorter), leaves composed/ASCII text alone, and matches Python's
    unicodedata reference exactly."""
    import unicodedata

    from ollama_ocr_spark.operators.textstats import normalize_text_stage

    rows = [
        (1, "plain ascii"),
        (2, "cafe\u0301 mixed"),      # decomposed -> composes
        (3, "caf\u00e9 already"),     # precomposed -> unchanged
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in normalize_text_stage(df).collect()}
    assert not out[1]["changed"] and out[1]["norm_text"] == "plain ascii"
    assert out[2]["changed"]
    assert out[2]["norm_text"] == unicodedata.normalize("NFC", rows[1][1])
    assert out[2]["chars_in"] == out[2]["chars_out"] + 1
    assert not out[3]["changed"]
    assert out[3]["chars_in"] == out[3]["chars_out"]


def test_normalize_text_nfkc_casefold_kernel(spark):
    """NFKC folds compatibility characters (ligature, fullwidth,
    vulgar fraction); casefold goes beyond lower() (ß→ss, İ→i+U+0307);
    the composition matches NFKC(casefold(NFKC(t))) exactly; unknown
    forms are refused."""
    import unicodedata

    import pytest

    from ollama_ocr_spark.operators.textstats import normalize_text_stage

    rows = [
        (1, "\ufb01le \uff21\u0130"),   # ligature + fullwidth + dotted I
        (2, "Stra\u00dfe \u00bd"),      # sharp s + vulgar fraction
        (3, "plain ascii"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r
           for r in normalize_text_stage(
               df, form="NFKC", casefold=True).collect()}

    def ref(t):
        n = unicodedata.normalize("NFKC", t)
        return unicodedata.normalize("NFKC", n.casefold())

    assert out[1]["norm_text"] == ref(rows[0][1]) == "file ai\u0307"
    assert out[1]["changed"]
    assert out[2]["norm_text"] == ref(rows[1][1]) == "strasse 1\u20442"
    assert out[2]["changed"]
    assert out[2]["chars_out"] == len("strasse 1\u20442")
    assert out[3]["norm_text"] == "plain ascii" and not out[3]["changed"]
    with pytest.raises(ValueError, match="normalization form"):
        normalize_text_stage(df, form="NFKC_CF")


def test_bbit_minhash_eval_identical_pair_exact(spark):
    """An identical-doc pair reads zero error under BOTH estimators: the
    full estimate is 8/8 = 1, and the b-bit correction maps a perfect
    match back to exactly 1 ((1 - c0)/(1 - c0)); bands/columns match the
    full-width eval's shape."""
    from ollama_ocr_spark.operators.dedup import bbit_minhash_eval

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [(i, base + f" s{i % 4} t{i % 3}") for i in range(10)]
        + [(50, base + " s0 t0")],      # identical to doc 0
        ["doc_id", "text"],
    )
    rows = bbit_minhash_eval(docs, max_posting=None).collect()
    assert rows, "no candidate pairs scored"
    top = {r["bucket"]: r for r in rows}[19]     # the j=1.0 band
    assert top["err_full"] == 0.0 and top["err_bbit"] == 0.0
    assert all(r["n_pairs"] >= 1 and r["err_bbit"] >= 0.0 for r in rows)


def test_weighted_sample_deterministic_and_weight_biased(spark):
    """A-ES sampling: identical input → identical sample (no RNG), k >= n
    returns everything, priorities are non-positive and descending, and a
    heavy row (weight 10^6 vs 1) wins a top-1 draw on this fixture."""
    from ollama_ocr_spark.operators.maintenance import weighted_sample

    rows = [(i, 1) for i in range(20)] + [(99, 1_000_000)]
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    s1 = weighted_sample(df, k=5).collect()
    s2 = weighted_sample(df, k=5).collect()
    assert [r["doc_id"] for r in s1] == [r["doc_id"] for r in s2]
    pris = [r["priority"] for r in s1]
    assert all(p <= 0 for p in pris) and pris == sorted(pris, reverse=True)
    assert s1[0]["doc_id"] == 99                      # heavy row leads
    everything = weighted_sample(df, k=100).collect()
    assert len(everything) == 21


def test_event_funnel_order_and_simultaneity(spark):
    """Funnel semantics: out-of-order (click before view), missing-step,
    and simultaneous (strictly-after required) users all stall at stage
    1; only the properly ordered user converts through stage 3."""
    from ollama_ocr_spark.operators.reports import event_funnel

    rows = [
        ("a", "view", 1), ("a", "click", 2), ("a", "purchase", 3),
        ("b", "click", 1), ("b", "view", 2),           # click too early
        ("c", "view", 1), ("c", "purchase", 2),        # skipped click
        ("d", "view", 1), ("d", "click", 1),           # simultaneous
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts_us"])
    out = {r["stage"]: r for r in event_funnel(df).collect()}
    assert out[1]["n_users"] == 4 and out[1]["step_rate"] == 1.0
    assert out[2]["n_users"] == 1 and out[2]["step_rate"] == 0.25
    assert out[3]["n_users"] == 1 and out[3]["step_rate"] == 1.0
    assert out[3]["frac_of_entry"] == 0.25
    assert [out[s]["event_type"] for s in (1, 2, 3)] == [
        "view", "click", "purchase"]


def test_event_funnel_empty_entry_stage(spark):
    """ANSI sessions throw on x/0 — an empty entry stage must yield NULL
    fractions (DuckDB's own /0 result), not a DIVIDE_BY_ZERO crash; the
    stage-1 step_rate stays the literal 1.0 on both engines."""
    from ollama_ocr_spark.operators.reports import event_funnel

    rows = [("a", "click", 1), ("a", "purchase", 2)]  # nobody views
    df = spark.createDataFrame(rows, ["user_id", "event_type", "ts_us"])
    out = {r["stage"]: r for r in event_funnel(df).collect()}
    assert [out[s]["n_users"] for s in (1, 2, 3)] == [0, 0, 0]
    assert all(out[s]["frac_of_entry"] is None for s in (1, 2, 3))
    assert out[1]["step_rate"] == 1.0
    assert out[2]["step_rate"] is None and out[3]["step_rate"] is None


def test_with_session_ids_overflow_raises(spark):
    """The user<<20|sid bit-pack silently collides keys past its caps —
    the fence must fail loudly instead (user id >= 2^43 here)."""
    import pytest

    from ollama_ocr_spark.operators.reports import with_session_ids

    df = spark.createDataFrame(
        [(1 << 43, 100, 1), (1 << 43, 200, 2)],
        ["user_id", "ts_us", "event_id"])
    with pytest.raises(Exception, match="bit-pack"):
        with_session_ids(df).collect()


def test_drift_reports_empty_slice_null_not_crash(spark):
    """selection_drift/token_drift with an empty recrawl slice: NULL
    shares and NULL TVD (mirroring DuckDB /0), never DIVIDE_BY_ZERO."""
    from ollama_ocr_spark.operators.maintenance import selection_drift
    from ollama_ocr_spark.operators.textstats import token_drift

    docs = spark.createDataFrame(
        [(1, "s0", "alpha beta"), (3, "s1", "beta gamma")],
        ["doc_id", "source", "text"],
    )  # all doc_ids odd -> doc_id % 2 == 0 selects nothing
    sel = selection_drift(docs, recrawl_mod=2).collect()
    assert all(r["share_recrawl"] is None and r["tvd"] is None
               for r in sel)
    assert {r["source"]: r["share_full"] for r in sel} == {
        "s0": 0.5, "s1": 0.5}
    tok = token_drift(docs, recrawl_mod=2).collect()
    assert tok and all(r["share_recrawl"] is None and r["head_tvd"] is None
                       for r in tok)


def test_retention_cohorts_triangle(spark):
    """Cohorting uses the FIRST active day; later-day activity counts at
    its integer offset; multiple same-day events count a user once."""
    from ollama_ocr_spark.operators.reports import retention_cohorts

    D = 86_400_000_000
    rows = [
        ("a", 0), ("a", 10), ("a", D), ("a", 2 * D),   # cohort 0: d0,1,2
        ("b", 0), ("b", 2 * D),                         # cohort 0: d0,2
        ("c", D), ("c", D + 5),                         # cohort 1: d1 only
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts_us"])
    out = {(r["cohort_day"], r["day_offset"]): r
           for r in retention_cohorts(df).collect()}
    assert out[(0, 0)]["n_users"] == 2 and out[(0, 0)]["retention"] == 1.0
    assert out[(0, 1)]["n_users"] == 1 and out[(0, 1)]["retention"] == 0.5
    assert out[(0, 2)]["n_users"] == 2
    assert out[(1, 0)]["n_users"] == 1
    assert out[(1, 0)]["cohort_size"] == 1
    assert (1, 1) not in out          # c never returns


def test_graph_triangles_census(spark):
    """A known little graph: K3 (a,b,c) + a pendant edge (c,d) + a
    directed duplicate and a self-loop that must canonicalize away.
    T=1, nodes=4, edges=4, wedges = C(2,2)x2 + C(3,2) + C(1,2) = 1+1+3+0
    = 5, clustering = 3/5."""
    from ollama_ocr_spark.operators.linkgraph import graph_triangles

    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("a", "c", 1),
         ("c", "a", 9),          # duplicate of (a,c) after canonicalizing
         ("d", "d", 1),          # self-loop dropped
         ("c", "d", 1)],
        ["src_host", "dst_host", "n_links"],
    )
    r = graph_triangles(edges).collect()[0]
    assert r["n_nodes"] == 4 and r["n_edges"] == 4
    assert r["n_triangles"] == 1 and r["n_wedges"] == 5
    assert r["global_clustering"] == 0.6


def test_graph_triangles_no_wedges_null(spark):
    """A single isolated edge has no wedges: clustering is NULL, not a
    division error."""
    from ollama_ocr_spark.operators.linkgraph import graph_triangles

    edges = spark.createDataFrame(
        [("a", "b", 1)], ["src_host", "dst_host", "n_links"])
    r = graph_triangles(edges).collect()[0]
    assert r["n_triangles"] == 0 and r["n_wedges"] == 0
    assert r["global_clustering"] is None


def test_event_anomalies_flags_spike(spark):
    """A flat 10/day series with a 100-count day 4: the spike day flags
    even though its trailing window [10,10,10] has ZERO variance (z is
    NULL, the exact-inequality fallback fires — the collapsed-crawler
    case); the flat day 3 does not flag; days 0-2 (no full window) are
    omitted."""
    from ollama_ocr_spark.operators.reports import event_anomalies

    D = 86_400_000_000
    rows = []
    for d, cnt in enumerate([10, 10, 10, 10, 100, 10]):
        rows += [("view", d * D + i) for i in range(cnt)]
    df = spark.createDataFrame(rows, ["event_type", "ts_us"])
    out = {r["day"]: r for r in event_anomalies(df).collect()}
    assert set(out) == {3, 4, 5}
    assert out[3]["z"] is None and out[3]["is_anomaly"] is False
    assert out[4]["trail_mean"] == 10.0
    assert out[4]["z"] is None and out[4]["is_anomaly"] is True
    # day 5's window [10,10,100]: mean 40, std sqrt(1800), z<0 non-null
    assert out[5]["z"] is not None and out[5]["z"] < 0
    assert out[5]["is_anomaly"] is False


def test_bot_suspects_regularity_screen(spark):
    """Constant-gap volume users flag; irregular humans and low-volume
    regulars don't; all-sub-second users hit the mean-0 fallback (pure
    machine rate) and flag on volume alone."""
    from ollama_ocr_spark.operators.reports import bot_suspects

    S = 1_000_000
    rows, eid = [], 0

    def add(u, times):
        nonlocal eid
        for t in times:
            rows.append((u, eid, t))
            eid += 1

    add("bot", [i * 5 * S for i in range(25)])            # exact 5s gaps
    add("human", [0, 3*S, 40*S, 41*S, 300*S, 301*S, 302*S, 900*S,
                  905*S, 2000*S, 2004*S, 2100*S, 3600*S, 3700*S,
                  3705*S, 5000*S, 5100*S, 5105*S, 7000*S, 7500*S])
    add("casual", [i * 5 * S for i in range(5)])          # regular, low n
    add("subsec", [i * 1000 for i in range(25)])          # 1ms gaps
    df = spark.createDataFrame(rows, ["user_id", "event_id", "ts_us"])
    out = {r["user_id"]: r for r in bot_suspects(df).collect()}
    assert out["bot"]["cv"] == 0.0 and out["bot"]["is_bot"] is True
    assert out["bot"]["mean_gap_s"] == 5.0
    assert out["human"]["is_bot"] is False and out["human"]["cv"] > 0.5
    assert out["casual"]["is_bot"] is False              # n < 20
    assert out["subsec"]["cv"] is None                   # mean 0 fallback
    assert out["subsec"]["is_bot"] is True


def test_stratified_sample_exact_counts(spark):
    """Every stratum keeps exactly ceil(n * frac / 10000) rows — a
    3-row stratum survives a 10% sample with exactly one row (the
    per-row-coin approach can drop it entirely), and re-running yields
    the identical row set (RNG-free)."""
    from ollama_ocr_spark.operators.maintenance import stratified_sample

    rows = ([(i, "big") for i in range(40)]
            + [(100 + i, "small") for i in range(3)])
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    s1 = stratified_sample(df, frac_bp=1000).collect()
    s2 = stratified_sample(df, frac_bp=1000).collect()
    by = {}
    for r in s1:
        by.setdefault(r["source"], []).append(r["doc_id"])
    assert len(by["big"]) == 4          # ceil(40 * 0.1)
    assert len(by["small"]) == 1        # floor would be 0
    assert sorted(r["doc_id"] for r in s1) == sorted(
        r["doc_id"] for r in s2)
    assert all(r["sample_rank"] >= 1 for r in s1)


def test_stratified_sample_bucketed_rank_exact(spark):
    """The two-pass bucketed rank (prefix-sum offsets + within-bucket
    row_number) must equal the naive one-window per-stratum md5 rank
    EXACTLY — same keepers, same sample_rank values — including at
    bucket_hex=1 where every stratum genuinely splits across buckets."""
    from pyspark.sql import Window, functions as F

    from ollama_ocr_spark.operators.maintenance import stratified_sample

    rows = ([(i, "big") for i in range(200)]
            + [(1000 + i, "small") for i in range(7)])
    df = spark.createDataFrame(rows, ["doc_id", "source"])

    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("strat|"), F.col("doc_id").cast("string"))),
        F.col("doc_id"),
    )
    wn = Window.partitionBy("source")
    naive = (
        df.select(
            "doc_id", "source",
            F.row_number().over(w).alias("sample_rank"),
            F.count("*").over(wn).alias("__n"),
        )
        .filter(F.col("sample_rank") <= F.expr("(__n * 2500 + 9999) div 10000"))
        .select("doc_id", "source", F.col("sample_rank").cast("int")
                .alias("sample_rank"))
    )
    for bh in (1, 2):
        got = sorted(map(tuple, stratified_sample(
            df, frac_bp=2500, bucket_hex=bh).collect()))
        assert got == sorted(map(tuple, naive.collect()))


def test_sessionized_funnel_resets_at_gap(spark):
    """A view→click pair split by a gap larger than the session boundary
    does NOT convert (the whole-history funnel would count it); the same
    pair inside one session does. Session ids restart per user and the
    bit-packed key keeps users separate."""
    from ollama_ocr_spark.operators.reports import (sessionized_funnel,
                                                    with_session_ids)

    H = 3_600 * 1_000_000
    rows = [
        # user 1: view then click 2h later, same session (gap 24h)
        (1, 0, "view", 0), (1, 1, "click", 2 * H),
        # user 2: view, then click 48h later → NEW session, no convert
        (2, 2, "view", 0), (2, 3, "click", 48 * H),
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "event_id", "event_type", "ts_us"])
    sids = {(r["user_id"], r["event_id"]): r["session_id"]
            for r in with_session_ids(df).collect()}
    assert sids[(1, 0)] == sids[(1, 1)] == 0
    assert sids[(2, 2)] == 0 and sids[(2, 3)] == 1
    out = {r["stage"]: r for r in sessionized_funnel(df).collect()}
    assert out[1]["n_users"] == 2       # two view-entered sessions
    assert out[2]["n_users"] == 1       # only user 1's converts


def test_wave_makespan_mixture_matches_reference(spark):
    """The mixture simulator must match a pure-Python reference exactly:
    same salted-md5 class/latency draws, same wave grid, each wave owned
    by its slowest host (ties to the smaller host name), per-class
    rollup against the burst total."""
    import hashlib
    from collections import defaultdict

    from ollama_ocr_spark.operators.maintenance import wave_makespan_mixture

    def u32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    hosts = {f"h{i}.example.com": 3 + (i * 7) % 40 for i in range(12)}
    urls = [(f"https://{h}/p{j}.html",)
            for h, n in hosts.items() for j in range(n)]
    df = spark.createDataFrame(urls, ["url"])
    got = {(r["burst"], r["lat_class"]): r
           for r in wave_makespan_mixture(df, burst_sizes=(4, 16)).collect()}

    for b in (4, 16):
        owned = defaultdict(lambda: [0, 0])
        waves = defaultdict(list)
        for h, n in hosts.items():
            bkt = u32("lcls|" + h) % 10
            jit = u32("ljit|" + h)
            cls = "cdn" if bkt < 6 else ("origin" if bkt < 9 else "tarpit")
            lat = (30 + jit % 40 if bkt < 6 else
                   120 + jit % 160 if bkt < 9 else 1500 + jit % 1000)
            for w in range((n + b - 1) // b):
                waves[w].append((min(b, n - w * b) * lat, h, cls))
        makespan = 0
        for w, ds in waves.items():
            dur, _, cls = sorted(ds, key=lambda t: (-t[0], t[1]))[0]
            owned[cls][0] += 1
            owned[cls][1] += dur
            makespan += dur
        for cls, (nw, ms) in owned.items():
            r = got[(b, cls)]
            assert (r["n_waves_owned"], r["owned_ms"],
                    r["makespan_ms"]) == (nw, ms, makespan)
            assert r["share"] == round(ms * 1.0 / makespan, 4) or \
                abs(r["share"] - ms / makespan) < 5e-5
        assert {c for (bb, c) in got if bb == b} == set(owned)


def test_bpe_learn_greedy_merges_and_exhaustion(spark):
    """Hand-checkable corpus: 'aaaa' x3 + 'ab' x1. Round 1 merges (a,a)
    with count 9 (three overlapping pairs per word, greedy non-overlap
    applies [aa, aa]); round 2 merges (aa,aa) count 3; round 3 (a,b)
    count 1; the pair supply is then exhausted and the merge table just
    stops — k larger than the supply yields fewer rows, identically on
    both engines."""
    from ollama_ocr_spark.operators.textstats import bpe_learn

    df = spark.createDataFrame(
        [(1, "aaaa aaaa"), (2, "aaaa ab")], ["doc_id", "text"])
    rows = {r["merge_rank"]: r for r in bpe_learn(df, k=5).collect()}
    assert len(rows) == 3                      # supply exhausted at 3
    assert (rows[1]["lhs"], rows[1]["rhs"], rows[1]["pair_count"]) \
        == ("a", "a", 9)
    assert (rows[2]["lhs"], rows[2]["rhs"], rows[2]["pair_count"]) \
        == ("aa", "aa", 3)
    assert (rows[3]["lhs"], rows[3]["rhs"], rows[3]["pair_count"]) \
        == ("a", "b", 1)


def test_event_transitions_counts_and_tiebreak(spark):
    """Markov-matrix semantics: adjacency is per user in (ts_us,
    event_id) order. User a's view state splits 50/50 between click and
    purchase; user b's two simultaneous events order by event_id (y then
    x, NOT insertion order); user c's single event contributes nothing.
    p normalizes within the from-state."""
    from ollama_ocr_spark.operators.reports import event_transitions

    rows = [
        ("a", 1, "view", 10), ("a", 2, "click", 20),
        ("a", 3, "view", 30), ("a", 4, "purchase", 40),
        ("b", 2, "x", 5), ("b", 1, "y", 5),     # same ts: id 1 first
        ("c", 9, "click", 7),                   # no successor
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "event_id", "event_type", "ts_us"])
    out = {(r["from_type"], r["to_type"]): r
           for r in event_transitions(df).collect()}
    assert set(out) == {("view", "click"), ("view", "purchase"),
                        ("click", "view"), ("y", "x")}
    vc = out[("view", "click")]
    assert (vc["n_transitions"], vc["n_from"], vc["p"]) == (1, 2, 0.5)
    vp = out[("view", "purchase")]
    assert (vp["n_transitions"], vp["n_from"], vp["p"]) == (1, 2, 0.5)
    cv = out[("click", "view")]
    assert (cv["n_transitions"], cv["n_from"], cv["p"]) == (1, 1, 1.0)
    yx = out[("y", "x")]
    assert (yx["n_transitions"], yx["n_from"], yx["p"]) == (1, 1, 1.0)


def test_event_stationary_chain_dangling_selfloop(spark):
    """Three chain shapes pin the semantics: a symmetric a<->b chain
    stays at the uniform fixed point (0.5/0.5) while the empirical
    share reads 0.6/0.4 — the stationarity-divergence signal; a
    dangling absorber leaks mass pagerank-style (the from-state decays
    to bare teleport (1-d)/n); a pure self-loop KEEPS its mass at 1.0
    (self-transitions are real dwell, not dropped like host chrome
    links)."""
    from ollama_ocr_spark.operators.reports import event_stationary

    chain = spark.createDataFrame(
        [("u", 1, "a", 1), ("u", 2, "b", 2), ("u", 3, "a", 3),
         ("u", 4, "b", 4), ("u", 5, "a", 5)],
        ["user_id", "event_id", "event_type", "ts_us"])
    rows = {r["event_type"]: r for r in event_stationary(chain).collect()}
    assert rows["a"]["stationary_p"] == 0.5
    assert rows["b"]["stationary_p"] == 0.5
    assert rows["a"]["empirical_share"] == 0.6
    assert rows["b"]["empirical_share"] == 0.4

    absorb = spark.createDataFrame(
        [("u1", 1, "a", 1), ("u1", 2, "b", 2),
         ("u2", 1, "a", 1), ("u2", 2, "b", 2)],
        ["user_id", "event_id", "event_type", "ts_us"])
    rows = {r["event_type"]: r
            for r in event_stationary(absorb).collect()}
    assert rows["a"]["stationary_p"] == 0.075       # bare teleport
    assert rows["b"]["stationary_p"] == 0.13875     # leaked, not 0.925
    assert rows["a"]["stationary_p"] < rows["b"]["stationary_p"]

    loop = spark.createDataFrame(
        [("u", 1, "a", 1), ("u", 2, "a", 2), ("u", 3, "a", 3)],
        ["user_id", "event_id", "event_type", "ts_us"])
    r = event_stationary(loop).collect()[0]
    assert (r["stationary_p"], r["empirical_share"]) == (1.0, 1.0)


def test_user_transition_entropy_hand_values(spark):
    """Alternating a/b gives the two-outcome maximum ln 2 = 0.693147
    (c=2 terms: 2 x round(ln .5, 8) summed exactly, one final /n); a
    pure self-loop user reads exactly 0.0 (ln 1 = 0); a single-event
    user has no transition distribution and is absent."""
    from ollama_ocr_spark.operators.reports import user_transition_entropy

    df = spark.createDataFrame(
        [("A", 1, "a", 1), ("A", 2, "b", 2), ("A", 3, "a", 3),
         ("A", 4, "b", 4), ("A", 5, "a", 5),
         ("B", 1, "a", 1), ("B", 2, "a", 2), ("B", 3, "a", 3),
         ("B", 4, "a", 4),
         ("C", 1, "x", 1)],
        ["user_id", "event_id", "event_type", "ts_us"])
    out = {r["user_id"]: r for r in user_transition_entropy(df).collect()}
    assert set(out) == {"A", "B"}
    a = out["A"]
    assert (a["n_transitions"], a["n_pairs"], a["entropy"]) \
        == (4, 2, 0.693147)
    b = out["B"]
    assert (b["n_transitions"], b["n_pairs"], b["entropy"]) == (3, 1, 0.0)


def test_event_transitions_plan_single_pass(spark):
    """The matrix plan is one linear chain: user-key exchange for the
    lag window, pair-counter agg, from-state total window — three
    exchanges, each crossed once, no Python stage, no non-equi join.
    The payload never joins anything."""
    from ollama_ocr_spark.operators.reports import event_transitions

    df = spark.createDataFrame(
        [("u", 1, "a", 1), ("u", 2, "b", 2), ("v", 1, "a", 1)],
        ["user_id", "event_id", "event_type", "ts_us"])
    plan = (event_transitions(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Exchange") == 3
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_user_transition_entropy_corpus_window_once(spark):
    """The per-user pair table is localCheckpoint-ed, so the THREE
    consuming branches (totals, terms join, final join) never re-run
    the corpus-wide lag window: the downstream plan contains ZERO
    Window nodes — only small exchanges over the checkpointed pairs."""
    from ollama_ocr_spark.operators.reports import user_transition_entropy

    df = spark.createDataFrame(
        [("u", 1, "a", 1), ("u", 2, "b", 2), ("v", 1, "a", 1)],
        ["user_id", "event_id", "event_type", "ts_us"])
    plan = (user_transition_entropy(df)
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Window [") == 0
    assert plan.count("Exchange") <= 3
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_state_dwell_stats_gaps_and_quantization(spark):
    """Dwell = gap to the same user's next event: user u sits in 'a'
    2s then 'b' 3s; simultaneous events (gap 0) still count as
    transitions; sub-second gaps floor to 0 via BIGINT div; terminal
    events contribute nothing."""
    from ollama_ocr_spark.operators.reports import state_dwell_stats

    us = 1_000_000
    rows = [
        ("u", 1, "a", 0), ("u", 2, "b", 2 * us), ("u", 3, "a", 5 * us),
        ("v", 1, "a", 0), ("v", 2, "a", 0),          # gap exactly 0
        ("w", 1, "b", 0), ("w", 2, "a", 1_500_000),  # 1.5s floors to 1
        ("x", 9, "c", 7),                            # terminal only
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "event_id", "event_type", "ts_us"])
    out = {r["from_type"]: r for r in state_dwell_stats(df).collect()}
    assert set(out) == {"a", "b"}
    a = out["a"]                     # u: 2s, v: 0s -> n=2, total 2
    assert (a["n_transitions"], a["total_dwell_s"], a["mean_dwell_s"]) \
        == (2, 2, 1.0)
    b = out["b"]                     # u: 3s, w: 1.5s->1 -> n=2, total 4
    assert (b["n_transitions"], b["total_dwell_s"], b["mean_dwell_s"]) \
        == (2, 4, 2.0)


def test_host_for_expr_matches_corpus_arithmetic(spark):
    """__spark_entry__._host_for_expr is the engine-side twin of
    corpus.host_for (and of the oracle's _host_case) — the three must
    never drift (CLAUDE.md sync contract). Pinned over a doc_id range
    covering every branch incl. the %13 tail wrap."""
    import __spark_entry__ as entry
    from ollama_ocr_spark.corpus import host_for

    ids = list(range(0, 260)) + [999, 1000, 12345]
    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = {r["doc_id"]: r["host"]
           for r in df.select(
               "doc_id",
               entry._host_for_expr("doc_id").alias("host")).collect()}
    assert got == {i: host_for(i) for i in ids}
