"""Link-graph operators: outlink extraction, PageRank, crawl diff, and the
unigram-LM quality proxy (the corpus-arithmetic oracles live in
__spark_entry__; these tests pin behavior + plan shape)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from ollama_ocr_spark.corpus import host_for, partner_hosts
from ollama_ocr_spark.operators.extract import synthesize_stage
from ollama_ocr_spark.operators.linkgraph import host_pagerank, outlink_edges
from ollama_ocr_spark.operators.maintenance import crawl_diff, latest_capture


def _expected_edges(documents_smoke) -> Counter:
    exp: Counter = Counter()
    for r in documents_smoke.select("doc_id").collect():
        d = r["doc_id"]
        k = d % 10
        if k > 6 or (k == 4 and d % 20 == 14):
            continue  # no html payload
        src = host_for(d)
        exp[(src, src)] += 8 if k == 4 else 13  # relative chrome links
        for h in partner_hosts(d):
            exp[(src, h)] += 1
    return exp


def test_outlink_edges_match_corpus_arithmetic(spark, documents_smoke):
    pages = latest_capture(synthesize_stage(documents_smoke))
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in outlink_edges(pages).collect()
    }
    assert got == dict(_expected_edges(documents_smoke))


def test_outlink_edges_plan_single_shuffle(spark, documents_smoke):
    """Scan → regex explode → ONE exchange (partial-agg groupBy). No
    Python stage, no nested-loop join anywhere in the plan."""
    plan = (
        outlink_edges(synthesize_stage(documents_smoke))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_host_pagerank_mass_and_ordering(spark, documents_smoke):
    pages = latest_capture(synthesize_stage(documents_smoke))
    ranks = {
        r["host"]: r["rank"]
        for r in host_pagerank(outlink_edges(pages)).collect()
    }
    n = len(ranks)
    assert n >= 4
    total = sum(ranks.values())
    # probability mass: <= 1 (dangling leak is not redistributed),
    # >= pure-teleport floor
    assert 0.15 - 1e-6 <= total <= 1.0 + 1e-6
    assert all(v >= 0.15 / n - 1e-6 for v in ranks.values())
    # h0 absorbs ~half of all partner links (host_for: m<50) → top rank
    assert max(ranks, key=ranks.get) == "h0.example.com"


def test_host_trustrank_starves_link_farm(spark):
    """A spam clique with huge mutual in-link mass but no path from the
    seed gets exactly zero trust; hosts reachable from the seed don't."""
    from ollama_ocr_spark.operators.linkgraph import host_trustrank

    edges = spark.createDataFrame(
        [
            ("good.com", "a.com", 1), ("a.com", "b.com", 1),
            # link farm: spam1<->spam2 with 1000x the link mass
            ("spam1.com", "spam2.com", 1000),
            ("spam2.com", "spam1.com", 1000),
        ],
        ["src_host", "dst_host", "n_links"],
    )
    t = {r["host"]: r["trust"]
         for r in host_trustrank(edges, seeds=["good.com"]).collect()}
    assert t["spam1.com"] == 0.0 and t["spam2.com"] == 0.0
    assert t["good.com"] > 0 and t["a.com"] > 0 and t["b.com"] > 0
    # no seeds in graph -> all-zero trust, not an error
    z = host_trustrank(edges, seeds=["absent.com"]).collect()
    assert all(r["trust"] == 0.0 for r in z)


def test_crawl_diff_counts(spark, documents_smoke):
    pages = synthesize_stage(documents_smoke)
    agg = crawl_diff(pages).agg(
        F.sum("n_urls").alias("u"),
        F.sum("n_recrawled").alias("r"),
        F.sum("n_changed").alias("c"),
        F.sum("n_unchanged").alias("s"),
    ).collect()[0]
    docs = documents_smoke.count()
    recrawled = documents_smoke.filter("doc_id % 5 = 0").count()
    changed = documents_smoke.filter("doc_id % 10 = 5").count()
    assert (agg["u"], agg["r"]) == (docs, recrawled)
    assert (agg["c"], agg["s"]) == (changed, recrawled - changed)


def test_unigram_logprob_flags_rare_tokens(spark):
    from ollama_ocr_spark.operators.textstats import unigram_logprob_scores

    common = "the cat sat on the mat and the dog sat too"
    df = spark.createDataFrame(
        [(i, common) for i in range(9)] + [(9, "zxqv wvvq qqzx vxqz")],
        "doc_id long, text string",
    )
    scores = {
        r["doc_id"]: r["nats_per_token"]
        for r in unigram_logprob_scores(df).collect()
    }
    assert all(v > 0 for v in scores.values())
    # the gibberish doc is the clear outlier under the corpus LM
    assert scores[9] > max(scores[i] for i in range(9)) + 1.0


def test_anchor_text_stats_resolution_and_normalization(spark):
    """Anchor extraction resolves absolute/protocol-relative/site-relative
    hrefs, lowercases + collapses whitespace, and skips nested-markup and
    empty anchors."""
    from ollama_ocr_spark.operators.linkgraph import anchor_text_stats

    html = (
        "<html><body>"
        '<a href="https://Other.Example.com/x">Great  SITE</a>'
        '<a href="//cdn.example.com/y">cdn</a>'
        '<a href="/local">home page</a>'
        '<a href="mailto:x@example.com">mail me</a>'
        '<a href="/nested"><b>bold</b></a>'
        '<a href="https://other.example.com/z">great site</a>'
        "</body></html>"
    ).encode()
    pages = spark.createDataFrame(
        [("https://src.example.com/p", bytearray(html))], ["url", "html"]
    )
    out = {(r["dst_host"], r["anchor"]): r["n_links"]
           for r in anchor_text_stats(pages).collect()}
    assert out == {
        ("other.example.com", "great site"): 2,
        ("cdn.example.com", "cdn"): 1,
        ("src.example.com", "home page"): 1,
    }


def test_recrawl_schedule_buckets(spark):
    """changed re-crawl -> short interval; stable -> long; single capture
    -> default. NULL payloads compare null-safe."""
    from datetime import datetime

    from ollama_ocr_spark.operators.maintenance import recrawl_schedule

    t1, t2 = datetime(2024, 1, 1), datetime(2024, 2, 1)
    u = "https://h.example.com/%s"
    pages = spark.createDataFrame(
        [(u % "changed", t1, bytearray(b"v1")),
         (u % "changed", t2, bytearray(b"v2")),
         (u % "stable", t1, bytearray(b"same")),
         (u % "stable", t2, bytearray(b"same")),
         (u % "once", t1, bytearray(b"only")),
         (u % "gone", t1, None),
         (u % "gone", t2, None)],
        "url string, warc_ts timestamp, html binary",
    )
    rows = {r["url"].rsplit("/", 1)[1]: r
            for r in recrawl_schedule(pages).collect()}
    assert rows["changed"]["interval_hours"] == 24
    assert rows["changed"]["changed"] == 1 and rows["changed"]["n_caps"] == 2
    assert rows["stable"]["interval_hours"] == 168
    assert rows["stable"]["changed"] == 0
    assert rows["once"]["interval_hours"] == 72 and rows["once"]["n_caps"] == 1
    # two NULL captures digest equal (null-safe) -> stable
    assert rows["gone"]["interval_hours"] == 168
    # timestamp TIE: two same-instant captures with different payloads
    # must order deterministically (window breaks ties on digest desc) —
    # 'changed' may never flip between runs on tie-heavy real data
    tie = spark.createDataFrame(
        [(u % "tie", t1, bytearray(b"v1")), (u % "tie", t1, bytearray(b"v2"))],
        "url string, warc_ts timestamp, html binary",
    )
    outs = {tuple(sorted(r["url"].rsplit("/", 1)[1:])
                  + [r["changed"], r["interval_hours"]])
            for _ in range(3)
            for r in recrawl_schedule(tie.repartition(4)).collect()}
    assert outs == {("tie", 1, 24)}


def test_tfidf_top_terms_ranking(spark):
    """A term unique to one doc outscores corpus-wide terms; ties break by
    term asc; rnk caps at k."""
    from ollama_ocr_spark.operators.textstats import tfidf_top_terms

    docs = spark.createDataFrame(
        [(1, "alpha alpha shared shared shared"),
         (2, "beta shared"),
         (3, "shared gamma gamma")],
        ["doc_id", "text"],
    )
    out = tfidf_top_terms(docs, k=2).collect()
    top = {r["doc_id"]: [x["term"] for x in sorted(
        (q for q in out if q["doc_id"] == r["doc_id"]),
        key=lambda q: q["rnk"])] for r in out}
    # df(shared)=3 -> idf=0: rare terms win despite lower tf
    assert top[1] == ["alpha", "shared"]
    assert top[2] == ["beta", "shared"]
    assert top[3] == ["gamma", "shared"]
    a1 = [r for r in out if r["doc_id"] == 1 and r["term"] == "alpha"][0]
    assert a1["tf"] == 2 and a1["rnk"] == 1 and a1["score"] > 0
    sh = [r for r in out if r["term"] == "shared"][0]
    assert sh["score"] == 0.0
    assert all(r["rnk"] <= 2 for r in out)


def test_host_degree_stats_tiny_graph(spark):
    """Hand graph: self-loops dropped; hubs/authorities/orphan-in hosts
    each get correct distinct-degree and weighted-link sums; every host
    appearing on either side shows up exactly once."""
    from ollama_ocr_spark.operators.linkgraph import host_degree_stats

    edges = spark.createDataFrame(
        [("a", "a", 99),   # self-loop: dropped
         ("a", "b", 2), ("a", "c", 3),
         ("b", "c", 5)],
        ["src_host", "dst_host", "n_links"],
    )
    rows = {r["host"]: r for r in host_degree_stats(edges).collect()}
    assert set(rows) == {"a", "b", "c"}
    a, b, c = rows["a"], rows["b"], rows["c"]
    assert (a["out_deg"], a["out_links"], a["in_deg"], a["in_links"]) == (2, 5, 0, 0)
    assert (b["out_deg"], b["out_links"], b["in_deg"], b["in_links"]) == (1, 5, 1, 2)
    assert (c["out_deg"], c["out_links"], c["in_deg"], c["in_links"]) == (0, 0, 2, 8)


def test_host_reciprocity_tiny_graph(spark):
    """Hand graph: a↔b mutual, a→c unreciprocated, c outlink-less (rate
    NULL via the divide guard), self-loop excluded."""
    from ollama_ocr_spark.operators.linkgraph import host_reciprocity

    edges = spark.createDataFrame(
        [("a", "a", 99),   # self-loop: dropped
         ("a", "b", 2), ("b", "a", 1), ("a", "c", 3)],
        ["src_host", "dst_host", "n_links"],
    )
    rows = {r["host"]: r for r in host_reciprocity(edges).collect()}
    assert set(rows) == {"a", "b", "c"}
    a, b, c = rows["a"], rows["b"], rows["c"]
    assert (a["out_deg"], a["in_deg"], a["mutual"], a["recip_rate"]) == (2, 1, 1, 0.5)
    assert (b["out_deg"], b["in_deg"], b["mutual"], b["recip_rate"]) == (1, 1, 1, 1.0)
    assert (c["out_deg"], c["in_deg"], c["mutual"]) == (0, 1, 0)
    assert c["recip_rate"] is None


def test_host_assortativity_hand_values(spark):
    """5-edge hand graph: moments m=5 sx=7 sy=9 sxx=11 syy=17 sxy=12 →
    r = -3/(sqrt(6)*sqrt(4)) = -0.612372. A pure star (all in-degrees
    equal) has zero y-variance → NULL."""
    from ollama_ocr_spark.operators.linkgraph import host_assortativity

    edges = spark.createDataFrame(
        [("a", "b", 1), ("a", "c", 1), ("b", "a", 1), ("c", "b", 1),
         ("d", "a", 1), ("a", "a", 9)],   # self-loop dropped
        ["src_host", "dst_host", "n_links"],
    )
    r = host_assortativity(edges).collect()[0]
    assert r["n_edges"] == 5
    assert r["assortativity"] == -0.612372

    star = spark.createDataFrame(
        [("a", "b", 1), ("a", "c", 1), ("a", "d", 1), ("b", "a", 1)],
        ["src_host", "dst_host", "n_links"],
    )
    r2 = host_assortativity(star).collect()[0]
    assert r2["n_edges"] == 4
    assert r2["assortativity"] is None


def test_host_seed_distance_relaxation(spark):
    """Chain s->a->b->c->d with a shortcut s->b: hops follow the
    SHORTEST path (b=1 not 2); direction matters (x->s leaves x
    unreached); the y->z island and anything past max_hops stay NULL;
    self-loops and duplicate edges are ignored. A seed absent from the
    graph reaches nothing."""
    from ollama_ocr_spark.operators.linkgraph import host_seed_distance

    edges = spark.createDataFrame(
        [("s", "a", 1), ("a", "b", 1), ("b", "c", 1), ("c", "d", 1),
         ("s", "b", 1), ("x", "s", 1), ("y", "z", 1),
         ("s", "a", 7),            # duplicate pair collapses
         ("s", "s", 9)],           # self-loop dropped
        ["src_host", "dst_host", "n_links"],
    )
    hops = {r["host"]: r["hops"]
            for r in host_seed_distance(edges, ["s"], max_hops=3).collect()}
    assert hops == {"s": 0, "a": 1, "b": 1, "c": 2, "d": 3,
                    "x": None, "y": None, "z": None}

    one = {r["host"]: r["hops"]
           for r in host_seed_distance(edges, ["s"], max_hops=1).collect()}
    assert (one["s"], one["a"], one["b"]) == (0, 1, 1)
    assert one["c"] is None and one["d"] is None

    ghost = host_seed_distance(edges, ["ghost"], max_hops=2).collect()
    assert all(r["hops"] is None for r in ghost)


def test_outlink_similarity_pruning_and_threshold(spark):
    """Mirror pair m1/m2 share {x,y,z,hub}; o shares only {x,hub} with
    them; p links to hub alone, pushing hub's in-degree to 4. With
    max_in_deg=3 the hub leaves the UNIVERSE: degrees shrink with the
    intersections, so the mirrors keep jaccard 1.0 while (m,o) drops
    0.4 -> 0.25 and hub-only p vanishes — the stop-neighbor cut
    sharpens mirror contrast. min_jaccard gates on the unrounded
    quotient; self-loops and duplicate edges are ignored."""
    from ollama_ocr_spark.operators.linkgraph import outlink_similarity

    edges = spark.createDataFrame(
        [("m1", "x", 1), ("m1", "y", 1), ("m1", "z", 1), ("m1", "hub", 1),
         ("m2", "x", 1), ("m2", "y", 1), ("m2", "z", 1), ("m2", "hub", 1),
         ("o", "x", 1), ("o", "q", 1), ("o", "hub", 1),
         ("p", "hub", 1),
         ("o", "x", 7),            # duplicate pair collapses
         ("m1", "m1", 9)],         # self-loop dropped
        ["src_host", "dst_host", "n_links"],
    )
    pruned = {(r["host_a"], r["host_b"]): r
              for r in outlink_similarity(
                  edges, max_in_deg=3, min_jaccard=0.2).collect()}
    assert set(pruned) == {("m1", "m2"), ("m1", "o"), ("m2", "o")}
    mm = pruned[("m1", "m2")]
    assert (mm["shared"], mm["deg_a"], mm["deg_b"], mm["jaccard"]) \
        == (3, 3, 3, 1.0)
    mo = pruned[("m1", "o")]
    assert (mo["shared"], mo["deg_a"], mo["deg_b"], mo["jaccard"]) \
        == (1, 3, 2, 0.25)

    kept = {(r["host_a"], r["host_b"]): r["jaccard"]
            for r in outlink_similarity(
                edges, max_in_deg=100, min_jaccard=0.2).collect()}
    assert kept[("m1", "m2")] == 1.0
    assert kept[("m1", "o")] == 0.4       # hub inflates the overlap
    assert kept[("m1", "p")] == 0.25      # hub-only host only unpruned

    gated = outlink_similarity(edges, max_in_deg=3, min_jaccard=0.3)
    assert [(r["host_a"], r["host_b"]) for r in gated.collect()] \
        == [("m1", "m2")]


def test_bigram_stats_counts_and_pmi(spark):
    """Bigram counts span token runs; PMI separates an always-together
    pair from an independent-ish one; one-token docs contribute nothing."""
    import math

    from ollama_ocr_spark.operators.textstats import bigram_stats

    docs = spark.createDataFrame(
        [(1, "red fox red fox"), (2, "red fox"), (3, "red blue blue"),
         (4, "solo")],
        ["doc_id", "text"],
    )
    rows = {r["bigram"]: r for r in bigram_stats(docs, k=10).collect()}
    assert rows["red fox"]["n_pairs"] == 3
    assert rows["fox red"]["n_pairs"] == 1
    assert rows["red blue"]["n_pairs"] == 1
    assert "solo" not in " ".join(rows)  # no bigram from a 1-token doc
    # n_tokens=10, c(red)=4, c(fox)=3: pmi(red fox)=ln(3*10/12)
    assert rows["red fox"]["pmi"] == round(math.log(3 * 10 / (4 * 3)), 8)
    # pmi(red blue)=ln(1*10/(4*2))
    # the always-together pair scores higher than the one-off
    assert rows["red fox"]["pmi"] > rows["red blue"]["pmi"]


def test_length_histogram_bucket_boundaries(spark):
    """Bit-width bucketing is exact at power-of-two boundaries (the case
    floor(log2(double)) gets wrong): 7->3, 8->4; zero-length rows land in
    bucket 0; per-group sums/min/max aggregate within the bucket."""
    from ollama_ocr_spark.operators.textstats import length_histogram

    docs = spark.createDataFrame(
        [("en", 7), ("en", 8), ("en", 15), ("en", 0), ("de", 1)],
        ["lang", "n_chars"],
    )
    rows = {(r["grp"], r["bucket"]): r for r in length_histogram(docs).collect()}
    assert set(rows) == {("en", 3), ("en", 4), ("en", 0), ("de", 1)}
    b4 = rows[("en", 4)]
    assert (b4["n_docs"], b4["total_chars"], b4["min_chars"], b4["max_chars"]) \
        == (2, 23, 8, 15)
    assert rows[("en", 0)]["n_docs"] == 1
    assert rows[("de", 1)]["total_chars"] == 1


def test_host_topic_labels_chrome_filter_and_rank(spark):
    """Ubiquitous anchors (>50% of hosts) drop as chrome; host-specific
    anchors rank by link count with anchor tiebreak; share is over the
    TOPICAL total only."""
    from ollama_ocr_spark.operators.linkgraph import host_topic_labels

    anchors = spark.createDataFrame(
        [("a.com", "more", 100), ("b.com", "more", 90), ("c.com", "more", 80),
         ("a.com", "rust guides", 6), ("a.com", "crab books", 3),
         ("a.com", "zz niche", 1),
         ("b.com", "cooking", 5)],
        ["dst_host", "anchor", "n_links"],
    )
    rows = {(r["dst_host"], r["rnk"]): r
            for r in host_topic_labels(anchors, k=2).collect()}
    # 'more' hits 3/3 hosts -> chrome; c.com has nothing topical
    assert not any(h == "c.com" for h, _ in rows)
    assert not any(r["anchor"] == "more" for r in rows.values())
    a1, a2 = rows[("a.com", 1)], rows[("a.com", 2)]
    assert (a1["anchor"], a1["n_links"]) == ("rust guides", 6)
    assert a2["anchor"] == "crab books"
    assert a1["share"] == 0.6  # 6 / (6+3+1) topical total, k-cut after
    assert rows[("b.com", 1)]["share"] == 1.0
    assert ("a.com", 3) not in rows  # k=2 cut


def test_host_communities_two_clusters(spark):
    """Two dense triangles bridged by one weak edge: LPA must put each
    triangle in one community and not merge across the w=1 bridge; a
    huge self-loop must be ignored (self-votes freeze hosts into
    singletons); an edge-less host never appears in the output."""
    from ollama_ocr_spark.operators.linkgraph import host_communities

    w = 10
    edges = spark.createDataFrame(
        [("a.com", "b.com", w), ("b.com", "c.com", w), ("a.com", "c.com", w),
         ("x.com", "y.com", w), ("y.com", "z.com", w), ("x.com", "z.com", w),
         ("c.com", "x.com", 1),            # weak bridge
         ("a.com", "a.com", 10_000)],      # self-loop: must be dropped
        ["src_host", "dst_host", "n_links"],
    )
    out = {r["host"]: r["community"]
           for r in host_communities(edges, iterations=4).collect()}
    assert set(out) == {"a.com", "b.com", "c.com", "x.com", "y.com", "z.com"}
    left = {out["a.com"], out["b.com"], out["c.com"]}
    right = {out["x.com"], out["y.com"], out["z.com"]}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_host_communities_deterministic(spark):
    """Same input -> identical labeling across independent runs (the
    parity schedule and argmax tiebreak leave no nondeterminism)."""
    from ollama_ocr_spark.operators.linkgraph import host_communities

    edges = spark.createDataFrame(
        [("h%d.com" % i, "h%d.com" % ((i * 3 + 1) % 7), 1 + i % 4)
         for i in range(14)],
        ["src_host", "dst_host", "n_links"],
    )
    r1 = sorted(map(tuple, host_communities(edges).collect()))
    r2 = sorted(map(tuple, host_communities(edges).collect()))
    assert r1 == r2


def test_community_quarantine_pooling_both_ways(spark):
    """Pooled evidence overrides thin per-host verdicts in BOTH
    directions: a good host inside a bad community is quarantined with
    it; an edge-less host (absent from labels) falls back to itself and
    the host rule; below the host evidence floor nothing fires."""
    from ollama_ocr_spark.operators.linkgraph import community_quarantine

    labels = spark.createDataFrame(
        [("a.com", "X"), ("b.com", "X"), ("s1.junk", "S"), ("s2.junk", "S")],
        ["host", "community"],
    )
    quality = spark.createDataFrame(
        [("a.com", 10, 9),     # individually fine...
         ("b.com", 12, 3),     # ...but the pool is rotten
         ("s1.junk", 4, 0), ("s2.junk", 4, 0),
         ("lone.junk", 5, 1),  # no edges -> singleton, host basis
         ("tiny.shop", 3, 3)], # under the host evidence floor
        ["host", "n_docs", "n_ok"],
    )
    out = {r["host"]: r for r in community_quarantine(
        labels, quality, min_comm_docs=8).collect()}
    assert out["a.com"]["verdict_basis"] == "community"
    assert out["a.com"]["quarantined"]          # guilt by association
    assert out["a.com"]["comm_n_docs"] == 22
    assert out["b.com"]["quarantined"]
    assert out["s1.junk"]["quarantined"] and out["s2.junk"]["quarantined"]
    assert out["lone.junk"]["community"] == "lone.junk"
    assert out["lone.junk"]["verdict_basis"] == "host"
    assert out["lone.junk"]["quarantined"]
    assert out["tiny.shop"]["verdict_basis"] == "host"
    assert not out["tiny.shop"]["quarantined"]
    assert out["a.com"]["comm_rate"] == round(12 / 22.0, 4)


def test_community_budget_zeroes_quarantined(spark):
    """Quarantined communities get zero budget and their mass flows
    pro-rata to clean communities (integer div); hosts missing from the
    url table count as zero urls; an all-quarantined input allocates
    nothing rather than dividing by zero."""
    from ollama_ocr_spark.operators.linkgraph import community_budget

    quar = spark.createDataFrame(
        [("a.com", "X", False), ("b.com", "X", False),
         ("s1.junk", "S", True), ("s2.junk", "S", True)],
        ["host", "community", "quarantined"],
    )
    urls = spark.createDataFrame(
        [("a.com", 60), ("s1.junk", 500), ("s2.junk", 500)],
        ["host", "n_urls"],
    )  # b.com absent -> 0 urls
    out = {r["community"]: r
           for r in community_budget(quar, urls, total_budget=1000).collect()}
    assert out["S"]["quarantined"] and out["S"]["weight"] == 0
    assert out["S"]["budget"] == 0 and out["S"]["n_urls"] == 1000
    assert out["X"]["n_hosts"] == 2 and out["X"]["n_urls"] == 60
    assert out["X"]["budget"] == 1000        # all mass reflows to X

    allq = quar.withColumn("quarantined", quar.quarantined | True)
    out2 = community_budget(allq, urls, total_budget=1000).collect()
    assert all(r["budget"] == 0 for r in out2)


def test_outlink_similarity_plan_equi_joins_only(spark):
    """The pair stage is the equi-join form on dst_host (the
    cap-or-equi-join rule) — no cartesian/nested-loop node anywhere,
    and every branch runs over the checkpointed host-level edge list,
    never a corpus scan."""
    from ollama_ocr_spark.operators.linkgraph import outlink_similarity

    edges = spark.createDataFrame(
        [("m1", "x", 1), ("m1", "y", 1), ("m2", "x", 1),
         ("m2", "y", 1), ("o", "x", 1)],
        ["src_host", "dst_host", "n_links"],
    )
    plan = (outlink_similarity(edges)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
