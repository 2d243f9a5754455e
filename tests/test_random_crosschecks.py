"""Seeded-random cross-checks: each new graph/events operator run once
over a deterministic pseudo-random instance and compared against an
independent pure-Python reference implementation (the cdc_chunks
pin-against-reimplementation pattern — one Spark run per test, not a
hypothesis loop, so the suite stays fast)."""

from __future__ import annotations

import math
import random
from collections import Counter, defaultdict


def _random_digraph(seed: int, n_hosts: int = 36, n_edges: int = 150):
    rng = random.Random(seed)
    hosts = [f"n{i}" for i in range(n_hosts)]
    edges = set()
    while len(edges) < n_edges:
        edges.add((rng.choice(hosts), rng.choice(hosts)))
    return [(s, d, rng.randint(1, 5)) for s, d in sorted(edges)]


def test_host_seed_distance_matches_python_bfs(spark):
    """BFS relaxation over a 36-node random digraph equals a textbook
    frontier BFS, including unreached-within-max_hops NULLs."""
    from ollama_ocr_spark.operators.linkgraph import host_seed_distance

    rows = _random_digraph(1234)
    seeds, max_hops = ["n0", "n7"], 3
    adj = defaultdict(set)
    nodes = set()
    for s, d, _ in rows:
        nodes.update((s, d))
        if s != d:
            adj[s].add(d)
    want: dict[str, int | None] = {h: None for h in nodes}
    frontier = [s for s in seeds if s in nodes]
    for s in frontier:
        want[s] = 0
    for hop in range(1, max_hops + 1):
        nxt = []
        for s in frontier:
            for d in adj[s]:
                if want[d] is None:
                    want[d] = hop
                    nxt.append(d)
        frontier = nxt

    df = spark.createDataFrame(rows, ["src_host", "dst_host", "n_links"])
    got = {r["host"]: r["hops"]
           for r in host_seed_distance(df, seeds, max_hops).collect()}
    assert got == want


def test_outlink_similarity_matches_python_sets(spark):
    """Capped outlink Jaccard over a random digraph equals the plain
    set computation over the hub-pruned universe."""
    from ollama_ocr_spark.operators.linkgraph import outlink_similarity

    rows = _random_digraph(99, n_hosts=24, n_edges=130)
    max_in_deg, min_j = 6, 0.2
    out = defaultdict(set)
    indeg = Counter()
    for s, d, _ in rows:
        if s != d and d not in out[s]:
            out[s].add(d)
            indeg[d] += 1
    kept = {d for d, c in indeg.items() if c <= max_in_deg}
    pruned = {s: ds & kept for s, ds in out.items()}
    want = {}
    hosts = sorted(pruned)
    for i, a in enumerate(hosts):
        for b in hosts[i + 1:]:
            shared = len(pruned[a] & pruned[b])
            if not shared:
                continue
            j = shared * 1.0 / (len(pruned[a]) + len(pruned[b]) - shared)
            if j >= min_j:
                want[(a, b)] = (shared, len(pruned[a]), len(pruned[b]),
                                round(j, 4))

    df = spark.createDataFrame(rows, ["src_host", "dst_host", "n_links"])
    got = {(r["host_a"], r["host_b"]):
           (r["shared"], r["deg_a"], r["deg_b"], r["jaccard"])
           for r in outlink_similarity(df, max_in_deg, min_j).collect()}
    assert got == want and len(got) > 3


def _random_events(seed: int, n: int = 240, n_users: int = 9,
                   n_types: int = 4):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append((rng.randrange(n_users), i,
                     f"t{rng.randrange(n_types)}",
                     rng.randrange(40) * 1_000_000 + rng.randrange(3)))
    return rows  # coarse ts grid + tiny jitter -> plenty of exact ties


def test_events_family_matches_python_fold(spark):
    """transitions / entropy / dwell over one random event log (with
    exact-timestamp ties) all agree with a pure-Python fold over the
    (ts_us, event_id)-sorted streams; entropy compares to 5e-6 (the
    reference uses plain floats, the engine the decimal-exact path)."""
    from ollama_ocr_spark.operators.reports import (
        event_transitions,
        state_dwell_stats,
        user_transition_entropy,
    )

    rows = _random_events(7)
    streams = defaultdict(list)
    for u, eid, t, ts in rows:
        streams[u].append((ts, eid, t))
    pair_counts = Counter()
    dwell = defaultdict(lambda: [0, 0])   # from_type -> [n, total_s]
    per_user = defaultdict(Counter)
    for u, ev in streams.items():
        ev.sort()
        for (ts1, _, t1), (ts2, _, t2) in zip(ev, ev[1:]):
            pair_counts[(t1, t2)] += 1
            per_user[u][(t1, t2)] += 1
            dwell[t1][0] += 1
            dwell[t1][1] += (ts2 - ts1) // 1_000_000

    df = spark.createDataFrame(
        rows, ["user_id", "event_id", "event_type", "ts_us"])

    got_pairs = {(r["from_type"], r["to_type"]): r["n_transitions"]
                 for r in event_transitions(df).collect()}
    assert got_pairs == dict(pair_counts)

    got_dwell = {r["from_type"]: (r["n_transitions"], r["total_dwell_s"])
                 for r in state_dwell_stats(df).collect()}
    assert got_dwell == {t: tuple(v) for t, v in dwell.items()}

    got_h = {r["user_id"]: r for r in user_transition_entropy(df).collect()}
    assert set(got_h) == set(per_user)
    for u, cnts in per_user.items():
        n = sum(cnts.values())
        ref = -sum((c / n) * math.log(c / n) for c in cnts.values())
        r = got_h[u]
        assert (r["n_transitions"], r["n_pairs"]) == (n, len(cnts))
        assert abs(r["entropy"] - ref) < 5e-6
        assert 0.0 <= r["entropy"] <= math.log(len(cnts)) + 1e-9


def test_host_kcore_matches_python_peel(spark):
    """Fixed-round k-core peeling over a random digraph equals the
    textbook set-based peel: same removal rounds, same residual core
    degrees (all-integer operator, exact compare)."""
    from ollama_ocr_spark.operators.linkgraph import host_kcore

    rows = _random_digraph(4321, n_hosts=30, n_edges=170)
    k, rounds = 5, 3
    und = {(min(s, d), max(s, d)) for s, d, _ in rows if s != d}
    alive = {h for e in und for h in e}
    live = set(und)
    removed: dict[str, int] = {}
    for i in range(1, rounds + 1):
        deg = Counter()
        for u, v in live:
            deg[u] += 1
            deg[v] += 1
        drop = {h for h in alive if deg[h] < k}
        for h in drop:
            removed[h] = i
        alive -= drop
        live = {(u, v) for u, v in live if u in alive and v in alive}
    fdeg = Counter()
    for u, v in live:
        fdeg[u] += 1
        fdeg[v] += 1
    want = {h: (removed.get(h), None if h in removed else fdeg[h])
            for h in {x for e in und for x in e}}

    df = spark.createDataFrame(rows, ["src_host", "dst_host", "n_links"])
    got = {r["host"]: (r["removed_round"], r["core_deg"])
           for r in host_kcore(df, k=k, rounds=rounds).collect()}
    assert got == want


def test_host_hits_matches_python_power(spark):
    """Max-normalized HITS over a random digraph tracks the plain
    Python power iteration to within one 6dp ulp (per-host sums are
    degree-bounded; engine and Python fold orders may differ in the
    last double ulp, the same tolerance contract the oracle's 6dp
    round encodes)."""
    from ollama_ocr_spark.operators.linkgraph import host_hits

    rows = _random_digraph(777, n_hosts=28, n_edges=140)
    iters = 2
    ce = {(s, d) for s, d, _ in rows if s != d}
    hosts = sorted({h for e in ce for h in e})
    a = {h: 1.0 for h in hosts}
    h = {}
    for _ in range(iters):
        h = {x: sum(a[d] for s, d in ce if s == x) for x in hosts}
        m = max(h.values())
        h = {x: (v / m if m > 0 else 0.0) for x, v in h.items()}
        a = {x: sum(h[s] for s, d in ce if d == x) for x in hosts}
        m = max(a.values())
        a = {x: (v / m if m > 0 else 0.0) for x, v in a.items()}

    df = spark.createDataFrame(rows, ["src_host", "dst_host", "n_links"])
    got = {r["host"]: (r["hub"], r["authority"])
           for r in host_hits(df, iterations=iters).collect()}
    assert set(got) == set(hosts)
    for x in hosts:
        assert abs(got[x][0] - round(h[x], 6)) <= 2e-6, x
        assert abs(got[x][1] - round(a[x], 6)) <= 2e-6, x


def test_interevent_histogram_buckets(spark):
    """Hand-built gap streams land in the documented [2^(b-1), 2^b)
    buckets; gaps pool per (user, type) so interleaved users never
    cross-contaminate; sub-second gaps floor to the {0,1} bucket."""
    from ollama_ocr_spark.operators.reports import interevent_histogram

    us = 1_000_000
    rows = [
        # u1/click: gaps 1s, 3s, 500ms(->0s)
        ("u1", 1, "click", 0 * us),
        ("u1", 2, "click", 1 * us),
        ("u1", 3, "click", 4 * us),
        ("u1", 4, "click", 4 * us + us // 2),
        # u2/click: one 1024s gap (bucket 11 = [1024, 2048))
        ("u2", 5, "click", 0 * us),
        ("u2", 6, "click", 1024 * us),
        # u1/view: single event, no gap
        ("u1", 7, "view", 0 * us),
    ]
    df = spark.createDataFrame(
        rows, ["user_id", "event_id", "event_type", "ts_us"])
    got = {(r["event_type"], r["bucket"]):
           (r["bucket_lo_s"], r["bucket_hi_s"], r["n_gaps"])
           for r in interevent_histogram(df).collect()}
    assert got == {
        ("click", 1): (0, 2, 2),   # 0s and 1s gaps
        ("click", 2): (2, 4, 1),   # 3s gap
        ("click", 11): (1024, 2048, 1),
    }


def test_heaps_law_matches_python(spark):
    """Checkpoint doc/token/vocab counts over an id-ordered synthetic
    corpus equal the plain prefix computation; beta matches the Python
    OLS on the same 8dp-quantized ln points to 4dp tolerance."""
    from ollama_ocr_spark.operators.textstats import heaps_law

    rng = random.Random(31337)
    vocab = [f"w{i}" for i in range(120)]
    docs = []
    for i in range(40):
        # growing vocabulary exposure: doc i samples from a prefix
        pool = vocab[: 12 + 3 * i % len(vocab)] if i else vocab[:12]
        docs.append((i, " ".join(rng.choice(pool) for _ in range(30))))
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    m = max(i for i, _ in docs)
    want = {}
    for i in range(1, 11):
        c = ((m + 1) * i) // 10
        pre = [(d, t) for d, t in docs if d < c]
        toks = [w for _, t in pre for w in t.split()]
        want[(i * 100) // 10] = (len(pre), len(toks),
                                 len({w for w in toks}))
    xs = [round(math.log(v[1]), 8) for v in want.values()]
    ys = [round(math.log(v[2]), 8) for v in want.values()]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    beta_want = (n * sxy - sx * sy) / (n * sxx - sx * sx)

    out = heaps_law(df).collect()
    got = {r["pct"]: (r["n_docs"], r["cum_tokens"], r["cum_vocab"])
           for r in out}
    assert got == want
    betas = {r["beta"] for r in out}
    assert len(betas) == 1
    assert abs(betas.pop() - beta_want) < 5e-4


def test_source_token_kl_matches_python(spark):
    """Per-source KL over a random two-source corpus equals the plain
    Python computation on the same 8dp-quantized ln terms (integer
    counts exact; 6dp output tolerance covers the decimal-vs-float
    sum difference)."""
    from ollama_ocr_spark.operators.textstats import source_token_kl

    rng = random.Random(2024)
    vocab_a = [f"w{i}" for i in range(15)]
    vocab_b = [f"w{i}" for i in range(8, 25)]  # overlapping, shifted
    docs = []
    for i in range(30):
        pool = vocab_a if i % 2 == 0 else vocab_b
        docs.append((i, "s_even" if i % 2 == 0 else "s_odd",
                     " ".join(rng.choice(pool) for _ in range(25))))
    df = spark.createDataFrame(docs, ["doc_id", "source", "text"])

    sc = Counter()
    for _, s, t in docs:
        for w in t.split():
            sc[(s, w)] += 1
    n_s = Counter()
    cw = Counter()
    for (s, w), c in sc.items():
        n_s[s] += c
        cw[w] += c
    nn = sum(n_s.values())
    want = {}
    for s in n_s:
        sm = sum(
            c * (round(math.log(c / n_s[s]), 8)
                 - round(math.log(cw[w] / nn), 8))
            for (s2, w), c in sc.items() if s2 == s
        )
        vocab = sum(1 for (s2, _) in sc if s2 == s)
        want[s] = (n_s[s], vocab, sm / n_s[s])

    got = {r["source"]: (r["n_tokens"], r["vocab"], r["kl_nats"])
           for r in source_token_kl(df).collect()}
    assert set(got) == set(want)
    for s in want:
        assert got[s][:2] == want[s][:2], s
        assert abs(got[s][2] - want[s][2]) < 5e-6, s
        assert got[s][2] > 0, s  # shifted vocabularies genuinely diverge


def test_tpch_q5_plan_broadcasts_dims(spark):
    """Q5's region→nation→customer dim chain broadcasts; the fact-side
    joins stay hash/sort-merge — no nested-loop anywhere."""
    import __spark_entry__ as e

    df = e.queries()["tpch_local_supplier_revenue"](
        spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_event_cooccurrence_matches_python(spark):
    """Type-pair lift over a random event log equals the plain Python
    set computation (integer counts exact; lift to 6dp)."""
    from ollama_ocr_spark.operators.reports import event_cooccurrence

    rng = random.Random(555)
    types = ["a", "b", "c", "d", "e"]
    rows = []
    eid = 0
    for u in range(25):
        for _ in range(rng.randint(1, 8)):
            eid += 1
            rows.append((u, eid, rng.choice(types), eid * 1000))
    df = spark.createDataFrame(
        rows, ["user_id", "event_id", "event_type", "ts_us"])

    per_user = defaultdict(set)
    for u, _, t, _ in rows:
        per_user[u].add(t)
    n_users = len(per_user)
    nt = Counter()
    for ts in per_user.values():
        nt.update(ts)
    both = Counter()
    for ts in per_user.values():
        s = sorted(ts)
        for i, x in enumerate(s):
            for y in s[i + 1:]:
                both[(x, y)] += 1
    want = {
        (x, y): (nt[x], nt[y], c, round(c * n_users / (nt[x] * nt[y]), 6))
        for (x, y), c in both.items()
    }
    got = {(r["type_a"], r["type_b"]):
           (r["n_a"], r["n_b"], r["n_both"], r["lift"])
           for r in event_cooccurrence(df).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][:3] == want[k][:3], k
        assert abs(got[k][3] - want[k][3]) < 2e-6, k


def test_host_pagerank_delta_composite(spark, documents_smoke):
    """The delta composite equals two independent fixed-iteration runs
    joined on host, with non-negative 6dp deltas."""
    import __spark_entry__ as e
    from ollama_ocr_spark.operators.extract import synthesize_stage
    from ollama_ocr_spark.operators.linkgraph import (host_pagerank,
                                                      outlink_edges)
    from ollama_ocr_spark.operators.maintenance import latest_capture

    edges = outlink_edges(latest_capture(synthesize_stage(documents_smoke)))
    r2 = {r["host"]: r["rank"]
          for r in host_pagerank(edges, iterations=2).collect()}
    r3 = {r["host"]: r["rank"]
          for r in host_pagerank(edges, iterations=3).collect()}
    got = {r["host"]: (r["rank_i2"], r["rank_i3"], r["delta"])
           for r in e.queries()["host_pagerank_delta"](
               spark, "/root/testdata/sf0.001").collect()}
    assert set(got) == set(r2) == set(r3)
    for h, (a, b, d) in got.items():
        assert a == r2[h] and b == r3[h], h
        assert d >= 0
        assert abs(d - abs(b - a)) < 2e-6, h
