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
