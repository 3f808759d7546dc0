"""PageRank (operators/graph.py): agreement with a naive driver-side
power iteration, partition invariance, and the rank-mass invariant."""

from __future__ import annotations

import random
import sys

import pytest

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from lightning_metastore_spark.operators.graph import pagerank  # noqa: E402


def _naive_pagerank(edge_list, n_iter=3, damping=0.85):
    """Reference implementation: pure-Python synchronous power
    iteration over the symmetrized simple graph."""
    adj: dict[int, set[int]] = {}
    for a, b in edge_list:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        incoming = {v: 0.0 for v in nodes}
        for u in nodes:
            share = rank[u] / len(adj[u])
            for v in adj[u]:
                incoming[v] += share
        rank = {v: (1.0 - damping) / n + damping * incoming[v]
                for v in nodes}
    return rank


def _random_edges(seed, n_nodes=40, n_edges=90):
    rng = random.Random(seed)
    edges = set()
    while len(edges) < n_edges:
        a, b = rng.randrange(n_nodes), rng.randrange(n_nodes)
        if a != b:
            edges.add((min(a, b), max(a, b)))
    return sorted(edges)


@pytest.mark.parametrize("seed", [7, 21])
def test_pagerank_matches_naive(spark, seed):
    edges = _random_edges(seed)
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"]
           for r in pagerank(df, n_iter=3).collect()}
    want = _naive_pagerank(edges, n_iter=3)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_pagerank_partition_invariant(spark):
    edges = _random_edges(3, n_nodes=60, n_edges=150)
    df = spark.createDataFrame(edges, "src long, dst long")
    a = sorted((r["node"], r["rank"])
               for r in pagerank(df, n_iter=3).collect())
    b = sorted((r["node"], r["rank"])
               for r in pagerank(df.repartition(17), n_iter=3).collect())
    assert a == b  # bit-identical: decimal-summed contributions


def test_pagerank_mass_conserved_and_hub_ranks_highest(spark):
    # star graph: hub 0 <-> spokes 1..9, plus a detached 2-clique
    edges = [(0, i) for i in range(1, 10)] + [(100, 101)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = pagerank(df, n_iter=5, persist_every=2).collect()
    total = sum(r["rank"] for r in rows)
    assert total == pytest.approx(1.0, abs=1e-9)  # no dangling mass lost
    ranks = {r["node"]: r["rank"] for r in rows}
    assert ranks[0] == max(ranks.values())
    assert ranks[100] == pytest.approx(ranks[101], abs=1e-15)


def test_triangle_counts_known_graph(spark):
    from lightning_metastore_spark.operators.graph import triangle_counts

    # K4 on {0,1,2,3} (4 triangles, each node in 3), a star 10-(11,12,13)
    # (no triangles), plus a lone extra triangle 20-21-22
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    star = [(10, 11), (10, 12), (10, 13)]
    tri = [(20, 21), (21, 22), (20, 22)]
    df = spark.createDataFrame(k4 + star + tri, "src long, dst long")
    out = {r.node: r for r in triangle_counts(df).collect()}
    for v in range(4):
        assert (out[v].degree, out[v].n_triangles) == (3, 3)
        assert out[v].clustering == 1.0
    assert (out[10].degree, out[10].n_triangles) == (3, 0)
    assert out[10].clustering == 0.0
    assert out[11].clustering is None          # degree 1
    for v in (20, 21, 22):
        assert (out[v].n_triangles, out[v].clustering) == (1, 1.0)


def test_triangle_counts_matches_naive(spark):
    from itertools import combinations

    from lightning_metastore_spark.operators.graph import triangle_counts

    edges = _random_edges(13, n_nodes=30, n_edges=80)
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {v: sum(1 for x, y in combinations(sorted(adj[v]), 2)
                   if y in adj.get(x, ()))
            for v in adj}
    got = {r.node: r.n_triangles for r in triangle_counts(
        spark.createDataFrame(edges, "src long, dst long")).collect()}
    assert got == want


def test_pagerank_directed_with_dangling(spark):
    """symmetrize=False: true directed semantics — sink mass
    redistributed, source-only and sink nodes all ranked."""
    from collections import defaultdict

    edges = [(1, 2), (1, 3), (3, 2), (4, 1)]  # 2 is a sink, 4 a source
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"]
           for r in pagerank(df, n_iter=4, symmetrize=False).collect()}

    out = defaultdict(list)
    nodes = sorted({n for e in edges for n in e})
    for a, b in edges:
        out[a].append(b)
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(4):
        incoming = {v: 0.0 for v in nodes}
        for u in nodes:
            for v in out.get(u, ()):
                incoming[v] += rank[u] / len(out[u])
        dang = sum(rank[u] for u in nodes if not out.get(u))
        rank = {v: 0.15000000000000002 / n
                + 0.85 * (incoming[v] + dang / n) for v in nodes}
    assert set(got) == set(nodes)
    for v in nodes:
        assert got[v] == pytest.approx(rank[v], abs=1e-12), v
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got[2] == max(got.values())   # the sink everybody points at


def test_label_propagation_separates_dense_families(spark):
    from lightning_metastore_spark.operators.graph import label_propagation

    # two 4-cliques joined by ONE bridge edge: CC sees one component,
    # LPA separates the two dense families
    c1 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    c2 = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    bridge = [(3, 10)]
    df = spark.createDataFrame(c1 + c2 + bridge, "src long, dst long")
    out = {r.node: r.community
           for r in label_propagation(df, n_iter=5).collect()}
    assert len({out[v] for v in range(4)}) == 1
    assert len({out[v] for v in range(10, 14)}) == 1
    assert out[0] != out[10]


def test_label_propagation_matches_naive(spark):
    from collections import Counter, defaultdict

    from lightning_metastore_spark.operators.graph import label_propagation

    edges = _random_edges(29, n_nodes=25, n_edges=60)
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    lab = {v: v for v in adj}
    for _ in range(4):
        nxt = {}
        for v in adj:
            c = Counter(lab[u] for u in adj[v])
            best = min(c, key=lambda l: (-c[l], l))
            nxt[v] = best
        lab = nxt
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.community
           for r in label_propagation(df, n_iter=4).collect()}
    assert got == lab


def test_label_propagation_persist_every_bounds_plan_depth(spark):
    """Deep LPA with persist_every: results identical to the composed
    plan, and lineage is truly truncated — the final plan's join count
    stops growing with n_iter (localCheckpoint resets the logical
    plan, which .persist() alone would not)."""
    from lightning_metastore_spark.operators.graph import label_propagation

    edges = _random_edges(31, n_nodes=30, n_edges=70)
    df = spark.createDataFrame(edges, "src long, dst long")

    plain = {r.node: r.community
             for r in label_propagation(df, n_iter=8).collect()}
    ckpt8 = label_propagation(df, n_iter=8, persist_every=2)
    got = {r.node: r.community for r in ckpt8.collect()}
    assert got == plain

    def joins(d):
        return (d._jdf.queryExecution().optimizedPlan().toString()
                .count("Join"))

    # with persist_every=2 the un-checkpointed tail is <= 2 rounds for
    # ANY n_iter: 6-, 8- and 12-round runs all leave the same plan
    ckpt6 = label_propagation(df, n_iter=6, persist_every=2)
    ckpt12 = label_propagation(df, n_iter=12, persist_every=2)
    assert joins(ckpt8) == joins(ckpt6) == joins(ckpt12)
    # ...while the composed plan keeps one join per round
    assert joins(label_propagation(df, n_iter=8)) > joins(ckpt8)
