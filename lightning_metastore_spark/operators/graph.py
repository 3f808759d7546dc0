"""Distributed graph analytics over duplicate-pair / link graphs.

PageRank by synchronous power iteration, expressed as iterated
DataFrame joins — the textbook scalable shape (cf. the PageRank
example shipped with Apache Spark, `examples/src/main/python/
pagerank.py`, re-expressed on DataFrames): each iteration is ONE
shuffle join of the rank vector with the edge list on the source id
plus ONE aggregation on the destination id. No driver-side state
beyond loop control; the rank vector never leaves the cluster.

Determinism discipline (shared with the rest of the repo — see
functions/text.py word-entropy): per-edge contributions are computed
in IEEE doubles (deterministic scalar math), then cast to
DECIMAL(28,15) before the SUM so the aggregate is exact and
partition-order independent; the decimal total is cast back to double
for the damping blend. This makes the whole iteration bit-stable under
any partitioning, which the DuckDB oracle twin relies on.

Scale notes (100 TB / 1000-executor shapes):
- Each iteration shuffles the edge list once on ``src`` and the
  contribution stream once on ``dst`` — O(E) per iteration, the same
  cost profile as one groupBy. Degrees are computed once up front.
- ``persist_every`` truncates lineage: without it, k iterations build
  a 2k-join plan that Catalyst must re-analyze each action and that
  re-executes from the scan on failure — and the dangling-mass scalar
  references the rank vector a second time, so the UNPERSISTED rank
  tree doubles per iteration. For k <= ~4 the composed plan is fine
  (gate default); for deep iteration pass persist_every=2.
- Skewed hubs (celebrity nodes) concentrate one reduce key per hot
  destination; AQE skew-join handles the join side, and the decimal
  SUM is a plain hash aggregate with map-side partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(28,15)"


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             n_iter: int = 3, damping: float = 0.85,
             symmetrize: bool = True,
             persist_every: int | None = None) -> DataFrame:
    """PageRank over ``edges`` -> (node, rank).

    ``symmetrize=True`` treats the edge list as undirected (the
    duplicate-pair graph case: pairs arrive as id_a < id_b once) and
    unions the reversed edges; duplicate edges are dropped so each
    neighbor contributes once. ``symmetrize=False`` runs true directed
    PageRank: nodes are BOTH endpoints, sink nodes' (out-degree 0)
    mass is redistributed uniformly each step (the standard dangling
    correction — one decimal-summed scalar aggregate, broadcast back).
    Isolated vertices (no edges at all) are not ranked; union them in
    afterwards at the teleport-only rank if needed.

    Ranks are initialized uniform (1/N) and iterated ``r'(v) =
    (1-d)/N + d * (sum_{u->v} r(u)/deg(u) + dangling/N)`` for
    ``n_iter`` synchronous steps; total mass stays 1 at every step
    (tested for both modes).
    """
    e = edges.select(F.col(src).cast("long").alias("src"),
                     F.col(dst).cast("long").alias("dst"))
    if symmetrize:
        e = e.union(e.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst")))
    e = e.distinct()

    from lightning_metastore_spark.operators._cache import persist_slot

    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # degree rides on the edge list so each iteration pays exactly ONE
    # join; the (src, dst, deg) relation is iteration-invariant, so
    # persist it once instead of recomputing union+distinct+degree in
    # every iteration's lineage (single-slot: the next pagerank call
    # releases this call's cache — no per-call CacheManager leak)
    ed = persist_slot("pagerank.edges", e.join(deg, "src"))

    nodes = persist_slot(
        "pagerank.nodes",
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node"))).distinct()
        .join(deg.withColumnRenamed("src", "node"), "node", "left")
        .select("node", F.coalesce("deg", F.lit(0)).alias("out_deg")))
    # one small aggregate, broadcast everywhere the scalar N is needed —
    # keeps the whole computation declarative (no driver .count() action)
    n_df = nodes.agg(F.count("*").alias("n_nodes"))

    ranks = (nodes.crossJoin(F.broadcast(n_df))
             .select("node", "out_deg",
                     (F.lit(1.0) / F.col("n_nodes").cast("double"))
                     .alias("rank")))

    teleport_num = F.lit(1.0) - F.lit(float(damping))  # IEEE 1.0 - d
    for i in range(n_iter):
        contribs = (ed.join(ranks.withColumnRenamed("node", "src"), "src")
                    .select(F.col("dst").alias("node"),
                            (F.col("rank") / F.col("deg").cast("double"))
                            .cast(_DEC).alias("contrib")))
        summed = (contribs.groupBy("node")
                  .agg(F.sum("contrib").cast("double").alias("in_rank")))
        if symmetrize:
            # a symmetric graph has no sinks and every node has
            # in-edges: skip the dangling machinery entirely — it would
            # reference the rank tree a second time (doubling the
            # un-persisted plan per iteration) to add an exact 0.0
            ranks = (summed.crossJoin(F.broadcast(n_df))
                     .select("node", F.lit(1).alias("out_deg"),
                             (teleport_num / F.col("n_nodes").cast("double")
                              + F.lit(float(damping)) * F.col("in_rank"))
                             .alias("rank")))
        else:
            # dangling (sink) mass, redistributed uniformly
            dangling = (ranks.filter(F.col("out_deg") == 0)
                        .agg(F.coalesce(F.sum(F.col("rank").cast(_DEC))
                                        .cast("double"), F.lit(0.0))
                             .alias("dangling")))
            # nodes without in-edges still get teleport + dangling share
            ranks = (nodes.join(summed, "node", "left")
                     .crossJoin(F.broadcast(n_df))
                     .crossJoin(F.broadcast(dangling))
                     .select("node", "out_deg",
                             (teleport_num / F.col("n_nodes").cast("double")
                              + F.lit(float(damping))
                              * (F.coalesce("in_rank", F.lit(0.0))
                                 + F.col("dangling")
                                 / F.col("n_nodes").cast("double")))
                             .alias("rank")))
        if persist_every and (i + 1) % persist_every == 0 and i + 1 < n_iter:
            ranks = ranks.persist()
    return ranks.select("node", "rank")


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst",
                    symmetrize: bool = True) -> DataFrame:
    """Per-node triangle participation + local clustering coefficient:
    (node, degree, n_triangles, clustering) — the duplicate-graph
    cohesion probe (template families form near-cliques — high
    clustering; chance collisions form stars — zero clustering).

    The standard distributed formulation: orient every edge low->high
    (each triangle a<b<c is then generated exactly once as the wedge
    a->b, b->c closed by a->c), ONE self-join on the wedge midpoint and
    ONE membership join against the oriented edge list — never an
    all-pairs step. clustering = 2*T / (deg*(deg-1)), NULL for
    degree<2 nodes.
    """
    e = edges.select(F.col(src).cast("long").alias("src"),
                     F.col(dst).cast("long").alias("dst"))
    if symmetrize:
        e = e.union(e.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst")))
    e = e.filter(F.col("src") != F.col("dst")).distinct()
    deg = e.groupBy(F.col("src").alias("node")) \
           .agg(F.count("*").alias("degree"))
    lo = (e.filter(F.col("src") < F.col("dst")))  # oriented, each edge once
    ab = lo.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = lo.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = lo.select(F.col("src").alias("a"), F.col("dst").alias("c"),
                   F.lit(1).alias("_closed"))
    tri = (ab.join(bc, "b")                      # wedges a<b<c
           .join(ac, ["a", "c"])                 # closed by a->c
           .select("a", "b", "c"))
    per_node = (tri.selectExpr("a AS node")
                .union(tri.selectExpr("b AS node"))
                .union(tri.selectExpr("c AS node"))
                .groupBy("node")
                .agg(F.count("*").alias("n_triangles")))
    cc = (F.lit(2.0) * F.col("n_triangles")
          / (F.col("degree") * (F.col("degree") - F.lit(1))))
    return (deg.join(per_node, "node", "left")
            .select("node", F.col("degree").cast("long").alias("degree"),
                    F.coalesce("n_triangles", F.lit(0)).cast("long")
                    .alias("n_triangles"),
                    F.when(F.col("degree") >= 2,
                           F.round(F.coalesce(cc, F.lit(0.0)), 6))
                    .alias("clustering")))


def label_propagation(edges: DataFrame, src: str = "src", dst: str = "dst",
                      n_iter: int = 5, symmetrize: bool = True,
                      persist_every: int | None = None) -> DataFrame:
    """Community detection by synchronous label propagation (LPA):
    (node, community). Labels start as node ids; each round every node
    adopts the most frequent label among its neighbors, ties broken by
    the SMALLEST label — fully deterministic, the same rule the naive
    twin replays.

    Connected components (operators/dedup.py) answers "what is
    transitively linked"; LPA answers the finer "which densely-linked
    sub-family inside a component" — template families inside a big
    weakly-joined dup cluster.

    Scale shape: per round ONE join of the label vector with the edge
    list + one (node, label) count agg + one argmax agg — all keyed by
    node id, the PageRank cost profile. Synchronous updates may
    oscillate on bipartite-ish structures, so the round count is
    bounded by ``n_iter`` (communities stabilize in a few rounds on
    near-dup graphs).

    ``persist_every`` bounds plan depth for deep iteration (the same
    contract as ``pagerank(persist_every=)``): every k rounds the
    label vector is locally checkpointed, so the lineage Catalyst
    must re-analyze per action stays at <= k rounds of joins instead
    of growing by 2 joins + 2 aggs per round. localCheckpoint (not
    persist) because only a checkpoint truncates the LOGICAL plan —
    a cached tree still carries its full lineage through analysis.
    Default None keeps the composed plan (fine for n_iter <= ~5);
    pass persist_every=2-3 when iterating to stabilization.
    """
    from lightning_metastore_spark.operators._cache import persist_slot

    e = edges.select(F.col(src).cast("long").alias("src"),
                     F.col(dst).cast("long").alias("dst"))
    if symmetrize:
        e = e.union(e.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst")))
    e = persist_slot("lpa.edges", e.filter(F.col("src") != F.col("dst"))
                     .distinct())
    labels = (e.select(F.col("src").alias("node")).distinct()
              .withColumn("community", F.col("node")))
    for i in range(n_iter):
        neigh = (e.join(labels.withColumnRenamed("node", "dst")
                        .withColumnRenamed("community", "nl"), "dst")
                 .groupBy(F.col("src").alias("node"), F.col("nl"))
                 .agg(F.count(F.lit(1)).alias("cnt")))
        # argmax by (count desc, label asc): max of (cnt, -label)
        labels = (neigh.groupBy("node")
                  .agg(F.max(F.struct(F.col("cnt"),
                                      (-F.col("nl")).alias("neg")))
                       .alias("m"))
                  .select("node", (-F.col("m.neg")).alias("community")))
        if (persist_every and (i + 1) % persist_every == 0
                and i + 1 < n_iter):
            labels = labels.localCheckpoint(eager=True)
    return labels
