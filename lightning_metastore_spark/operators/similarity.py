"""Similarity search over embedding columns (array<float>).

Two paths:
- ``brute_force_topk`` — exact cosine top-k. The query set is broadcast;
  each executor scans its slice of the corpus once. Correct at any corpus
  size; cost is O(|corpus| * |queries|), the right baseline and oracle.
- ``ivf_topk`` — IVF-style bucketed ANN: a deterministic centroid subset
  partitions the corpus; queries probe only the ``nprobe`` nearest cells.
  This is the 100 TB path: corpus cells are a hash-partitioned equi-join
  key, so the scan per query drops by ~|cells|/nprobe.

All vector math is JVM-side collection expressions (zip_with/aggregate),
cast to array<double> so accumulation matches the DuckDB oracle
bit-for-bit modulo the final rounding. Ranks are computed on cosine
rounded to 9 decimals with an id tiebreak, making orderings
engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _with_norm(emb: DataFrame, id_col: str, vec_col: str,
               out_id: str) -> DataFrame:
    return emb.select(
        F.col(id_col).alias(out_id),
        F.col(vec_col).cast("array<double>").alias(f"{out_id}_v"),
    ).withColumn(
        f"{out_id}_norm",
        F.sqrt(F.aggregate(F.transform(f"{out_id}_v", lambda x: x * x),
                           F.lit(0.0), lambda acc, v: acc + v)))


def _dot(a: str, b: str):
    return F.aggregate(F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "vec_id") -> DataFrame:
    """Exact cosine top-k: (query_id, rk, neighbor_id, cosine).

    The query side is broadcast — the corpus never shuffles; ranking
    shuffles only (query_id, neighbor_id, cosine) tuples, k-bounded by
    the window filter.
    """
    c = _with_norm(corpus, id_col, vec_col, "neighbor_id")
    q = _with_norm(queries, query_id_col, vec_col, "query_id")
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine",
                    F.round(_dot("query_id_v", "neighbor_id_v")
                            / (F.col("query_id_norm") * F.col("neighbor_id_norm")), 9))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("query_id", "rk", "neighbor_id", "cosine")
            .orderBy("query_id", "rk"))


def kmeans_centroids(corpus: DataFrame, k: int = 16, iters: int = 4,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     sample_fraction: float | None = None,
                     max_sample: int = 200_000) -> DataFrame:
    """Corpus-adaptive IVF centroids: Lloyd's k-means fit driver-side on
    a deterministic hash-sample — the FAISS IVF training shape.

    Centroid quality needs thousands of points per cell, not the whole
    corpus: at 100 TB you take a hash-sample (``sample_fraction`` to
    pre-thin distributively, ``max_sample`` rows collected — ~100 MB at
    200k x 64 doubles), fit locally in milliseconds, and then
    ``assign_cells`` indexes the full corpus in ONE broadcast map pass.
    The fit itself is a single Spark job (the sample collect); a
    driver-coordinated per-iteration job loop would pay ~0.5 s
    scheduling overhead per iteration for no accuracy gain.

    Determinism (no RNG, replayable plans): the sample is the
    ``max_sample`` smallest md5(id) rows, init is the first k of that
    ordering, assignment is cosine-to-centroid argmax with numpy's
    first-maximum tie break, empty cells keep their previous centroid
    (standard Lloyd fallback).
    """
    import numpy as np

    df = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"))
    if sample_fraction is not None:
        df = df.filter(
            F.abs(F.hash(F.col("_id"))) % 10_000 < int(sample_fraction * 10_000))
    # orderBy+limit = TakeOrdered: fine once sample_fraction has thinned
    # the input; don't point this at a raw 100 TB corpus without one.
    rows = (df.withColumn("_h", F.md5(F.col("_id").cast("string")))
            .orderBy("_h").limit(max_sample).select("_v").collect())
    x = np.array([r._v for r in rows], dtype=np.float64)
    if len(x) == 0:
        raise ValueError(
            "kmeans_centroids: the sampled corpus is empty — nothing to "
            "fit (check the corpus / sample_fraction)")
    # fewer sample rows than requested cells: fit what exists (k distinct
    # centroids cannot be produced from < k points anyway)
    k_eff = min(k, len(x))
    cents = x[:k_eff].copy()
    for _ in range(iters):
        norms = np.linalg.norm(cents, axis=1)
        norms[norms == 0.0] = 1.0
        cell = (x @ cents.T / norms).argmax(axis=1)
        for c in range(k_eff):
            members = x[cell == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    spark = corpus.sparkSession
    return spark.createDataFrame(
        [(i, [float(v) for v in cents[i]]) for i in range(k_eff)],
        schema=f"centroid_id long, {vec_col} array<double>")


def assign_cells(corpus: DataFrame, centroids: DataFrame,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 centroid_id_col: str = "centroid_id") -> DataFrame:
    """Assign every vector to its nearest centroid (broadcast argmax).

    Returns (vec_id, cell, v, norm) — the IVF index. At 100 TB this is
    one broadcast pass over the corpus; persist/bucket the result by
    ``cell`` to make repeated queries shuffle-free.
    """
    c = _with_norm(corpus, id_col, vec_col, "vid")
    cen = _with_norm(centroids, centroid_id_col, vec_col, "cid")
    scored = c.join(F.broadcast(cen)).withColumn(
        "sim", _dot("vid_v", "cid_v") / (F.col("vid_norm") * F.col("cid_norm")))
    w = W.partitionBy("vid").orderBy(F.desc("sim"), F.asc("cid"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select(F.col("vid").alias(id_col), F.col("cid").alias("cell"),
                    F.col("vid_v").alias("v"), F.col("vid_norm").alias("norm")))


def ivf_topk(corpus: DataFrame, queries: DataFrame, centroids: DataFrame,
             k: int = 5, nprobe: int = 3, id_col: str = "vec_id",
             vec_col: str = "embedding",
             index: DataFrame | None = None) -> DataFrame:
    """IVF approximate top-k: probe the nprobe nearest cells per query.

    Plan: index = assign_cells(corpus); per query pick nprobe cells
    (broadcast centroid argmax), then an equi-join on ``cell`` restricts
    the scan to probed cells. Approximate — no SQL oracle; recall vs
    brute force is asserted in tests.

    Pass a prebuilt ``index`` (assign_cells output, e.g. reloaded via
    ``load_ivf_index``) to skip the assignment pass — the serving path:
    index once, query many times against cell-partitioned parquet where
    the cell equi-join prunes unprobed partitions at the scan.
    """
    if index is None:
        index = assign_cells(corpus, centroids, id_col, vec_col)
    q = _with_norm(queries, id_col, vec_col, "query_id")
    cen = _with_norm(centroids, "centroid_id", vec_col, "cid")
    qc = q.join(F.broadcast(cen)).withColumn(
        "sim", _dot("query_id_v", "cid_v") / (F.col("query_id_norm") * F.col("cid_norm")))
    wq = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("cid"))
    probes = (qc.withColumn("rk", F.row_number().over(wq))
              .filter(F.col("rk") <= nprobe)
              .select("query_id", F.col("cid").alias("cell"),
                      "query_id_v", "query_id_norm"))
    scored = (
        probes.join(index, "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .withColumn("cosine",
                    F.round(_dot("query_id_v", "v")
                            / (F.col("query_id_norm") * F.col("norm")), 9))
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("query_id", "rk", F.col(id_col).alias("neighbor_id"), "cosine")
            .orderBy("query_id", "rk"))


def refresh_topk(prior_topk: DataFrame, delta: DataFrame,
                 queries: DataFrame, k: int = 5, id_col: str = "vec_id",
                 vec_col: str = "embedding",
                 query_id_col: str = "vec_id",
                 check_prior: bool = True) -> DataFrame:
    """Incremental exact top-k maintenance for a GROWING corpus: merge
    the persisted prior result with the scores of only the DELTA batch
    — never rescanning the base corpus (the interactive/ingest-refresh
    pattern; cf. incremental top-k similarity search, EDBT 2020 —
    algorithmic idea reimplemented from the public description).

    Correctness: cosine top-k is a monoid under this merge —
    ``topk(base UNION delta) == merge(topk(base), topk(delta))`` —
    because any global top-k member is in its own source's top-k. The
    tests assert exactly that algebraic identity.

    100 TB shape: the base corpus is touched ZERO times; work is
    O(|delta| x |queries|) scoring plus a window over 2k candidates
    per query. Deletions are out of scope (a deletion invalidates the
    monoid — recompute or tombstone-filter first).

    ``check_prior`` (default on) raises when a query id has NO rows in
    ``prior_topk`` — merging would silently return delta-only
    neighbors for a query the prior never saw (e.g. a freshly added
    query vector). Pass ``check_prior=False`` only when the base
    corpus was legitimately too small to yield prior neighbors.
    """
    if check_prior:
        q_ids = queries.select(F.col(query_id_col).alias("query_id"))
        missing = (q_ids.join(prior_topk.select("query_id").distinct(),
                              "query_id", "left_anti").limit(5).collect())
        if missing:
            ids = sorted(r.query_id for r in missing)
            raise ValueError(
                f"refresh_topk: query ids {ids} have no prior_topk rows "
                "— run brute_force_topk for new queries (or pass "
                "check_prior=False if the base corpus was empty)")
    delta_topk = brute_force_topk(delta, queries, k, id_col, vec_col,
                                  query_id_col)
    merged = (prior_topk.select("query_id", "neighbor_id", "cosine")
              .unionByName(delta_topk.select("query_id", "neighbor_id",
                                             "cosine")))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"),
                                          F.asc("neighbor_id"))
    return (merged.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("query_id", "rk", "neighbor_id", "cosine")
            .orderBy("query_id", "rk"))


def save_ivf_index(corpus: DataFrame, centroids: DataFrame, path: str,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> dict:
    """Persist the IVF index as a serving artifact: the cell-assigned
    corpus written PARTITIONED BY cell (a query probing nprobe cells
    then scans only those cells' files — partition pruning does the
    |cells|/nprobe read reduction on disk, not just in the join) plus
    the KB-sized centroid table. Returns {"n_vectors", "n_cells"}.

    The 100 TB serving split: index once (one broadcast assign pass +
    one partitioned write), query forever without touching the raw
    corpus — and ``refresh_topk`` absorbs deltas without re-indexing.
    """
    import os

    index = assign_cells(corpus, centroids, id_col, vec_col)
    index.write.mode("overwrite").partitionBy("cell") \
        .parquet(os.path.join(path, "cells"))
    centroids.coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(path, "centroids"))
    spark = corpus.sparkSession
    cells = spark.read.parquet(os.path.join(path, "cells"))
    return {"n_vectors": cells.count(),
            "n_cells": centroids.count()}


def load_ivf_index(spark, path: str):
    """Reload a saved IVF index: (centroids, index) ready for
    ``ivf_topk(..., index=index)``. The index DataFrame reads the
    cell-partitioned layout, so the downstream cell equi-join prunes
    partitions at the scan."""
    import os

    centroids = spark.read.parquet(os.path.join(path, "centroids"))
    index = spark.read.parquet(os.path.join(path, "cells"))
    return centroids, index
