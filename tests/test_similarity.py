"""Similarity-search tests: brute-force sanity + IVF recall."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from lightning_metastore_spark.operators import similarity  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_brute_force_topk_shape(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") % 50 == 0)
    out = similarity.brute_force_topk(emb, q, k=5).collect()
    n_queries = q.count()
    assert len(out) == 5 * n_queries
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rows in by_q.items():
        assert [r.rk for r in sorted(rows, key=lambda r: r.rk)] == [1, 2, 3, 4, 5]
        cos = [r.cosine for r in sorted(rows, key=lambda r: r.rk)]
        assert cos == sorted(cos, reverse=True)
        assert all(r.neighbor_id != qid for r in rows)


def test_ivf_recall_vs_brute_force(spark):
    """IVF with k-means centroids and nprobe=6 must recover most of the
    true top-5; the fitted centroids must beat (or match) the old
    modulo-sample baseline of 0.74 on this near-isotropic corpus."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") % 50 == 0)
    cen = similarity.kmeans_centroids(emb, k=14, iters=3)
    exact = {(r.query_id, r.neighbor_id)
             for r in similarity.brute_force_topk(emb, q, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in similarity.ivf_topk(emb, q, cen, k=5, nprobe=6).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.75, f"IVF recall {recall:.2f} too low — fit broken?"


def test_kmeans_centroids_deterministic(spark):
    emb = _emb(spark)
    a = similarity.kmeans_centroids(emb, k=8, iters=2).collect()
    b = similarity.kmeans_centroids(emb, k=8, iters=2).collect()
    assert [r.embedding for r in sorted(a, key=lambda r: r.centroid_id)] == \
        [r.embedding for r in sorted(b, key=lambda r: r.centroid_id)]
    # sampled fit also works and yields k rows
    s = similarity.kmeans_centroids(emb, k=8, iters=2,
                                    sample_fraction=0.5).collect()
    assert len(s) == 8


def test_kmeans_centroids_small_and_empty_sample(spark):
    """k larger than the sample clamps to the sample size (no
    IndexError); an empty corpus is a clear error, not a numpy crash."""
    import pytest

    tiny = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<double>")
    cents = similarity.kmeans_centroids(tiny, k=8, iters=2).collect()
    assert len(cents) == 3
    with pytest.raises(ValueError, match="empty"):
        similarity.kmeans_centroids(tiny.filter("vec_id < 0"), k=4)


def test_refresh_topk_equals_full_recompute(spark):
    """The incremental merge is exact: topk(base+delta) ==
    refresh(topk(base), delta) — the base corpus is never rescanned."""
    import random

    from lightning_metastore_spark.operators.similarity import (
        brute_force_topk, refresh_topk)

    rng = random.Random(21)

    def emb(ids):
        return spark.createDataFrame(
            [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in ids],
            "vec_id long, embedding array<double>")

    base, delta, queries = emb(range(60)), emb(range(100, 130)), emb(
        range(500, 505))
    full = spark.createDataFrame(base.union(delta).collect(),
                                 base.schema)
    want = [tuple(r) for r in
            brute_force_topk(full, queries, k=4).collect()]
    prior = brute_force_topk(base, queries, k=4)
    got = [tuple(r) for r in
           refresh_topk(prior, delta, queries, k=4).collect()]
    assert got == want


def test_refresh_topk_rejects_unseen_query(spark):
    import pytest

    from lightning_metastore_spark.operators.similarity import (
        brute_force_topk, refresh_topk)

    def emb(ids):
        return spark.createDataFrame(
            [(i, [float(i % 7 + 1), 1.0]) for i in ids],
            "vec_id long, embedding array<double>")

    prior = brute_force_topk(emb(range(10)), emb([100]), k=3)
    with pytest.raises(ValueError, match="no prior_topk rows"):
        refresh_topk(prior, emb(range(20, 25)), emb([100, 101]), k=3)
    # the escape hatch still works
    out = refresh_topk(prior, emb(range(20, 25)), emb([100, 101]), k=3,
                       check_prior=False)
    assert out.count() > 0


def test_ivf_index_persistence_roundtrip(spark, tmp_path):
    """save_ivf_index -> load_ivf_index -> ivf_topk(index=...) equals
    the fresh in-memory path, and the persisted layout is
    cell-partitioned so probed-cell reads prune partitions."""
    from lightning_metastore_spark.operators.similarity import (
        ivf_topk, kmeans_centroids, load_ivf_index, save_ivf_index)

    emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
           .orderBy("vec_id").limit(120))
    queries = emb.limit(6)
    cents = kmeans_centroids(emb, k=8, iters=2)

    path = str(tmp_path / "ivf_index")
    stats = save_ivf_index(emb, cents, path)
    assert stats["n_vectors"] == 120 and stats["n_cells"] == 8

    loaded_cents, index = load_ivf_index(spark, path)
    fresh = ivf_topk(emb, queries, cents, k=4, nprobe=3)
    served = ivf_topk(emb, queries, loaded_cents, k=4, nprobe=3,
                      index=index)
    assert sorted(map(tuple, fresh.collect())) == \
        sorted(map(tuple, served.collect()))

    # the layout prunes: a single-cell read shows a partition filter
    one = spark.read.parquet(f"{path}/cells").filter("cell = 0")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(cell" in plan
