"""Embedding scalar-quantization tests."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from lightning_metastore_spark.operators.quantization import (  # noqa: E402
    scalar_quantize_stats)


def test_quantize_error_bounds(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    rows = scalar_quantize_stats(emb).collect()
    assert len(rows) == emb.count()
    # symmetric max-abs fit: nothing clips, rounding error <= scale/2 and
    # scales are max|v|/127 with |v| <~ 1 -> errors well under 0.01
    assert all(r.n_clipped == 0 for r in rows)
    assert all(r.n_dims == 64 for r in rows)
    assert all(0.0 <= r.max_abs_err < 0.01 for r in rows)
    assert all(0.0 <= r.mse < 1e-4 for r in rows)


def test_quantize_zero_dimension(spark):
    # second dimension all-zero -> scale 0 -> codes 0, zero error there
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, -2.0]), (2, [0.5, 0.0, 2.0])],
        "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in scalar_quantize_stats(emb).collect()}
    assert out[1].n_dims == 3 and out[1].n_clipped == 0
    # max values quantize exactly (code +-127): error only from rounding
    assert out[1].max_abs_err < 0.01 and out[2].max_abs_err < 0.01


def test_random_project_matches_numpy(spark):
    """The distributed projection must equal a direct numpy x @ R with
    the same md5-derived Rademacher matrix."""
    import hashlib

    import numpy as np

    from lightning_metastore_spark.operators.quantization import (
        RP_OUT_DIMS, random_project)

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").limit(20)
    rows = emb.collect()
    d = len(rows[0].embedding)
    k = RP_OUT_DIMS

    def sign(i, j):
        h = hashlib.md5(f"r:{i}:{j}".encode()).hexdigest()
        return 1 if int(h[0], 16) % 2 == 0 else -1

    R = np.array([[sign(i, j) for j in range(k)] for i in range(d)],
                 dtype=np.float64)
    got = {r.vec_id: [r[f"y{j}"] for j in range(k)]
           for r in random_project(emb).collect()}
    for r in rows:
        x = np.array(r.embedding, dtype=np.float64)
        want = (x @ R) / np.sqrt(k)
        assert np.allclose(got[r.vec_id], want, atol=1e-6), r.vec_id


def test_random_project_deterministic_across_partitionings(spark):
    from lightning_metastore_spark.operators.quantization import (
        random_project)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = random_project(emb.repartition(1)).orderBy("vec_id").collect()
    b = random_project(emb.repartition(16)).orderBy("vec_id").collect()
    assert a == b


def test_norm_outliers_flags_degenerate_vectors(spark):
    import random

    rng = random.Random(11)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(60)]
    rows.append((100, [50.0] * 16))       # exploded activation
    rows.append((101, [0.0] * 16))        # zero vector
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from lightning_metastore_spark.operators.quantization import (
        norm_outliers)

    out = {r.vec_id: r for r in norm_outliers(emb, exact=True).collect()}
    assert bool(out[100].is_outlier) and out[100].rz > 3
    assert bool(out[101].is_outlier) and out[101].rz < -3
    n_flagged = sum(1 for r in out.values() if r.is_outlier)
    assert n_flagged <= 5                  # normal vectors mostly pass
    assert out[101].norm == 0.0
    # partition invariance (decimal-summed squares + broadcast stats)
    again = {r.vec_id: r for r in
             norm_outliers(emb.repartition(7), exact=True).collect()}
    assert {k: (v.norm, v.rz, v.is_outlier) for k, v in out.items()} == \
           {k: (v.norm, v.rz, v.is_outlier) for k, v in again.items()}


def test_norm_outliers_approx_close_to_exact(spark):
    from tests.conftest import SF_DIR

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    from lightning_metastore_spark.operators.quantization import (
        norm_outliers)

    ex = {r.vec_id: r for r in norm_outliers(emb, exact=True).collect()}
    ap = {r.vec_id: r for r in norm_outliers(emb, exact=False).collect()}
    assert set(ex) == set(ap)
    # norms identical (stats differ only via the percentile estimate)
    for k in ex:
        assert ex[k].norm == ap[k].norm
    agree = sum(1 for k in ex
                if bool(ex[k].is_outlier) == bool(ap[k].is_outlier))
    assert agree >= len(ex) * 0.98


def test_power_iteration_pca_matches_numpy(spark):
    import numpy as np

    from lightning_metastore_spark.operators.quantization import (
        power_iteration_pca)

    rng = np.random.default_rng(5)
    # anisotropic cloud: strong direction u1, weaker u2, noise floor
    n, dim = 400, 8
    u1 = np.zeros(dim); u1[0] = 3.0; u1[3] = 4.0   # |u1| = 5
    u2 = np.zeros(dim); u2[1] = 2.0; u2[5] = -1.0
    X = (rng.normal(size=(n, 1)) * u1 + rng.normal(size=(n, 1)) * u2
         + 0.05 * rng.normal(size=(n, dim)) + 7.0)
    rows = [(i, X[i].tolist()) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    V, mean = power_iteration_pca(emb, k=2, n_iter=15)
    Xc = X - X.mean(axis=0)
    _, _, Vt = np.linalg.svd(Xc, full_matrices=False)
    ref = Vt[:2].T
    assert np.allclose(mean, X.mean(axis=0), atol=1e-9)
    for j in range(2):
        cos = abs(float(V[:, j] @ ref[:, j]))
        assert cos > 0.999, (j, cos)
    # orthonormal block
    assert np.allclose(V.T @ V, np.eye(2), atol=1e-9)
    # deterministic across invocations (fixed seed + sign rule)
    V2, _ = power_iteration_pca(emb, k=2, n_iter=15)
    assert np.allclose(V, V2)
    # NULL vectors are ignored, not fatal
    emb2 = emb.union(spark.createDataFrame([(9999, None)],
                                           "vec_id long, embedding array<double>"))
    V3, _ = power_iteration_pca(emb2, k=2, n_iter=15)
    assert np.allclose(V, V3)


def test_apply_pca_projects_like_numpy(spark):
    import numpy as np

    from lightning_metastore_spark.operators.quantization import (
        apply_pca, power_iteration_pca)

    rng = np.random.default_rng(9)
    X = rng.normal(size=(120, 6)) * np.array([5, 1, 3, 0.5, 0.1, 2])
    rows = [(i, X[i].tolist()) for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    V, mean = power_iteration_pca(emb, k=3, n_iter=12)
    got = {r.vec_id: [r.y0, r.y1, r.y2]
           for r in apply_pca(emb, V, mean).collect()}
    want = (X - mean) @ V
    for i in range(120):
        assert np.allclose(got[i], want[i], atol=1e-9), i
    # NULL vector -> NULL coordinates, row preserved
    alien = spark.createDataFrame([(999, None)],
                                  "vec_id long, embedding array<double>")
    r = apply_pca(alien, V, mean).collect()[0]
    assert r.vec_id == 999 and r.y0 is None


def test_power_iteration_pca_ignores_ragged_vectors(spark):
    """A wrong-width row is excluded up front (the apply_pca width
    rule): the trained model equals the clean-input model instead of
    a skewed mean or an np.stack crash mid-iteration."""
    import numpy as np

    from lightning_metastore_spark.operators.quantization import (
        power_iteration_pca)

    rng = np.random.default_rng(3)
    X = rng.normal(size=(120, 6)) * np.array([4, 1, 2, 0.5, 0.2, 3])
    rows = [(i, X[i].tolist()) for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    V0, mean0 = power_iteration_pca(emb, k=2, n_iter=10)

    ragged = spark.createDataFrame(
        [(9998, [1.0, 2.0]), (9999, [float(j) for j in range(9)])],
        "vec_id long, embedding array<double>")
    V1, mean1 = power_iteration_pca(emb.union(ragged), k=2, n_iter=10)
    assert np.allclose(V0, V1)
    assert np.allclose(mean0, mean1)


# --- product quantization ---------------------------------------------------

def test_pq_exact_when_codebook_covers_sample(spark):
    """With k >= sample size every point is its own centroid: encoding
    reconstructs exactly, ADC distance equals the true squared L2, and
    pq_topk equals the numpy brute-force ranking."""
    import numpy as np

    from lightning_metastore_spark.operators.quantization import (
        pq_encode, pq_topk, pq_train)

    rows = [(i, [float((i * 7 + j * 3) % 5) for j in range(8)])
            for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    B = pq_train(emb, m=4, k=16, iters=2)
    assert B.shape == (4, 10, 2)     # k_eff = sample size

    codes = pq_encode(emb, B)
    q = np.array(rows[3][1])
    got = pq_topk(codes, B, q, topk=5).collect()

    X = np.array([v for _, v in rows])
    d2 = ((X - q) ** 2).sum(axis=1)
    want = sorted(range(10), key=lambda i: (round(float(d2[i]), 9), i))[:5]
    assert [r.neighbor_id for r in got] == want
    assert [r.rk for r in got] == [1, 2, 3, 4, 5]
    for r in got:
        assert abs(r.adc_dist - d2[r.neighbor_id]) < 1e-9


def test_pq_recall_and_determinism_on_corpus(spark):
    """Real embeddings (500 x 64): PQ at m=8, k=64 (8 bytes/vector,
    32x narrower than fp32) puts the true L2 nearest neighbor inside
    the ADC top-10 for most probes (measured 4/5 on this deterministic
    corpus; k=16 gives 1/5 and k=256 gives 5/5 — the standard
    quality/width dial); encoding is invariant to input
    partitioning."""
    import numpy as np

    from lightning_metastore_spark.operators.quantization import (
        load_pq_codebooks, pq_encode, pq_topk, pq_train,
        save_pq_codebooks)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    B = pq_train(emb, m=8, k=64, iters=4)
    codes = pq_encode(emb, B)

    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    hits = 0
    for qid in (1, 7, 42, 99, 200):
        q = vecs[qid]
        true_nn = min((i for i in vecs if i != qid),
                      key=lambda i: ((vecs[i] - q) ** 2).sum())
        adc = [r.neighbor_id for r in pq_topk(codes, B, q, topk=11).collect()
               if r.neighbor_id != qid][:10]
        hits += true_nn in adc
    assert hits >= 3, hits

    a = sorted(map(repr, codes.collect()))
    b = sorted(map(repr, pq_encode(emb.repartition(13), B).collect()))
    assert a == b


def test_pq_artifact_roundtrip_and_nulls(spark, tmp_path):
    import numpy as np

    from lightning_metastore_spark.operators.quantization import (
        load_pq_codebooks, pq_encode, pq_train, save_pq_codebooks)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .limit(50)
    B = pq_train(emb, m=8, k=8, iters=2)
    path = str(tmp_path / "pq")
    save_pq_codebooks(spark, B, path)
    B2 = load_pq_codebooks(spark, path)
    assert np.array_equal(B, B2)

    bad = spark.createDataFrame(
        [(900, None), (901, [1.0, 2.0])],
        "vec_id long, embedding array<double>")
    out = {r.vec_id: r.codes for r in pq_encode(bad, B).collect()}
    assert out[900] is None and out[901] is None


def test_pq_train_skips_nulls_and_names_ragged_vectors(spark):
    """r11 ADVICE: NULL embeddings must not poison the training sample
    (pq_encode already NULL-passes them), and a wrong-width vector
    raises a ValueError naming the offending id — not numpy's opaque
    ragged-array error."""
    import numpy as np
    import pytest

    from lightning_metastore_spark.operators.quantization import pq_train

    ok = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0]), (2, None), (3, [0.0, 1.0, 0.0, 1.0])],
        "vec_id long, embedding array<double>")
    B = pq_train(ok, m=2, k=2, iters=1)
    assert np.isfinite(B).all()           # NULL row silently skipped

    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0]), (2, [1.0, 2.0])],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="width mismatch.*vec_id"):
        pq_train(ragged, m=2, k=2, iters=1)

    allnull = spark.createDataFrame(
        [(1, None)], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        pq_train(allnull, m=2, k=2, iters=1)


def test_ivf_pq_composes_and_degenerates_to_pq(spark):
    """IVF-PQ: at full probe coverage (nprobe == n_cells) the result
    equals plain pq_topk over everything; at nprobe=1 the candidates
    are exactly the probed cell's members (ADC order within them)."""
    from lightning_metastore_spark.operators.quantization import (
        ivf_pq_topk, pq_encode, pq_topk, pq_train)
    from lightning_metastore_spark.operators.similarity import (
        assign_cells, kmeans_centroids)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .limit(120)
    cents = kmeans_centroids(emb, k=4)
    B = pq_train(emb, m=8, k=32, iters=3)
    q = emb.filter("vec_id = 7").first()["embedding"]

    full = ivf_pq_topk(emb, cents, B, q, topk=5, nprobe=4).collect()
    plain = pq_topk(pq_encode(emb, B), B, q, topk=5).collect()
    assert sorted(map(repr, full)) == sorted(map(repr, plain))

    index = assign_cells(emb, cents)
    codes = pq_encode(emb, B)
    one = ivf_pq_topk(emb, cents, B, q, topk=5, nprobe=1,
                      index=index, codes=codes).collect()
    # every hit comes from one cell, and that cell contains the query
    cells = {r.vec_id: r.cell for r in index.collect()}
    hit_cells = {cells[r.neighbor_id] for r in one}
    assert len(hit_cells) == 1 and cells[7] in hit_cells
