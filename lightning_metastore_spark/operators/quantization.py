"""Embedding quantization for large-scale vector corpora.

At 100 TB an fp32 embedding column is routinely the widest thing in the
table; int8 scalar quantization shrinks it 4x before ANN indexing (the
standard IVF-SQ8 recipe). This module computes per-dimension symmetric
scales over the corpus, the clipped int8 codes, and per-vector
reconstruction-error stats for accuracy monitoring.

Scale design: per-dimension scales come from one posexplode +
dimension-keyed aggregation (shuffle keys = the embedding width, e.g.
64-4096 — tiny); the scale table broadcasts back onto the exploded
stream, and the per-vector error aggregate shuffles once on vec_id.
Everything is JVM column expressions; error sums are DECIMAL-cast so
results are bit-stable on any partitioning.

Reference parity note: the reference has no quantization operators
(SURVEY.md §2.7); part of the driver-mandated LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scalar_quantize_stats(emb: DataFrame, id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          q_max: int = 127) -> DataFrame:
    """Symmetric int8 scalar quantization + reconstruction stats:
    (vec_id, n_dims, n_clipped, max_abs_err, mse).

    scale_d = max(|v_d|)/q_max per dimension d over the corpus;
    code = clamp(round(v/scale), -q_max, q_max). All-zero dimensions
    (scale 0) quantize to 0. ``n_clipped`` counts values whose unclamped
    code exceeded the range — 0 under symmetric max-abs scaling, the
    column exists because real pipelines quantize NEW vectors with
    frozen scales, where clipping is the signal to re-fit.
    """
    ex = emb.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col).cast("array<double>"))
        .alias("dim", "val"))
    scales = (ex.groupBy("dim")
              .agg((F.max(F.abs("val")) / q_max).alias("scale")))
    raw_code = F.round(F.col("val") / F.col("scale"))
    code = F.when(F.col("scale") == 0, F.lit(0.0)).otherwise(
        F.least(F.greatest(raw_code, F.lit(float(-q_max))),
                F.lit(float(q_max))))
    clipped = F.when((F.col("scale") != 0) & (F.abs(raw_code) > q_max), 1) \
        .otherwise(0)
    err = F.col("val") - code * F.col("scale")
    return (ex.join(F.broadcast(scales), "dim")
            .select(F.col(id_col), clipped.alias("clipped"),
                    err.alias("err"))
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_dims"),
                 F.sum("clipped").cast("long").alias("n_clipped"),
                 F.round(F.max(F.abs("err")), 9).alias("max_abs_err"),
                 F.round(
                     F.sum((F.col("err") * F.col("err"))
                           .cast("decimal(28,15)")).cast("double")
                     / F.count(F.lit(1)), 9).alias("mse")))


RP_OUT_DIMS = 8


def random_project(emb: DataFrame, k: int = RP_OUT_DIMS,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Johnson-Lindenstrauss random projection y = (x @ R) / sqrt(k)
    with deterministic Rademacher entries R[i,j] in {+1,-1} derived
    from md5("r:i:j") parity — the cheap dimensionality-reduction step
    before ANN indexing / clustering when the native width is large.
    Output: (vec_id, y0..y{k-1}).

    100 TB shape: posexplode the vector -> ONE broadcast join against
    the (d x k)-row sign table (KBs — the projection matrix is the
    model) -> one (vec, out-dim)-keyed aggregation -> one per-vec
    pivot-style agg. Per-term products are exact sign flips of the
    input doubles; sums are DECIMAL(28,15)-accumulated so results are
    bit-stable under any partitioning (and engine-reproducible — the
    DuckDB oracle recomputes R from the same md5 arithmetic).
    """
    spark = emb.sparkSession
    ex = emb.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col).cast("array<double>"))
        .alias("i", "x"))
    d = emb.select(F.size(vec_col).alias("d")).first()["d"]
    sign = (F.when(
        F.conv(F.substring(F.md5(F.concat_ws(":", F.lit("r"),
                                             F.col("i").cast("string"),
                                             F.col("j").cast("string"))),
                           1, 1), 16, 10).cast("long") % 2 == 0,
        F.lit(1)).otherwise(F.lit(-1)))
    r = (spark.range(d * k)
         .select((F.col("id") / k).cast("long").alias("i"),
                 (F.col("id") % k).alias("j"))
         .withColumn("s", sign))
    dots = (ex.join(F.broadcast(r), "i")
            .withColumn("term", (F.col("x") * F.col("s"))
                        .cast("decimal(28,15)"))
            .groupBy(id_col, "j")
            .agg(F.sum("term").alias("dot"))
            .withColumn("y", F.round(
                F.col("dot").cast("double") / float(k) ** 0.5, 9)))
    return (dots.groupBy(id_col)
            .agg(*[F.max(F.when(F.col("j") == j, F.col("y"))).alias(f"y{j}")
                   for j in range(k)]))


def norm_outliers(emb: DataFrame, k: float = 3.0, exact: bool = False,
                  vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """Robust embedding-norm outlier detection: (vec_id, norm, rz,
    is_outlier) where rz = (norm - median) / IQR over the corpus norms
    and is_outlier = |rz| > ``k`` — the cheap degenerate-embedding
    screen (zero vectors, exploded activations, wrong-model rows) run
    before any similarity work.

    Norms are decimal-summed squares (partition-stable) computed
    map-only on the exploded value stream with ONE vec-keyed
    aggregation. The median/IQR statistics are a single 3-number
    aggregate broadcast back onto the stream: with ``exact=False``
    (the scale default) they come from ``approx_percentile`` —
    mergeable sketch, bounded memory; ``exact=True`` uses the exact
    ``percentile`` aggregate (holds the norm vector in memory — gate /
    oracle use only; embeddings tables small enough to profile exactly
    are also small enough for this).
    """
    ex = emb.select(F.col(id_col), F.explode(vec_col).alias("x"))
    sq = (F.col("x").cast("double") * F.col("x").cast("double")) \
        .cast("decimal(28,15)")
    norms = (ex.groupBy(id_col)
             .agg(F.sum(sq).alias("s2"))
             .select(id_col,
                     F.round(F.sqrt(F.col("s2").cast("double")), 9)
                     .alias("norm")))
    fn = "percentile" if exact else "approx_percentile"
    stats = norms.agg(
        F.expr(f"{fn}(norm, array(0.25D, 0.5D, 0.75D))").alias("q"))
    med = F.col("q")[1]
    iqr = F.col("q")[2] - F.col("q")[0]
    rz = (F.col("norm") - med) / iqr
    return (norms.crossJoin(F.broadcast(stats))
            .select(F.col(id_col), "norm",
                    F.when(iqr > 0, F.round(rz, 6)).alias("rz"),
                    F.when(iqr > 0, F.abs(rz) > F.lit(float(k)))
                    .otherwise(F.lit(False)).alias("is_outlier")))


def power_iteration_pca(emb: DataFrame, k: int = 2, n_iter: int = 10,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id"):
    """Top-``k`` principal components by distributed orthogonal (block
    power) iteration — PCA without ever materializing the d x d
    covariance: each iteration computes Y = Xc^T (Xc V) with two
    passes over the data and a driver-side QR of the d x k block.

    Returns (components, mean) as numpy arrays (d x k, and d) — the
    projection model a pipeline ships (compose with
    ``random_project``-style application or a mapInPandas transform).
    Components have deterministic sign (largest-|loading| entry made
    positive) and a deterministic md5-seeded start, so runs are
    reproducible.

    Scale shape: the mean and each iteration's Y are (d x k)-sized
    aggregates — executors stream rows through one Arrow-batched GEMM
    per batch and emit PARTIAL (d x k) blocks; the driver only ever
    reduces p blocks of d*k numbers and runs QR on d x k (KBs). The
    corpus is scanned 1 + n_iter times; persist the (centered) input
    when iterating deeply.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    base = emb.select(F.col(vec_col).cast("array<double>").alias("v")) \
        .filter(F.col("v").isNotNull())
    # the expected width is the MODAL width (most frequent, ties to the
    # smaller), not whatever row .first() happens to return — one
    # anomalous-width row arriving first must not define d and evict
    # every normal vector (same fix as semantic_dedup's tie-bucket)
    first = (base.groupBy(F.size("v").alias("d")).count()
             .orderBy(F.desc("count"), F.asc("d")).first())
    if first is None:
        raise ValueError("power_iteration_pca: empty input")
    d = int(first["d"])
    # exclude ragged (wrong-width) vectors up front — mirroring
    # apply_pca's width check — so one degenerate row can't skew the
    # posexploded mean or crash np.stack mid-iteration
    base = base.filter(F.size("v") == d)
    # the loop below runs 1 + n_iter actions over this relation (the
    # docstring's own advice): persist it once instead of re-deriving
    # the scan + cast + width filter per iteration; MEMORY_AND_DISK
    # spills gracefully at corpus scale, and we unpersist on exit
    base = base.persist()

    # mean vector: one exploded dim-keyed agg (d rows back to driver)
    ex = base.select(F.posexplode("v").alias("dim", "x"))
    mean_rows = (ex.groupBy("dim").agg(F.avg("x").alias("m"))
                 .orderBy("dim").collect())
    mean = np.array([r["m"] for r in mean_rows])

    # deterministic start block from md5 digits
    V = np.array([[int(hashlib.md5(f"pca:{i}:{j}".encode())
                       .hexdigest()[:8], 16) / 0xFFFFFFFF - 0.5
                   for j in range(k)] for i in range(d)])
    V, _ = np.linalg.qr(V)

    def make_pass(Vb, meanb):
        def run(batches):
            total = np.zeros((d, k))
            seen = False
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(pdf["v"].to_numpy()) - meanb
                total += X.T @ (X @ Vb)
                seen = True
            if seen:
                yield pd.DataFrame({"dim": np.repeat(np.arange(d), k),
                                    "j": np.tile(np.arange(k), d),
                                    "val": total.ravel()})
            else:
                yield pd.DataFrame({"dim": pd.Series(dtype="int64"),
                                    "j": pd.Series(dtype="int64"),
                                    "val": pd.Series(dtype="float64")})
        return run

    try:
        for _ in range(n_iter):
            rows = (base.mapInPandas(make_pass(V, mean),
                                     schema="dim long, j long, val double")
                    .groupBy("dim", "j").agg(F.sum("val").alias("y"))
                    .collect())
            Y = np.zeros((d, k))
            for r in rows:
                Y[int(r["dim"]), int(r["j"])] = r["y"]
            V, _ = np.linalg.qr(Y)
    finally:
        base.unpersist()

    # deterministic sign: make the largest-|loading| coordinate positive
    for j in range(k):
        i = int(np.argmax(np.abs(V[:, j])))
        if V[i, j] < 0:
            V[:, j] = -V[:, j]
    return V, mean


def apply_pca(emb: DataFrame, components, mean,
              vec_col: str = "embedding",
              id_col: str = "vec_id") -> DataFrame:
    """Project every vector onto trained principal components:
    (vec_id, y0..y{k-1}) = (x - mean) @ V. One map-only Arrow GEMM
    pass with the (d x k) model in the closure — the application half
    of ``power_iteration_pca`` (dimensionality reduction before ANN /
    semantic dedup, the deterministic alternative to the random
    projection when a fitted basis is worth one extra training pass).
    NULL vectors pass through as NULL coordinates."""
    import numpy as np
    import pandas as pd

    V = np.asarray(components, dtype=np.float64)
    mu = np.asarray(mean, dtype=np.float64)
    k = V.shape[1]
    cols = [id_col] + [f"y{j}" for j in range(k)]

    def run(batches):
        for pdf in batches:
            ids, good, mats = [], [], []
            out_rows = []
            for rid, v in zip(pdf[id_col], pdf["v"]):
                if v is None or len(v) != V.shape[0]:
                    out_rows.append([int(rid)] + [None] * k)
                else:
                    ids.append(int(rid))
                    mats.append(np.asarray(v, dtype=np.float64))
            if mats:
                Y = (np.stack(mats) - mu) @ V
                for rid, y in zip(ids, Y):
                    out_rows.append([rid] + [float(c) for c in y])
            yield pd.DataFrame(out_rows, columns=cols)

    base = emb.select(F.col(id_col),
                      F.col(vec_col).cast("array<double>").alias("v"))
    schema = f"{id_col} long, " + ", ".join(f"y{j} double"
                                            for j in range(k))
    return base.mapInPandas(run, schema=schema)


# ---------------------------------------------------------------------------
# Product quantization (FAISS PQ): m subspace codebooks, 1-byte codes
# ---------------------------------------------------------------------------


def pq_train(emb: DataFrame, m: int = 8, k: int = 16, iters: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             sample_fraction: float | None = None,
             max_sample: int = 200_000):
    """Train product-quantization codebooks: a (m, k, d/m) float64
    array — m subspace k-means fits, the FAISS PQ recipe. PQ codes cut
    an embedding column to m bytes/vector (d x 4 bytes -> m), the
    standard memory layout for billion-vector ANN serving (IVF-PQ).

    Same scale/determinism shape as similarity.kmeans_centroids: the
    fit runs driver-side on the ``max_sample`` smallest-md5(id) rows
    (pre-thin a huge corpus with ``sample_fraction`` — one distributed
    filter), init is the first k sample rows per subspace, Lloyd
    updates use squared-L2 argmin with numpy's first-minimum tie break
    (PQ quantizes RESIDUAL geometry, so L2 — not cosine — is the
    right metric), empty cells keep their centroid. No RNG anywhere:
    retraining on the same corpus reproduces the same codebooks
    bit-for-bit. d must divide by m.
    """
    import numpy as np

    df = emb.select(F.col(id_col).alias("_id"),
                    F.col(vec_col).cast("array<double>").alias("_v"))
    if sample_fraction is not None:
        df = df.filter(F.abs(F.hash(F.col("_id"))) % 10_000
                       < int(sample_fraction * 10_000))
    # NULL vectors are dropped distributed-side (pq_encode encodes
    # them to NULL; training just skips them); a WRONG-WIDTH vector
    # raises a named error instead of numpy's opaque ragged-array one
    rows = (df.filter(F.col("_v").isNotNull())
            .withColumn("_h", F.md5(F.col("_id").cast("string")))
            .orderBy("_h").limit(max_sample)
            .select("_id", "_v").collect())
    if len(rows) == 0:
        raise ValueError("pq_train: the sampled corpus is empty")
    d = len(rows[0]._v)
    for r in rows:
        if len(r._v) != d:
            raise ValueError(
                f"pq_train: vector width mismatch — {id_col}="
                f"{rows[0]._id} has dim {d} but {id_col}={r._id} has "
                f"dim {len(r._v)}")
    x = np.array([r._v for r in rows], dtype=np.float64)
    if d % m:
        raise ValueError(f"pq_train: dim {d} not divisible by m={m}")
    dsub = d // m
    k_eff = min(k, len(x))
    books = np.zeros((m, k_eff, dsub), dtype=np.float64)
    for j in range(m):
        xs = x[:, j * dsub:(j + 1) * dsub]
        cents = xs[:k_eff].copy()
        for _ in range(iters):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            cell = d2.argmin(axis=1)
            for c in range(k_eff):
                members = xs[cell == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j] = cents
    return books


def pq_encode(emb: DataFrame, codebooks,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Encode vectors to PQ codes: (vec_id, codes array<int>) with
    codes[j] = argmin_c ||x_sub_j - codebook[j][c]||² (first-minimum
    tie break — deterministic on any engine/partitioning).

    Map-only: the (m, k, d/m) codebook rides the closure (KBs);
    per Arrow batch one vectorized numpy distance + argmin per
    subspace. NULL / wrong-width vectors encode to NULL.
    """
    import numpy as np
    import pandas as pd

    B = np.asarray(codebooks, dtype=np.float64)
    m, _, dsub = B.shape
    d = m * dsub

    def run(batches):
        for pdf in batches:
            out = []
            for rid, v in zip(pdf[id_col], pdf["v"]):
                if v is None or len(v) != d:
                    out.append((int(rid), None))
                    continue
                xs = np.asarray(v, dtype=np.float64).reshape(m, dsub)
                codes = [int(((B[j] - xs[j]) ** 2).sum(axis=1).argmin())
                         for j in range(m)]
                out.append((int(rid), codes))
            yield pd.DataFrame(out, columns=[id_col, "codes"])

    base = emb.select(F.col(id_col),
                      F.col(vec_col).cast("array<double>").alias("v"))
    return base.mapInPandas(run, schema=f"{id_col} long, codes array<int>")


def pq_topk(codes_df: DataFrame, codebooks, query_vec, topk: int = 5,
            id_col: str = "vec_id") -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes:
    (rk, neighbor_id, adc_dist) — the k nearest by approximate squared
    L2, ties by id. The query stays UN-quantized: per subspace a k-row
    lookup table of ||q_sub - centroid||² is built once (m x k floats,
    driver-side), and a vector's distance is m table gathers + a sum —
    no decode, no float vector column touched.

    100 TB shape: the lookup table rides the closure; scoring is one
    vectorized numpy gather per Arrow batch over the CODES column
    (m bytes/vector, 32x narrower than fp32 d=64); selection is a
    distributed TakeOrdered. Distances round to 9dp (engine-stable
    ordering, the cosine discipline).
    """
    import numpy as np
    import pandas as pd

    B = np.asarray(codebooks, dtype=np.float64)
    m, _, dsub = B.shape
    q = np.asarray(query_vec, dtype=np.float64).reshape(m, dsub)
    tables = ((B - q[:, None, :]) ** 2).sum(axis=2)   # (m, k)

    def run(batches):
        for pdf in batches:
            ids, dists = [], []
            for rid, codes in zip(pdf[id_col], pdf["codes"]):
                if codes is None:
                    continue
                c = np.asarray(codes, dtype=np.int64)
                ids.append(int(rid))
                dists.append(float(tables[np.arange(m), c].sum()))
            yield pd.DataFrame({id_col: ids, "adc_dist": dists})

    scored = codes_df.mapInPandas(run,
                                  schema=f"{id_col} long, adc_dist double")
    from pyspark.sql.window import Window as W

    ranked = (scored
              .withColumn("adc_dist", F.round("adc_dist", 9))
              .orderBy(F.asc("adc_dist"), F.asc(id_col))
              .limit(int(topk))
              .withColumn("rk", F.row_number().over(
                  W.orderBy(F.asc("adc_dist"), F.asc(id_col)))))
    return ranked.select("rk", F.col(id_col).alias("neighbor_id"),
                         "adc_dist")


def save_pq_codebooks(spark, codebooks, path: str) -> None:
    """Persist PQ codebooks as a parquet artifact (one row per
    (subspace, centroid): engine-portable, versionable next to the
    corpus like the tokenizer/bloom artifacts)."""
    import numpy as np

    B = np.asarray(codebooks, dtype=np.float64)
    rows = [(j, c, [float(v) for v in B[j, c]])
            for j in range(B.shape[0]) for c in range(B.shape[1])]
    spark.createDataFrame(
        rows, "subspace long, centroid_id long, vec array<double>") \
        .coalesce(1).write.mode("overwrite").parquet(path)


def load_pq_codebooks(spark, path: str):
    """Reload a saved PQ codebook artifact as the (m, k, d/m) array."""
    import numpy as np

    rows = spark.read.parquet(path).collect()
    m = 1 + max(r.subspace for r in rows)
    k = 1 + max(r.centroid_id for r in rows)
    dsub = len(rows[0].vec)
    B = np.zeros((m, k, dsub), dtype=np.float64)
    for r in rows:
        B[r.subspace, r.centroid_id] = r.vec
    return B


def ivf_pq_topk(emb: DataFrame, centroids: DataFrame, codebooks,
                query_vec, topk: int = 5, nprobe: int = 3,
                id_col: str = "vec_id", vec_col: str = "embedding",
                index: DataFrame | None = None,
                codes: DataFrame | None = None) -> DataFrame:
    """IVF-PQ serving: probe the ``nprobe`` nearest coarse cells
    (similarity.assign_cells index), then rank ONLY their members by
    PQ asymmetric distance — the full FAISS IVF-PQ layout, where the
    cell equi-join prunes the scan and the m-byte codes bound its
    memory. Returns (rk, neighbor_id, adc_dist).

    Pass prebuilt ``index`` (assign_cells output) and ``codes``
    (pq_encode output) for the serving path — both are
    persist-once/query-many artifacts; without them, one broadcast
    assignment pass + one map-only encode run inline. Cell choice uses
    the same cosine argmax as ivf_topk; candidate scoring is the
    pq_topk lookup-table gather restricted to probed cells. At 100 TB:
    store codes partitioned by cell so the probe equi-join prunes
    unread partitions at the scan.
    """
    import numpy as np

    from lightning_metastore_spark.operators.similarity import assign_cells

    if index is None:
        index = assign_cells(emb, centroids, id_col, vec_col)
    if codes is None:
        codes = pq_encode(emb, codebooks, id_col, vec_col)

    q = np.asarray(query_vec, dtype=np.float64)
    cents = {r["centroid_id"]: np.asarray(r[vec_col], dtype=np.float64)
             for r in centroids.collect()}
    qn = np.linalg.norm(q) or 1.0

    def _cos(c):
        n = np.linalg.norm(c) or 1.0
        return float(q @ c / (qn * n))
    probed = sorted(cents, key=lambda i: (-round(_cos(cents[i]), 9), i))
    probed = [int(c) for c in probed[:int(nprobe)]]

    members = (index.filter(F.col("cell").isin(probed))
               .select(F.col(id_col)))
    return pq_topk(codes.join(members, id_col), codebooks, query_vec,
                   topk=topk, id_col=id_col)
