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

    for _ in range(n_iter):
        rows = (base.mapInPandas(make_pass(V, mean),
                                 schema="dim long, j long, val double")
                .groupBy("dim", "j").agg(F.sum("val").alias("y"))
                .collect())
        Y = np.zeros((d, k))
        for r in rows:
            Y[int(r["dim"]), int(r["j"])] = r["y"]
        V, _ = np.linalg.qr(Y)

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
