"""Distributed training for the hashed-feature quality classifier.

``functions.text.classifier_score`` is the INFERENCE half of the
fastText-style quality filter every pretraining pipeline runs (a tiny
linear model over hashed token buckets, broadcast onto the token
stream). This module supplies the TRAINING half: full-batch logistic
regression by gradient descent, expressed as DataFrame programs whose
distributed reductions are exact — so training is reproducible
bit-for-bit across partitionings, cluster layouts and engines.

Determinism contract (the module's integer/decimal freezing
discipline, same as sampling.temperature_resample):

- weights live in INTEGER milli-units ``m`` (w = m/1000) — the exact
  shape ``classifier_weights`` uses, so a trained table drops into
  ``classifier_score(weights=...)`` unchanged;
- the per-doc margin is an exact int64 sum Σ m·tf over the doc's
  buckets (weights integer, counts integer — order-independent);
- the only transcendental (sigmoid) happens per doc and its result is
  frozen to 9dp before anything sums over it; the per-doc gradient
  factor err/n_d is frozen to INTEGER 1e-12 units via exact double
  steps (e9 = err·1e9 is an exact small integer; e9·1000/n_d is one
  correctly-rounded IEEE division — identical on any engine — then
  one HALF_UP to integer), so the bucket gradient Σ f_d·tf is an
  exact DECIMAL(38,0) integer sum — order-independent and
  overflow-safe at corpus scale;
- the weight step runs on the driver over the (n_buckets)-row gradient
  vector with plain deterministic Python arithmetic.

Scale design: features build ONCE — one (id, bucket)-key aggregation
of the token stream, persisted id-partitioned. Each GD iteration is
(a) one broadcast join of the KB-sized weight table onto the feature
relation + an id-key aggregate for margins, (b) one id-key join of the
per-doc error back onto the SAME id-partitioned features (no new
shuffle of the big side), (c) one bucket-key aggregate whose output is
n_buckets rows — the only driver traffic. Nothing driver-side ever
scales with the corpus; iterations scale linearly and are typically
single-digit.

Reference parity note: the reference has no ML training surface
(SURVEY.md §2); part of the driver-mandated LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lightning_metastore_spark.functions.text import (
    CLASSIFIER_BUCKETS,
    classifier_feature_stream,
)


def _features(docs: DataFrame, n_buckets: int, text_col: str,
              id_col: str, word_ngrams: int = 1) -> DataFrame:
    """(id, bucket, tf) hashed bag-of-features — built on the SAME
    ``classifier_feature_stream`` classifier_score uses (md5 first 3
    hex mod n_buckets; word_ngrams adds fastText-style hashed word
    n-grams into the same bucket space), so trained weights serve that
    inference path unchanged."""
    feats = classifier_feature_stream(
        docs, n_buckets, text_col=text_col, id_col=id_col,
        word_ngrams=word_ngrams, null_text_as_empty=True)
    return (feats.groupBy(id_col, "bucket")
            .agg(F.count(F.lit(1)).alias("tf")))


def train_logreg_classifier(docs: DataFrame, label_col: str,
                            iters: int = 8, lr: float = 1.0,
                            n_buckets: int = CLASSIFIER_BUCKETS,
                            text_col: str = "text",
                            id_col: str = "doc_id",
                            word_ngrams: int = 1) -> DataFrame:
    """Train integer-milli-unit logistic-regression weights:
    (bucket, m) with one row per bucket 0..n_buckets-1.

    ``label_col`` must be 0/1 (cast to double; NULL-label docs are
    dropped under the same documented contract as budget_select's NULL
    scores — they cannot contribute a gradient). Features are x_j =
    tf_j / n_d, matching classifier_score's mean-bucket-weight margin
    m·tf / (1000·n_d), so sigmoid(margin) from the trained table IS
    the model's probability. Weights start at 0 (p=0.5 everywhere) and
    take ``iters`` full-batch steps m -= round(lr·1000·grad); there is
    no regularization term — at corpus scale n_docs dwarfs n_buckets,
    and keeping the step integer-exact is worth more than shrinkage
    (clip inputs upstream if a bucket explodes).

    ``word_ngrams`` >= 2 trains over fastText-style hashed word-bigram
    (and higher) features in the same bucket space — inference MUST
    pass the same word_ngrams (the shared-hashing contract; the saved
    artifact records it and classifier_score validates).

    Every distributed reduction is exact (int64 / DECIMAL on frozen
    9dp/12dp factors — see the module docstring), so the returned
    table is bit-identical at any partition count; the pytest twin
    replays the whole loop in pure Python.
    """
    labeled = docs.filter(F.col(label_col).isNotNull()).select(
        F.col(id_col),
        F.col(label_col).cast("double").alias("y"))
    feats = _features(
        docs.filter(F.col(label_col).isNotNull()),
        n_buckets, text_col, id_col, word_ngrams=word_ngrams)
    # one id-key shuffle, reused by every iteration's margin agg + join
    feats = feats.repartition(F.col(id_col)).persist()
    nd = feats.groupBy(id_col).agg(F.sum("tf").alias("n_d"))

    spark = docs.sparkSession
    m = [0] * n_buckets
    try:
        for _ in range(int(iters)):
            w = spark.createDataFrame(
                [(j, int(mj)) for j, mj in enumerate(m)],
                "bucket long, m long")
            margins = (feats.join(F.broadcast(w), "bucket")
                       .groupBy(id_col)
                       .agg(F.sum(F.col("m") * F.col("tf")).alias("s"))
                       .join(nd, id_col).join(labeled, id_col))
            p = 1.0 / (1.0 + F.exp(-(F.col("s").cast("double")
                                     / F.lit(1000.0) / F.col("n_d"))))
            # e9: err frozen to 9dp then scaled to an EXACT integer;
            # f: one IEEE division + one HALF_UP -> err/n_d in integer
            # 1e-12 units (every engine computes the identical double)
            e9 = F.round(F.round(p - F.col("y"), 9) * F.lit(1e9)) \
                .cast("long")
            err = (margins.select(
                F.col(id_col),
                F.round(e9 * F.lit(1000.0) / F.col("n_d"))
                .cast("long").alias("f")))
            grads = {int(r["bucket"]): int(r["g"]) for r in
                     (feats.join(err, id_col)
                      .groupBy("bucket")
                      .agg(F.sum(F.col("f").cast("decimal(38,0)")
                                 * F.col("tf")).alias("g"))
                      .collect())}
            for j, g in grads.items():
                m[j] = m[j] - round(float(lr) * (g * 1e-12) * 1000.0)
    finally:
        feats.unpersist()
    return spark.createDataFrame(
        [(j, int(mj)) for j, mj in enumerate(m)],
        "bucket long, m long")


def save_classifier_weights(spark, weights: DataFrame, path: str,
                            n_buckets: int | None = None,
                            word_ngrams: int | None = None) -> None:
    """Persist a trained weight table as a single-file parquet
    artifact. When given, ``n_buckets``/``word_ngrams`` are stored as
    constant metadata columns (schema v2) — classifier_score validates
    them against its parameters at inference time, so a mismatched
    n_buckets can never silently drop buckets through the inner join
    (r11 ADVICE). v1 artifacts (bucket, m only) keep loading."""
    out = weights.select("bucket", "m")
    if n_buckets is not None:
        out = out.withColumn("n_buckets", F.lit(int(n_buckets)))
    if word_ngrams is not None:
        out = out.withColumn("word_ngrams", F.lit(int(word_ngrams)))
    out.coalesce(1).write.mode("overwrite").parquet(path)


def load_classifier_weights(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)
