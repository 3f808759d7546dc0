"""Reference-corpus language-model filtering (the CCNet pattern).

``functions.text.bigram_logprob`` scores a corpus under an LM fit on
ITSELF — good for outlier triage, wrong for the standard web-curation
recipe, which trains the LM on a trusted REFERENCE corpus (CCNet uses
Wikipedia) and scores the raw crawl against it, keeping docs below a
perplexity threshold. This module is that missing half: train a
bigram LM on a reference table, persist it as a parquet artifact, and
score any other corpus against the loaded artifact.

Smoothing contract (fixed, engine-portable):
``p(w_i | w_{i-1}) = lam * c2(w_{i-1} w_i)/c1(w_{i-1})    [0 if unseen]
                   + (1-lam) * (c1(w_i) + 1)/(N + V + 1)``
where c1/c2/N/V come from the REFERENCE corpus (V = its vocabulary
size). The add-1 unigram backoff keeps p > 0 for out-of-vocabulary
tokens, so every doc scores. Per-term evaluation is one
left-associated double expression (identical IEEE result in any
engine — the bigram_logprob discipline); per-doc sums are
DECIMAL(28,15) so partitioning cannot reorder float addition, and the
final mean is rounded to 9dp.

Scale design: training is two keyed count aggregations written
straight to parquet — the bigram relation NEVER lands on the driver
(at web scale it is corpus-sized; the artifact is a distributed
table, not a closure). Scoring broadcasts only the vocabulary-sized
unigram table; per-doc bigram tf joins the loaded bigram counts ON
THE BIGRAM KEY — the TF-IDF shuffle shape. Docs with fewer than 2
tokens have no bigrams and no output row (same contract as
bigram_logprob).

Reference parity note: the reference has no LM surface (SURVEY.md
§2); part of the driver-mandated LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                r"\s+").alias("t"))


def _bigrams(toks: DataFrame, id_col: str) -> DataFrame:
    return (toks.withColumn("m", F.size("t") - 1)
            .filter(F.col("m") >= 1)
            .select(F.col(id_col), F.explode(F.expr(
                "transform(sequence(1, m), "
                "i -> struct(t[i-1] AS prev, t[i] AS next))")).alias("b"))
            .select(F.col(id_col), F.col("b.prev").alias("prev"),
                    F.col("b.next").alias("next")))


def train_bigram_lm(ref: DataFrame, path: str, text_col: str = "text",
                    id_col: str = "doc_id") -> dict:
    """Fit bigram/unigram counts on the reference corpus and persist
    them under ``path`` (``uni/``, ``bi/`` parquet dirs + ``meta/``
    one-row totals). Returns {"n_total", "vocab"} for convenience —
    the counts themselves stay distributed end to end.
    """
    toks = _tokens(ref, text_col, id_col)
    uni = toks.select(F.explode("t").alias("token"))
    c1 = uni.groupBy("token").agg(F.count(F.lit(1)).alias("c1"))
    c1.write.mode("overwrite").parquet(f"{path}/uni")
    big = _bigrams(toks, id_col)
    (big.groupBy("prev", "next").agg(F.count(F.lit(1)).alias("c2"))
     .write.mode("overwrite").parquet(f"{path}/bi"))
    spark = ref.sparkSession
    c1s = spark.read.parquet(f"{path}/uni")
    stats = c1s.agg(F.sum("c1").alias("n"),
                    F.count(F.lit(1)).alias("v")).first()
    n_total, vocab = int(stats["n"] or 0), int(stats["v"])
    spark.createDataFrame([(n_total, vocab)],
                          "n_total long, vocab long") \
        .coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    return {"n_total": n_total, "vocab": vocab}


def score_with_bigram_lm(docs: DataFrame, path: str, lam: float = 0.7,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_terms, avg_logprob) for every doc with >= 2 tokens,
    under the SAVED reference LM (see the module smoothing contract).
    Threshold avg_logprob (or exp(-avg_logprob) as perplexity)
    downstream to keep reference-like text.
    """
    spark = docs.sparkSession
    c1 = spark.read.parquet(f"{path}/uni")
    c2 = spark.read.parquet(f"{path}/bi")
    meta = spark.read.parquet(f"{path}/meta").first()
    return score_with_counts(docs, c1, c2, int(meta["n_total"]),
                             int(meta["vocab"]), lam=lam,
                             text_col=text_col, id_col=id_col)


def perplexity_buckets(scored: DataFrame,
                       cuts: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
                       score_col: str = "avg_logprob",
                       group_col: str = "lang",
                       id_col: str = "doc_id") -> DataFrame:
    """CCNet head/middle/tail bucketing of a reference-LM-scored corpus.

    CCNet splits each language's crawl into three perplexity buckets —
    "head" (most Wikipedia-like), "middle", "tail" — and downstream
    recipes sample them at different rates. Input is any scored
    relation (e.g. ``score_with_bigram_lm`` output joined back to its
    group column); within each group docs are ranked by ``score_col``
    DESC (higher avg_logprob = lower perplexity = more reference-like)
    with ``id_col`` as the tie-break, and the top ``cuts[0]`` fraction
    is head, up to ``cuts[1]`` middle, the rest tail.

    Cross-engine determinism: the rank fraction is PERCENT_RANK over
    (group ORDER BY score DESC, id ASC) — exact integer-ratio
    arithmetic ((rank-1)/(n-1)), identical in any engine — rounded to
    9dp, and the cut comparison is strict ``<`` against cut values
    that callers should write as the same float expression in every
    engine (the default thirds are ``1.0/3.0`` / ``2.0/3.0``). A
    single-doc group has percent_rank 0 and buckets as head; NULL
    scores order last within their group (Spark's DESC default) and
    land in tail.

    Scale: ONE shuffle on the group key (the ``quantile_normalize``
    window shape); each window partition is a single group, so skew
    follows group sizes — sub-split ultra-hot groups upstream if one
    language dominates the corpus.
    """
    from pyspark.sql.window import Window as W

    lo, hi = float(cuts[0]), float(cuts[1])
    if not (0.0 < lo < hi <= 1.0):
        raise ValueError(f"cuts must satisfy 0 < head < middle <= 1, got {cuts}")
    w = (W.partitionBy(group_col)
         .orderBy(F.desc(score_col), F.asc(id_col)))
    pr = F.round(F.percent_rank().over(w), 9)
    out = scored.select(
        F.col(id_col), F.col(group_col), F.col(score_col),
        pr.alias("rank_frac"))
    bucket = (F.when(F.col("rank_frac") < F.lit(lo), F.lit("head"))
              .when(F.col("rank_frac") < F.lit(hi), F.lit("middle"))
              .otherwise(F.lit("tail")))
    return out.withColumn("bucket", bucket)


def score_with_counts(docs: DataFrame, c1: DataFrame, c2: DataFrame,
                      n_total: int, vocab: int, lam: float = 0.7,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Score against IN-MEMORY reference count relations (the loaded
    halves of a saved artifact, or counts built inline — e.g. the gate
    twin derives its reference from the corpus itself). Same plan and
    smoothing contract as ``score_with_bigram_lm``."""
    denom = float(n_total + vocab + 1)

    big = _bigrams(_tokens(docs, text_col, id_col), id_col)
    tf = big.groupBy(id_col, "prev", "next").agg(
        F.count(F.lit(1)).alias("tf"))
    cp = F.broadcast(c1.select(F.col("token").alias("prev"),
                               F.col("c1").alias("cp")))
    cn = F.broadcast(c1.select(F.col("token").alias("next"),
                               F.col("c1").alias("cn")))
    joined = (tf.join(c2, ["prev", "next"], "left")
              .join(cp, "prev", "left")
              .join(cn, "next", "left"))
    # left-associated exactly as the twin writes it; unseen bigram or
    # unseen prev contributes 0 to the lam term, OOV next counts 0
    lam_term = F.when(
        F.col("c2").isNotNull() & F.col("cp").isNotNull(),
        F.lit(float(lam)) * F.col("c2") / F.col("cp")).otherwise(F.lit(0.0))
    p = lam_term + (F.lit(1.0 - float(lam))
                    * (F.coalesce(F.col("cn"), F.lit(0)) + F.lit(1.0))
                    / F.lit(denom))
    scored = joined.withColumn(
        "term", (F.col("tf") * F.log(p)).cast("decimal(28,15)"))
    return (scored.groupBy(id_col)
            .agg(F.sum("tf").alias("n_terms"), F.sum("term").alias("s"))
            .select(F.col(id_col),
                    F.col("n_terms").cast("long").alias("n_terms"),
                    F.round(F.col("s").cast("double") / F.col("n_terms"), 9)
                    .alias("avg_logprob")))
