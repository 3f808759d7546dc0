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
                    id_col: str = "doc_id", min_count: int = 1,
                    vocab_min_count: int = 1) -> dict:
    """Fit bigram/unigram counts on the reference corpus and persist
    them under ``path`` (``uni/``, ``bi/`` parquet dirs + ``meta/``
    one-row totals). Returns {"n_total", "vocab"} for convenience —
    the counts themselves stay distributed end to end.

    ``min_count`` prunes bigram rows with c2 < min_count (KenLM-style
    artifact-size cap: a pruned bigram scores through the unigram
    backoff, exactly like a never-seen one). ``vocab_min_count``
    prunes unigram rows BEFORE the n_total/vocab stats are computed,
    so the artifact stays self-consistent — a pruned token is simply
    OOV to the model — and the broadcast side of
    ``score_with_counts`` is capped at the kept vocabulary.
    """
    toks = _tokens(ref, text_col, id_col)
    uni = toks.select(F.explode("t").alias("token"))
    c1 = uni.groupBy("token").agg(F.count(F.lit(1)).alias("c1"))
    if int(vocab_min_count) > 1:
        c1 = c1.filter(F.col("c1") >= int(vocab_min_count))
    c1.write.mode("overwrite").parquet(f"{path}/uni")
    big = _bigrams(toks, id_col)
    c2 = big.groupBy("prev", "next").agg(F.count(F.lit(1)).alias("c2"))
    if int(min_count) > 1:
        c2 = c2.filter(F.col("c2") >= int(min_count))
    c2.write.mode("overwrite").parquet(f"{path}/bi")
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
    smoothing contract as ``score_with_bigram_lm``.

    The vocabulary-sized unigram relation is broadcast ONCE and joined
    twice (prev-side and next-side) through aliases over the same
    projection — Spark's ReuseExchange collapses the two into a single
    BroadcastExchange + ReusedExchange (plan-pinned in
    test_plan_quality), halving the r11 double-broadcast footprint;
    ``train_bigram_lm(vocab_min_count=...)`` caps the relation itself.
    """
    denom = float(n_total + vocab + 1)

    big = _bigrams(_tokens(docs, text_col, id_col), id_col)
    tf = big.groupBy(id_col, "prev", "next").agg(
        F.count(F.lit(1)).alias("tf"))
    cb = F.broadcast(c1.select("token", "c1"))
    cp = cb.alias("_cp")
    cn = cb.alias("_cn")
    joined = (tf.join(c2, ["prev", "next"], "left")
              .join(cp, F.col("prev") == F.col("_cp.token"), "left")
              .join(cn, F.col("next") == F.col("_cn.token"), "left")
              .select(F.col(id_col), F.col("tf"), F.col("c2"),
                      F.col("_cp.c1").alias("cp"),
                      F.col("_cn.c1").alias("cn")))
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


# ---------------------------------------------------------------------------
# Order-n Kneser-Ney reference LM (the published CCNet filter is a
# 5-gram KenLM; this is the same model family, Spark-native)
# ---------------------------------------------------------------------------

def _ngrams(toks: DataFrame, id_col: str, n: int) -> DataFrame:
    """Explode (id, tokens[]) into full n-gram windows (w1..wn) —
    positions with complete history only, so a doc needs >= n tokens
    to emit anything (generalizes ``_bigrams``, which is n=2)."""
    fields = ", ".join(f"t[i-2+{j}] AS w{j}" for j in range(1, n + 1))
    return (toks.withColumn("m", F.size("t") - (n - 1))
            .filter(F.col("m") >= 1)
            .select(F.col(id_col), F.explode(F.expr(
                f"transform(sequence(1, m), i -> struct({fields}))"))
                .alias("g"))
            .select(F.col(id_col),
                    *[F.col(f"g.w{j}").alias(f"w{j}")
                      for j in range(1, n + 1)]))


def train_kn_lm(ref: DataFrame, path: str, order: int = 3,
                min_count: int = 1, discount: float | str = 0.75,
                text_col: str = "text", id_col: str = "doc_id") -> dict:
    """Fit an interpolated Kneser-Ney LM of the given ``order`` on the
    reference corpus and persist it under ``path`` as distributed
    parquet relations — the KenLM artifact shape, Spark-native.

    Model contract (fixed, engine-portable — the DuckDB gate twin and
    the pytest twin replay it bit-for-bit):

    - Top level: raw ``order``-gram counts ``c_n(w1..wn)``, pruned to
      ``c >= min_count`` (KenLM-style size cap; a pruned n-gram backs
      off exactly like an unseen one).
    - Lower levels use CONTINUATION counts chained one order up
      (Chen & Goodman): ``kc_k(u) = |{a : kc_{k+1}(a.u) > 0}|``, i.e.
      each level-k table is a row count of the level-(k+1) table
      grouped by its last k words, derived from the PRUNED top table
      so the artifact is self-consistent.
    - Context normalizers per level: ``ctx_j`` groups the level-(j+1)
      table by its first j words into (s = sum of counts, f = number
      of distinct followers).
    - Probability (absolute discount D = ``discount``, interpolated):

      ``p_1(w)   = max(kc_1(w) - D, 0)/T + D*U/T * 1/(V+1)``
      ``p_k(w|h) = max(c_k(hw) - D, 0)/s(h) + D*f(h)/s(h) * p_{k-1}``
                   [= p_{k-1} when the context h is unseen]

      where T = sum of continuation-unigram counts, U = number of
      continuation-unigram types, V = the RAW reference vocabulary
      (distinct tokens). The uniform 1/(V+1) floor keeps p > 0 for
      OOV tokens so every doc scores (KenLM reserves <unk> mass the
      same way). ``discount="auto"`` estimates D from the top-order
      count-of-counts exactly as Ney/KenLM do — D = n1/(n1 + 2*n2)
      where n1/n2 are the numbers of top-order n-grams seen once/
      twice (falling back to 0.75 when either is 0, e.g. a tiny or
      fully-duplicated reference). The estimate is two integers
      pushed through one fixed float expression, so it is as
      deterministic as a literal; whichever way D is obtained it is
      FROZEN into the artifact meta, which is what keeps the per-term
      expression one left-associated double chain that any engine
      reproduces bit-for-bit.

    Scale: every table is a keyed count aggregation written straight
    to parquet — the n-gram relation NEVER lands on the driver (at web
    scale it is corpus-sized). Each lower level derives from the level
    above it by one further group-by, so training is ``order`` keyed
    shuffles over progressively smaller relations. Only the one-row
    meta stats are collected.

    Returns {"order", "vocab", "u_types", "t_total"}.
    """
    n = int(order)
    if n < 2:
        raise ValueError(f"order must be >= 2, got {order}")
    auto_discount = isinstance(discount, str)
    if auto_discount and discount != "auto":
        raise ValueError(f"discount must be a float or 'auto', "
                         f"got {discount!r}")
    if not auto_discount and not (0.0 < float(discount) < 1.0):
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    spark = ref.sparkSession
    toks = _tokens(ref, text_col, id_col)

    top = (_ngrams(toks, id_col, n)
           .groupBy(*[f"w{j}" for j in range(1, n + 1)])
           .agg(F.count(F.lit(1)).alias("c")))
    if int(min_count) > 1:
        top = top.filter(F.col("c") >= int(min_count))
    top.write.mode("overwrite").parquet(f"{path}/o{n}")
    if auto_discount:
        # Ney absolute-discount estimate from the top-order
        # count-of-counts (KenLM's default): D = n1 / (n1 + 2*n2) —
        # two integers through one fixed float expression
        cc = (spark.read.parquet(f"{path}/o{n}")
              .agg(F.coalesce(F.sum(F.when(F.col("c") == 1, 1)
                                    .otherwise(0)), F.lit(0)).alias("n1"),
                   F.coalesce(F.sum(F.when(F.col("c") == 2, 1)
                                    .otherwise(0)), F.lit(0)).alias("n2"))
              .first())
        n1, n2 = int(cc["n1"]), int(cc["n2"])
        discount = (n1 / (n1 + 2.0 * n2)
                    if n1 > 0 and n2 > 0 else 0.75)

    # chained continuation counts: level k = the level-(k+1) table
    # grouped by its LAST k words (keys are unique, so COUNT(*) is
    # the number of distinct left extensions)
    for k in range(n - 1, 0, -1):
        lv = spark.read.parquet(f"{path}/o{k + 1}")
        (lv.groupBy(*[F.col(f"w{j + 1}").alias(f"w{j}")
                      for j in range(1, k + 1)])
         .agg(F.count(F.lit(1)).alias("c"))
         .write.mode("overwrite").parquet(f"{path}/o{k}"))

    # context normalizers: ctx_j from level j+1, keyed on the first j
    # words — (s, f) drive the discount mass at lookup time
    for j in range(1, n):
        lv = spark.read.parquet(f"{path}/o{j + 1}")
        (lv.groupBy(*[f"w{i}" for i in range(1, j + 1)])
         .agg(F.sum("c").alias("s"), F.count(F.lit(1)).alias("f"))
         .write.mode("overwrite").parquet(f"{path}/ctx{j}"))

    vocab = int(toks.select(F.explode("t").alias("tok"))
                .agg(F.count_distinct("tok").alias("v")).first()["v"] or 0)
    o1 = spark.read.parquet(f"{path}/o1")
    st = o1.agg(F.coalesce(F.sum("c"), F.lit(0)).alias("t"),
                F.count(F.lit(1)).alias("u")).first()
    t_total, u_types = int(st["t"]), int(st["u"])
    if t_total == 0:
        raise ValueError(
            f"train_kn_lm: reference corpus has no {n}-grams "
            f"(every doc shorter than order={n}?)")
    spark.createDataFrame(
        [(n, float(discount), int(min_count), vocab, u_types, t_total)],
        "order long, discount double, min_count long, vocab long, "
        "u_types long, t_total long") \
        .coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    return {"order": n, "vocab": vocab, "u_types": u_types,
            "t_total": t_total}


def score_with_kn_lm(docs: DataFrame, path: str, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_terms, avg_logprob) for every doc with >= order
    tokens, under a SAVED Kneser-Ney artifact (``train_kn_lm``).
    Same output schema and determinism discipline as
    ``score_with_bigram_lm`` — DECIMAL(28,15) per-doc sums, 9dp mean.
    """
    spark = docs.sparkSession
    meta = spark.read.parquet(f"{path}/meta").first()
    n = int(meta["order"])
    tables = {f"o{k}": spark.read.parquet(f"{path}/o{k}")
              for k in range(1, n + 1)}
    tables.update({f"ctx{j}": spark.read.parquet(f"{path}/ctx{j}")
                   for j in range(1, n)})
    return score_with_kn_tables(
        docs, tables, order=n, discount=float(meta["discount"]),
        vocab=int(meta["vocab"]), u_types=int(meta["u_types"]),
        t_total=int(meta["t_total"]), text_col=text_col, id_col=id_col)


def score_with_kn_tables(docs: DataFrame, tables: dict, order: int,
                         discount: float, vocab: int, u_types: int,
                         t_total: int, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Score against IN-MEMORY KN count relations (the loaded halves
    of a saved artifact, or counts built inline — the gate twin
    derives its reference from the corpus itself).

    Plan shape: the doc n-gram tf relation left-joins each level's
    count table on that level's suffix key and each context table on
    its context key — the deepest joins shuffle on n-gram-type keys
    (the TF-IDF shape, scale-safe at any corpus size); the two
    vocabulary-sized relations (o1, ctx1) are broadcast. The per-term
    probability is ONE left-associated double expression built bottom
    up through the backoff chain, so any engine reproduces it
    bit-for-bit given the same integer counts.
    """
    n = int(order)
    D = float(discount)
    T = float(t_total)
    u_floor = D * float(u_types) / T / (float(vocab) + 1.0)

    tf = (_ngrams(_tokens(docs, text_col, id_col), id_col, n)
          .groupBy(id_col, *[f"w{j}" for j in range(1, n + 1)])
          .agg(F.count(F.lit(1)).alias("tf")))

    joined = tf
    # base level: continuation unigram on the LAST word — vocab-sized,
    # broadcast
    o1 = tables["o1"].select(F.col("w1").alias(f"w{n}"),
                             F.col("c").alias("c_1"))
    joined = joined.join(F.broadcast(o1), f"w{n}", "left")
    p = (F.greatest(F.coalesce(F.col("c_1"), F.lit(0)) - F.lit(D),
                    F.lit(0.0)) / F.lit(T)) + F.lit(u_floor)

    for k in range(2, n + 1):
        # level-k counts join on doc positions (n-k+1 .. n); its
        # context stats on (n-k+1 .. n-1)
        pos = list(range(n - k + 1, n + 1))
        ok = tables[f"o{k}"].select(
            *[F.col(f"w{j}").alias(f"w{pos[j - 1]}")
              for j in range(1, k + 1)],
            F.col("c").alias(f"c_{k}"))
        cpos = pos[:-1]
        cx = tables[f"ctx{k - 1}"].select(
            *[F.col(f"w{j}").alias(f"w{cpos[j - 1]}")
              for j in range(1, k)],
            F.col("s").alias(f"s_{k - 1}"), F.col("f").alias(f"f_{k - 1}"))
        if k == 2:
            # bigram continuation context is keyed on ONE word —
            # vocab-sized, broadcast like o1
            cx = F.broadcast(cx)
        joined = (joined
                  .join(ok, [f"w{j}" for j in pos], "left")
                  .join(cx, [f"w{j}" for j in cpos], "left"))
        s = F.col(f"s_{k - 1}")
        disc = (F.greatest(F.coalesce(F.col(f"c_{k}"), F.lit(0))
                           - F.lit(D), F.lit(0.0)) / s)
        p = F.when(s.isNotNull(),
                   disc + F.lit(D) * F.col(f"f_{k - 1}") / s * p
                   ).otherwise(p)

    scored = joined.withColumn(
        "term", (F.col("tf") * F.log(p)).cast("decimal(28,15)"))
    return (scored.groupBy(id_col)
            .agg(F.sum("tf").alias("n_terms"), F.sum("term").alias("s"))
            .select(F.col(id_col),
                    F.col("n_terms").cast("long").alias("n_terms"),
                    F.round(F.col("s").cast("double") / F.col("n_terms"), 9)
                    .alias("avg_logprob")))


def score_with_reference_lm(docs: DataFrame, path: str, lam: float = 0.7,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Score docs under EITHER saved reference-LM artifact layout —
    the bigram/Jelinek-Mercer one (``train_bigram_lm``; ``lam``
    applies) or the order-n Kneser-Ney one (``train_kn_lm``; ``lam``
    ignored) — detected from the meta schema. This is the loader
    curate_corpus and the streaming ingest rejector share, so swapping
    the model family is a retrain, not a pipeline change."""
    meta_df = docs.sparkSession.read.parquet(f"{path}/meta")
    if "order" in meta_df.columns:
        return score_with_kn_lm(docs, path, text_col=text_col,
                                id_col=id_col)
    return score_with_bigram_lm(docs, path, lam=lam, text_col=text_col,
                                id_col=id_col)
