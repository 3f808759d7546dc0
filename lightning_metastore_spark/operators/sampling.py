"""Deterministic sampling operators for corpus mixture control.

Pre-training pipelines re-weight domains/languages to a target mixture
(e.g. up-weight books, down-weight boilerplate web). This module does
that with hash-thinning: every document's keep/drop decision is a pure
function of its id, so the sample is reproducible across runs, engines
and cluster layouts — no RNG state, no seeds to coordinate, and the
decision is a map-only expression at any corpus size.

Scale design: one tiny per-group count aggregate (groups = domains or
languages — dozens, not millions) broadcast back onto the corpus scan;
everything else is map-only JVM expressions.

Reference parity note: the reference has no sampling operators
(SURVEY.md §2.7); part of the driver-mandated LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HASH_SPACE = 4294967296.0  # 2^32: the first 8 md5 hex chars as uniform u32


def stratified_fixed_n(docs: DataFrame, n_per_group: int,
                       group_col: str = "lang", id_col: str = "doc_id",
                       salt: str = "strat") -> DataFrame:
    """Exactly min(n, |group|) rows per group, chosen by hash order:
    (doc_id, <group_col>, sample_rank).

    Rank docs within each group by md5("<salt>:<id>") (id tiebreak) and
    keep the first n — a deterministic uniform sample that is stable
    under corpus growth ONLY for the ranks that stay below n (carving
    eval sets before a re-crawl should pin ids instead). One window
    shuffle on the group key; groups are domains/languages, so per-group
    ordering state is the only memory cost — at extreme group skew,
    pre-filter with an approximate per-group rate then rank the
    survivors (rate * |g| >> n keeps recall exact).
    """
    from pyspark.sql.window import Window as W

    h = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    w = W.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (docs.select(F.col(id_col), F.col(group_col))
            .withColumn("sample_rank", F.row_number().over(w))
            .filter(F.col("sample_rank") <= n_per_group))


def mixture_resample(docs: DataFrame, weights: dict[str, float],
                     target_frac: float = 0.6,
                     group_col: str = "lang", id_col: str = "doc_id",
                     salt: str = "mix") -> DataFrame:
    """Resample a corpus toward a target group mixture, deterministically:
    (doc_id, <group_col>, keep_rate, kept).

    The target corpus size is ``target_frac * N``; group g should
    contribute ``weights[g]`` of it, so its per-doc keep rate is
    ``min(1, target_frac * N * w_g / n_g)`` (capped — a group cannot be
    up-sampled above 1x; real pipelines repeat epochs for that).
    Groups absent from ``weights`` get rate 0 (dropped).

    A doc is kept iff the first 8 hex chars of md5("<salt>:<id>") —
    a uniform 32-bit value — fall below ``rate * 2^32``, compared as
    zero-padded hex strings so the whole decision stays in string/int
    expressions any engine evaluates identically.
    """
    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_g"))
    total = docs.agg(F.count(F.lit(1)).alias("n_total"))
    wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    rate = F.least(
        F.lit(1.0),
        F.coalesce(wmap[F.col(group_col)], F.lit(0.0))
        * F.lit(target_frac) * F.col("n_total") / F.col("n_g"))
    threshold = F.lpad(F.lower(F.hex(F.floor(rate * F.lit(_HASH_SPACE))
                                     .cast("long"))), 8, "0")
    h = F.substring(
        F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))), 1, 8)
    kept = F.when(rate >= 1.0, F.lit(True)).otherwise(h < threshold)
    return (docs.join(F.broadcast(counts), group_col)
            .crossJoin(F.broadcast(total))
            .select(F.col(id_col), F.col(group_col),
                    F.round(rate, 6).alias("keep_rate"),
                    kept.alias("kept")))


def bucket_resample(bucketed: DataFrame,
                    rates: dict[str, float] | None = None,
                    bucket_col: str = "bucket", id_col: str = "doc_id",
                    salt: str = "bkt") -> DataFrame:
    """Per-bucket deterministic thinning — the terminal step of the
    CCNet recipe: score against a reference LM
    (``lm_filter.score_with_bigram_lm``), split per language into
    head/middle/tail (``lm_filter.perplexity_buckets``), then keep
    each bucket at its own rate (CCNet keeps all of head, some of
    middle, little of tail). ``rates`` defaults to
    {'head': 1.0, 'middle': 0.5, 'tail': 0.1}; buckets absent from it
    get rate 0 (dropped).

    Output: every input column + (keep_rate, kept). The keep decision
    is ``mixture_resample``'s engine-exact rule — the first 8 md5 hex
    chars of "<salt>:<id>" compared as zero-padded hex against
    ``rate * 2^32`` — so any engine reproduces it bit-for-bit.

    Scale: MAP-ONLY — the rate map is a compile-time literal, no
    aggregate, no shuffle; composes with the one group-key shuffle of
    ``perplexity_buckets`` upstream.
    """
    if rates is None:
        rates = {"head": 1.0, "middle": 0.5, "tail": 0.1}
    rmap = F.create_map(*[F.lit(x) for kv in rates.items() for x in kv])
    rate = F.coalesce(rmap[F.col(bucket_col)], F.lit(0.0))
    threshold = F.lpad(F.lower(F.hex(F.floor(rate * F.lit(_HASH_SPACE))
                                     .cast("long"))), 8, "0")
    h = F.substring(
        F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
        1, 8)
    kept = F.when(rate >= 1.0, F.lit(True)).otherwise(h < threshold)
    return (bucketed
            .withColumn("keep_rate", F.round(rate, 6))
            .withColumn("kept", kept))


def weighted_sample_n(docs: DataFrame, n: int, weight_col: str,
                      id_col: str = "doc_id",
                      salt: str = "wsample") -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    A-ES): each row draws a deterministic uniform u from
    md5("<salt>:<id>") and competes with key ``-ln(u) / weight`` —
    the n smallest keys win, giving inclusion probability proportional
    to weight, exactly, without coordination. The pre-training use:
    quality- or length-weighted corpus subsets that are bit-reproducible
    across runs and engines.

    Output: (doc_id, <weight_col>, sample_rank) for the n winners.

    100 TB shape: the key is a map-only expression; selection is a
    distributed TakeOrdered (each partition surfaces its n best, the
    driver merges n) — no global sort, no shuffle of the corpus. Keys
    round to 9dp with an id tiebreak so the ranking is engine-stable
    (the cosine discipline). Weights must be > 0 (any positive weight
    is a legal E-S input — quality scores in (0, 1] included);
    zero/negative weights are rejected (they would divide by zero or
    invert the key order).
    """
    u = ((F.conv(F.substring(
        F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
        1, 8), 16, 10).cast("double") + 1.0) / (_HASH_SPACE + 1.0))
    key = F.round(-F.log(u) / F.col(weight_col), 9)
    ranked = (docs.filter(F.col(weight_col) > 0)
              .select(F.col(id_col), F.col(weight_col),
                      key.alias("_k"))
              .orderBy(F.asc("_k"), F.asc(id_col))
              .limit(n))
    from pyspark.sql.window import Window as W

    w = W.orderBy(F.asc("_k"), F.asc(id_col))
    return (ranked.withColumn("sample_rank", F.row_number().over(w))
            .select(id_col, weight_col, "sample_rank"))


def quantile_normalize(df: DataFrame, value_col: str,
                       group_col: str, id_col: str = "doc_id") -> DataFrame:
    """Within-group percentile rank of ``value_col``:
    (id, group, value, pct_rank) with pct_rank in [0, 1].

    The mixture-control preprocessing step: raw quality/perplexity
    scores are NOT comparable across languages or domains (different
    scorers, different baselines), so per-group rank normalization puts
    every group on one scale before a global keep-threshold is applied.

    PERCENT_RANK over (group, value, id) — the id tiebreak makes ranks
    deterministic under ties. ONE shuffle on the group key; each window
    partition is a single group, so skew follows group sizes (salt or
    sub-split ultra-hot groups upstream if one group dominates the
    corpus).
    """
    from pyspark.sql.window import Window as W

    w = (W.partitionBy(group_col)
         .orderBy(F.asc(value_col), F.asc(id_col)))
    return df.select(
        F.col(id_col), F.col(group_col), F.col(value_col),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"))


def temperature_resample(docs: DataFrame, tau: float = 0.5,
                         target_frac: float = 0.6,
                         group_col: str = "lang", id_col: str = "doc_id",
                         salt: str = "temp") -> DataFrame:
    """Temperature-smoothed mixture resampling — the multilingual
    pre-training standard (XLM/mT5 exponentiated smoothing): group g's
    target share is proportional to ``share_g^tau``, flattening the
    head and up-weighting the tail as tau -> 0 (tau=1 keeps natural
    proportions; tau=0 is uniform). Returns
    (doc_id, <group_col>, keep_rate, kept) exactly like
    ``mixture_resample`` — same hash-thinned deterministic keep rule —
    but with the weight vector DERIVED from corpus counts instead of
    supplied.

    Cross-engine determinism contract: the smoothed weight is frozen
    into integer space as ``s_g = round(n_g^tau * 1e9)`` and every
    later step (normalization, rate, threshold) is fixed-order IEEE
    arithmetic on exact integers, so any engine reproduces the same
    keep decisions bit-for-bit. At tau=0.5 the power is computed as
    SQRT — IEEE-correctly-rounded everywhere, making even the
    exponentiation itself engine-exact (the ``temperature`` section of
    the ``sampling_quantize_suite`` gate pins this path against a
    DuckDB twin that mirrors the evaluation order below); other tau
    values rely on the 1e-9 rounding to absorb pow() ulp differences.

    Scale: one tiny per-group count aggregate (groups = dozens)
    broadcast back onto a map-only corpus scan — identical shape to
    ``mixture_resample``.
    """
    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_g"))
    pw = F.sqrt(F.col("n_g")) if tau == 0.5 \
        else F.pow(F.col("n_g"), F.lit(float(tau)))
    sg = F.round(pw * F.lit(1e9)).cast("long")
    weights = counts.withColumn("s_g", sg)
    tot = weights.agg(F.sum("s_g").alias("s_total"),
                      F.sum("n_g").alias("n_total"))
    # fixed evaluation order (mirrored by the DuckDB oracle):
    # t1 = s_g / s_total; t2 = target_frac * t1; t3 = t2 * N; rate = t3 / n_g
    rate = F.least(
        F.lit(1.0),
        F.lit(float(target_frac)) * (F.col("s_g") / F.col("s_total"))
        * F.col("n_total") / F.col("n_g"))
    threshold = F.lpad(F.lower(F.hex(F.floor(rate * F.lit(_HASH_SPACE))
                                     .cast("long"))), 8, "0")
    h = F.substring(
        F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
        1, 8)
    kept = F.when(rate >= 1.0, F.lit(True)).otherwise(h < threshold)
    return (docs.join(F.broadcast(weights), group_col)
            .crossJoin(F.broadcast(tot))
            .select(F.col(id_col), F.col(group_col),
                    F.round(rate, 6).alias("keep_rate"),
                    kept.alias("kept")))


def budget_select(docs: DataFrame, budget_tokens: int,
                  score_col: str, n_blocks: int = 64,
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Token-budget corpus selection — the step that turns per-doc
    quality scores into an actual training set: take documents in
    (score DESC, id) order while the running token total fits
    ``budget_tokens``. Returns
    (doc_id, score, n_tokens, cum_tokens, selected) for every doc WITH
    a non-NULL score (NULL scores are dropped — they cannot be placed
    in the score order; filter or impute upstream if they must
    participate), selected = cum_tokens <= budget (prefix-truncation
    selection: the first doc that overflows the budget ends the take —
    the standard data-mixing form; knapsack-style backfilling is
    deliberately NOT done, it destroys the score ordering's meaning).

    Scale design: a naive ``SUM() OVER (ORDER BY score)`` window is a
    SINGLE partition — the whole corpus through one task. This is the
    same two-phase distributed prefix sum as packing.packed_offsets,
    but over a VALUE ordering instead of an id ordering: APPROXIMATE
    percentile boundaries carve the score axis into <= ``n_blocks``
    score-disjoint blocks, per-block token sums prefix on the driver
    (a blocks-sized list), and the final cumulative total is an
    intra-block window (partitioned — parallel) plus the block's base.

    Approximate cuts do NOT approximate the result: block assignment
    uses strict comparisons against whatever cut values come back, so
    ANY cut set yields score-disjoint blocks whose concatenation in
    block order is exactly the global (score DESC, id) order (ties
    always share a block), and the per-block sums and intra-block
    window are exact — so ``cum_tokens`` equals the single-partition
    window bit-for-bit regardless of cut placement or partitioning.
    Approximation only moves block-size balance. ``approx_percentile``
    matters at scale: exact ``percentile`` buffers every value in one
    aggregation task — the one memory-unbounded step this operator
    exists to avoid. Two tiny driver actions (boundaries, block sums).
    """
    base = docs.filter(F.col(score_col).isNotNull()).select(
        F.col(id_col),
        F.col(score_col).cast("double").alias("score"),
        F.size(F.regexp_extract_all(
            F.coalesce(F.col(text_col), F.lit("")), F.lit(r"(\S+)"), 1))
        .cast("long").alias("n_tokens"))

    qs = ", ".join(str(i / n_blocks) for i in range(1, n_blocks))
    bounds = base.agg(
        F.expr(f"approx_percentile(score, array({qs}), 10000)")
        .alias("bs")).first()["bs"]
    cuts = sorted({float(b) for b in (bounds or [])})
    # block = number of boundaries strictly above the score: monotone
    # DECREASING in score (top scores -> block 0), equal scores share a
    # block, so blocks partition the (score DESC, id) order
    if cuts:
        exprs = [F.when(F.col("score") < F.lit(c), 1).otherwise(0)
                 for c in cuts]
        block = exprs[0]
        for e in exprs[1:]:
            block = block + e
    else:
        block = F.lit(0)
    blocked = base.withColumn("block", block)

    sums = {int(r["block"]): int(r["s"]) for r in
            blocked.groupBy("block")
            .agg(F.sum("n_tokens").alias("s")).collect()}
    running, bases = 0, {}
    for b in sorted(sums):
        bases[b] = running
        running += sums[b]
    base_map = F.create_map(*[F.lit(x) for b in bases
                              for x in (b, bases[b])])

    from pyspark.sql.window import Window as W

    w = (W.partitionBy("block")
         .orderBy(F.desc("score"), F.col(id_col))
         .rowsBetween(W.unboundedPreceding, 0))
    cum = (F.coalesce(base_map[F.col("block")], F.lit(0))
           + F.sum("n_tokens").over(w)).cast("long")
    return (blocked
            .withColumn("cum_tokens", cum)
            .select(id_col, "score", "n_tokens", "cum_tokens",
                    (F.col("cum_tokens") <= F.lit(int(budget_tokens)))
                    .alias("selected")))


def epoch_schedule(docs: DataFrame, tau: float = 0.5,
                   target_frac: float = 1.0,
                   group_col: str = "lang",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-group epoch plan for UP-sampled mixtures — the half of the
    mixture story ``temperature_resample`` deliberately caps away: when
    a group's temperature-smoothed target exceeds its size, training
    repeats it for whole epochs plus one hash-thinned partial pass
    (the Llama/GPT "epochs per dataset" table). Returns one row per
    group: (group, n_g, target_docs, n_epochs, residual_rate) where
    ``target_g = target_frac * share_tau_g * N``,
    ``n_epochs = floor(target_g / n_g)`` full passes and
    ``residual_rate = target_g / n_g - n_epochs`` is the keep rate for
    the final partial pass (feed it to the same md5-threshold rule as
    ``mixture_resample``; a down-sampled group is simply n_epochs=0 +
    residual). target_docs is the rounded per-group document count.

    The smoothed share uses the SAME integer-frozen math as
    ``temperature_resample`` (s_g = round(n_g^tau * 1e9), sqrt at
    tau=0.5), so the two operators describe one consistent mixture and
    both are engine-exact.

    Scale: one tiny per-group count aggregate + one scalar total —
    output is group-cardinality (dozens of rows), broadcast-sized by
    construction. The schedule is a PLAN; materializing repeats is the
    training loader's job (a corpus-side union per epoch would just
    multiply storage).
    """
    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_g"))
    pw = F.sqrt(F.col("n_g")) if tau == 0.5 \
        else F.pow(F.col("n_g"), F.lit(float(tau)))
    weights = counts.withColumn(
        "s_g", F.round(pw * F.lit(1e9)).cast("long"))
    tot = weights.agg(F.sum("s_g").alias("s_total"),
                      F.sum("n_g").alias("n_total"))
    target = (F.lit(float(target_frac))
              * (F.col("s_g") / F.col("s_total")) * F.col("n_total"))
    # decompose the 9dp-ROUNDED per-doc factor: an integer-frozen share
    # can land at (k - 1ulp), which must mean k full epochs + residual
    # 0, never (k-1) epochs + residual 1.0 — rounding first makes the
    # boundary engine-stable (the module's 9dp discipline)
    per_doc = F.round(target / F.col("n_g"), 9)
    return (weights.crossJoin(F.broadcast(tot))
            .select(F.col(group_col),
                    F.col("n_g").cast("long").alias("n_g"),
                    F.round(target).cast("long").alias("target_docs"),
                    F.floor(per_doc).cast("long").alias("n_epochs"),
                    F.round(per_doc - F.floor(per_doc), 9)
                    .alias("residual_rate"))
            .orderBy(group_col))


def dsir_select(raw: DataFrame, target: DataFrame, n: int,
                n_buckets: int = 4096, text_col: str = "text",
                id_col: str = "doc_id", salt: str = "dsir") -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    2023): pick the ``n`` raw-corpus documents whose hashed-unigram
    language-model likelihood ratio says they look most like a small
    TARGET corpus, by Gumbel-top-k over the per-doc importance weight.
    Returns (doc_id, log_weight, sample_rank) for the winners, where
    log_weight = Σ_tokens [ln p_target(bucket) − ln p_raw(bucket)]
    under add-1-smoothed bucket unigram models (9dp, frozen — below).

    The method in its published form samples WITHOUT replacement with
    probability ∝ w(x); Gumbel-top-k (key = log w + Gumbel noise) is
    the standard exact implementation, and the noise here is the
    module's deterministic md5 hash-uniform, so selection is
    reproducible across runs, engines and layouts.

    Determinism contract: bucket counts are exact integer aggregates;
    the (n_buckets)-row log-ratio table is computed ONCE driver-side
    and frozen to integer 1e-9 units (the transcendental ln happens on
    dozens-of-KB of counts, not per token); each doc's log-weight is
    then an exact int64 sum of those integers. The Gumbel key adds
    -ln(-ln(u)) JVM-side and is rounded to 9dp with an id tiebreak
    before ranking (the cosine discipline — ulp differences in ln are
    absorbed except on measure-zero boundaries).

    100 TB shape: two token-count aggregates whose outputs are
    n_buckets rows — the raw-side counts are an eager action (the
    ratio table must exist before the scoring plan), so the raw
    corpus IS scanned twice (count pass + scoring pass; persist the
    tokenized relation upstream to pay the second scan from cache
    when that matters) — then ONE broadcast join of the KB-sized
    ratio table onto the raw token stream, one id-key aggregation for
    log-weights, and a distributed TakeOrdered for the top n — no
    global sort, nothing driver-side scales with the corpus. The target corpus is small by definition
    (it is the thing you can curate by hand).
    """
    import math

    def counts(df: DataFrame):
        toks = df.select(
            F.explode(F.split(F.lower(F.coalesce(F.col(text_col),
                                                 F.lit(""))), r"\s+"))
            .alias("token"))
        b = (F.conv(F.substring(F.md5("token"), 1, 3), 16, 10)
             .cast("long") % n_buckets)
        return {int(r["bucket"]): int(r["c"]) for r in
                toks.select(b.alias("bucket"))
                .groupBy("bucket").agg(F.count(F.lit(1)).alias("c"))
                .collect()}

    ct, cr = counts(target), counts(raw)
    nt, nr = sum(ct.values()) + n_buckets, sum(cr.values()) + n_buckets
    ratio = [(j, round((math.log((ct.get(j, 0) + 1) / nt)
                        - math.log((cr.get(j, 0) + 1) / nr)) * 1e9))
             for j in range(n_buckets)]
    spark = raw.sparkSession
    lr = spark.createDataFrame(ratio, "bucket long, lr long")

    toks = raw.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.coalesce(F.col(text_col),
                                             F.lit(""))), r"\s+"))
        .alias("token"))
    bucket = (F.conv(F.substring(F.md5("token"), 1, 3), 16, 10)
              .cast("long") % n_buckets)
    lw = (toks.select(F.col(id_col), bucket.alias("bucket"))
          .join(F.broadcast(lr), "bucket")
          .groupBy(id_col)
          .agg(F.sum("lr").alias("lw_int")))

    u = ((F.conv(F.substring(
        F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
        1, 8), 16, 10).cast("double") + 1.0) / (_HASH_SPACE + 1.0))
    gumbel = -F.log(-F.log(u))
    key = F.round(F.col("lw_int") * F.lit(1e-9) + gumbel, 9)
    ranked = (lw.select(F.col(id_col),
                        F.round(F.col("lw_int") * F.lit(1e-9), 9)
                        .alias("log_weight"),
                        key.alias("_k"))
              .orderBy(F.desc("_k"), F.asc(id_col))
              .limit(int(n)))
    from pyspark.sql.window import Window as W

    w = W.orderBy(F.desc("_k"), F.asc(id_col))
    return (ranked.withColumn("sample_rank", F.row_number().over(w))
            .select(id_col, "log_weight", "sample_rank"))
