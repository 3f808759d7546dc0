"""Text-analysis column functions for training-data pipelines.

Every function here is a pure JVM-side column expression (regexp /
collection functions — zero Python UDFs), so they run inside
whole-stage codegen and scale linearly with the corpus: at 100 TB these
are single-scan map-only transforms with no shuffle at all.

Functions:
- token_count         whitespace tokens + a BPE-ish subword regex count
- quality_features    length / punctuation / stopword / repetition ratios
                      + composite quality score
- lang_id             deterministic marker-token + script heuristic
- fingerprint         md5 of whitespace-normalized lowercase text
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

# Marker stopwords per language for the n-gram/marker heuristic. These
# are standard high-frequency function words; scoring = count of marker
# hits per language, argmax with a fixed precedence order.
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans"],
    "es": ["el", "los", "las", "y", "es", "una", "que"],
}

_STOPWORDS = _LANG_MARKERS["en"]

# BPE-ish subword segmentation: word-initial chunk of up to 4 chars then
# continuation chunks of up to 4 chars, digits and punctuation as their
# own tokens. A cheap, deterministic proxy for BPE token counting.
_BPE_ISH = r"[A-Za-z]{1,4}|[0-9]|[^\sA-Za-z0-9]"


def token_count_cols(text: Column) -> list[Column]:
    ws = F.size(F.regexp_extract_all(text, F.lit(r"(\S+)"), 1)).alias("n_tokens")
    bpe = F.size(F.regexp_extract_all(text, F.lit(f"({_BPE_ISH})"), 1)).alias("n_subwords")
    return [ws, bpe]


def token_counts(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_chars, n_tokens, n_subwords) — map-only."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        *token_count_cols(t),
    )


def quality_features(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features + composite score in [0, 1].

    Heuristics mirror common LLM-corpus filters: doc length, mean word
    length, stopword density, punctuation density, and the ratio of
    distinct to total tokens (repetition penalty). The score is a
    clamped linear blend — deterministic, engine-portable arithmetic.
    """
    t = F.lower(F.col(text_col))
    toks = F.split(t, r"\s+")
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    stop_arr = F.array(*[F.lit(s) for s in _STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"([^\w\s])"), 1))
    n_distinct = F.size(F.array_distinct(toks))
    stop_ratio = n_stop / n_tokens
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    distinct_ratio = n_distinct / n_tokens
    avg_token_len = (n_chars - (n_tokens - 1)) / n_tokens
    length_score = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    score = (F.lit(0.35) * length_score
             + F.lit(0.25) * distinct_ratio
             + F.lit(0.25) * F.least(stop_ratio * 4, F.lit(1.0))
             + F.lit(0.15) * (F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0))))
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(avg_token_len, 6).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


# the eight Gopher quality-rule stop words (Rae et al. 2021, App. A1.1)
_GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_quality_rules(docs: DataFrame, text_col: str = "text",
                         id_col: str = "doc_id",
                         min_words: int = 50, max_words: int = 100_000,
                         min_mean_word_len: float = 3.0,
                         max_mean_word_len: float = 10.0,
                         max_symbol_ratio: float = 0.1,
                         max_bullet_frac: float = 0.9,
                         max_ellipsis_frac: float = 0.3,
                         min_alpha_frac: float = 0.8,
                         min_stop_words: int = 2) -> DataFrame:
    """The Gopher document quality rules (Rae et al. 2021, Appendix
    A1.1) as pure JVM column expressions — the published filter set
    that, with the C4 URL rule and the Gopher repetition filters
    (`repetition_features`), completes the standard web-corpus recipe
    stack (FineWeb = C4 + Gopher subsets):

    1. word count in [min_words, max_words]
    2. mean word length in [3, 10] characters
    3. symbol-to-word ratio (# / ellipsis) < 0.1
    4. < 90% of lines starting with a bullet character
    5. < 30% of lines ending with an ellipsis
    6. > 80% of words containing an alphabetic character
    7. >= 2 distinct Gopher stop words present

    Returns per-doc signals (ratios rounded to 6dp; the keep decision
    is computed on the UNROUNDED values — all integer-ratio doubles,
    so engine-portable exactly) plus the composite ``gopher_keep``.
    Map-only: one scan, zero shuffles, whole-stage-codegen throughout.
    """
    raw = F.coalesce(F.col(text_col), F.lit(""))  # NULL doc = empty doc
    t = F.lower(raw)
    words = F.filter(F.split(t, r"\s+"), lambda x: x != "")
    n_words = F.size(words)
    nw = F.greatest(n_words, F.lit(1))
    sum_len = F.aggregate(words, F.lit(0),
                          lambda acc, x: acc + F.length(x))
    mean_word_len = sum_len / nw
    n_symbols = F.size(F.regexp_extract_all(
        raw, F.lit(r"(#|\.\.\.|…)"), 1))
    symbol_ratio = n_symbols / nw
    lines = F.split(raw, r"\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_frac = F.size(F.filter(
        lines, lambda x: x.rlike(r"^\s*[•‣▪\-\*]"))) / n_lines
    ellipsis_frac = F.size(F.filter(
        lines, lambda x: x.rlike(r"(\.\.\.|…)\s*$"))) / n_lines
    alpha_frac = F.size(F.filter(
        words, lambda x: x.rlike("[a-z]"))) / nw
    stop_arr = F.array(*[F.lit(s) for s in _GOPHER_STOPS])
    n_stop = F.size(F.array_intersect(F.array_distinct(words), stop_arr))
    keep = ((n_words >= min_words) & (n_words <= max_words)
            & (mean_word_len >= min_mean_word_len)
            & (mean_word_len <= max_mean_word_len)
            & (symbol_ratio < max_symbol_ratio)
            & (bullet_frac < max_bullet_frac)
            & (ellipsis_frac < max_ellipsis_frac)
            & (alpha_frac > min_alpha_frac)
            & (n_stop >= min_stop_words))
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_word_ratio"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_line_frac"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        n_stop.alias("n_stop_present"),
        keep.alias("gopher_keep"),
    )


def lang_id(docs: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """(doc_id, pred_lang) — marker-token + CJK-script heuristic.

    CJK codepoints force 'zh'; otherwise the language with the highest
    marker-token count wins, ties broken by the fixed order en>de>fr>es,
    and zero hits everywhere → 'und'. Fully deterministic and expressible
    identically in any SQL engine (the oracle mirrors this CASE chain).
    """
    t = F.lower(F.col(text_col))
    toks = F.split(t, r"\s+")
    counts = {}
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        counts[lang] = F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))
    cjk = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"([一-鿿])"), 1))
    best = F.greatest(*counts.values())
    pred = (
        F.when(cjk > 0, F.lit("zh"))
        .when(best == 0, F.lit("und"))
        .when(counts["en"] == best, F.lit("en"))
        .when(counts["de"] == best, F.lit("de"))
        .when(counts["fr"] == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return docs.select(F.col(id_col), pred.alias("pred_lang"))


_PII_PATTERNS = [
    (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b(?:\+?1[\s.\-]?)?\(?\d{3}\)?[\s.\-]\d{3}[\s.\-]\d{4}\b", "<PHONE>"),
    (r"\b(?:\d[ \-]?){13,16}\b", "<CARD>"),
]


def redact_pii(col: Column) -> Column:
    """Chain of regexp_replace passes masking emails/SSNs/phones/card
    numbers — the standard pre-training scrub, entirely JVM-side."""
    out = col
    for pat, repl in _PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def tfidf_top_terms(docs: DataFrame, k: int = 3, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Top-k TF-IDF terms per document: (doc_id, rk, token, tfidf).

    tf = in-doc count; idf = ln((N+1)/(df+1)) + 1 (smoothed); score
    rounded to 9dp before ranking (with a token tiebreak) for
    engine-stable ordering. Two shuffles: per-(doc,token) counts and the
    token document-frequency join; df is a broadcast-sized table for
    any real vocabulary.
    """
    from pyspark.sql.window import Window as W

    toks = docs.select(F.col(id_col),
                       F.explode(F.split(F.lower(F.col(text_col)), r"\s+"))
                       .alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = (tf.groupBy("token")
             .agg(F.countDistinct(id_col).alias("df_t")))
    n_docs = docs.select(F.countDistinct(id_col).alias("n_docs"))
    scored = (tf.join(F.broadcast(dfreq), "token")
              .crossJoin(F.broadcast(n_docs))
              .withColumn(
                  "tfidf",
                  F.round(F.col("tf") * (F.log((F.col("n_docs") + 1)
                                               / (F.col("df_t") + 1)) + 1), 9)))
    w = W.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("token"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select(id_col, "rk", "token", "tfidf"))


def unigram_logprob(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_tokens, avg_logprob) — mean unigram log-probability of
    each document under the corpus unigram distribution: the classic
    cheap perplexity-filter proxy (very low scores = gibberish, very
    high = degenerate repetition of frequent tokens).

    Two aggregations (corpus token counts are vocabulary-sized ->
    broadcast to the scoring join). Per-doc summation of ln values is
    made order-independent by summing DECIMAL(28,15)-cast terms — each
    ln term is the identical IEEE double in any engine, decimal addition
    is exact, so results are bit-stable on any partitioning.
    """
    toks = docs.select(F.col(id_col),
                       F.explode(F.split(F.lower(F.col(text_col)), r"\s+"))
                       .alias("token"))
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    corpus = toks.groupBy("token").agg(F.count(F.lit(1)).alias("ctf"))
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    lp = F.log(F.col("ctf") / F.col("n_total"))
    scored = (tf.join(F.broadcast(corpus), "token")
              .crossJoin(F.broadcast(total))
              .withColumn("term", (F.col("tf") * lp).cast("decimal(28,15)")))
    return (scored.groupBy(id_col)
            .agg(F.sum("tf").alias("n_tokens"),
                 F.sum("term").alias("lp_sum"))
            .select(id_col, F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.round(F.col("lp_sum").cast("double") / F.col("n_tokens"), 9)
                    .alias("avg_logprob")))


def repetition_features(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition quality signals per document.

    Columns (fractions rounded to 6dp, engine-portable arithmetic):
    - n_words / n_distinct_words
    - distinct_word_ratio      n_distinct / n_words
    - dup_word_char_frac       fraction of word characters belonging to
                               words that occur more than once
    - top_2gram_char_frac      characters covered by the single most
                               repeated word 2-gram (count x length,
                               counting only 2-grams that occur more
                               than once), over the document's total
                               characters — max over the product, so
                               no mode tie-break is needed
    - dup_2gram_char_frac      fraction of 2-gram characters inside
                               2-grams occurring more than once
    - word_entropy             Shannon entropy (nats) of the in-doc
                               unigram distribution: ln(N) - sum(c ln c)/N
    - is_repetitive            composite flag (the Gopher-repetition
                               reject rule shape)

    Scale: two explode + keyed aggregations (words, 2-grams) — the
    TF-shape shuffle that map-side combines to one row per (doc, term);
    per-doc entropy terms are summed as DECIMAL(28,15) so the result is
    bit-stable on any partitioning (each c*ln(c) term is the identical
    IEEE double everywhere; decimal addition is exact and
    order-independent).
    """
    t = F.lower(F.col(text_col))
    toks = docs.select(F.col(id_col), F.length(F.col(text_col)).alias("n_chars"),
                       F.split(t, r"\s+").alias("toks"))

    occ = toks.select(F.col(id_col), F.explode("toks").alias("w"))
    wc = occ.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("c"))
    wstats = (wc.groupBy(id_col).agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.sum(F.col("c") * F.length("w")).alias("wchars"),
        F.sum(F.when(F.col("c") > 1, F.col("c") * F.length("w"))
              .otherwise(F.lit(0))).alias("dup_wchars"),
        F.sum((F.col("c") * F.log("c")).cast("decimal(28,15)")).alias("clnc")))

    grams = (toks.withColumn("m", F.size("toks") - 1)
             .filter(F.col("m") >= 1)
             .select(F.col(id_col),
                     F.explode(F.expr(
                         "transform(arrays_zip(slice(toks, 1, m), "
                         "slice(toks, 2, m)), s -> concat(s['0'], ' ', s['1']))"
                     )).alias("g")))
    gc = grams.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    gstats = (gc.groupBy(id_col).agg(
        F.max(F.when(F.col("c") > 1, F.col("c") * F.length("g"))
              .otherwise(F.lit(0))).alias("top_gchars"),
        F.sum(F.col("c") * F.length("g")).alias("gchars"),
        F.sum(F.when(F.col("c") > 1, F.col("c") * F.length("g"))
              .otherwise(F.lit(0))).alias("dup_gchars")))

    base = (toks.select(F.col(id_col), "n_chars")
            .join(wstats, id_col)
            .join(gstats, id_col, "left"))
    distinct_ratio = F.col("n_distinct_words") / F.col("n_words")
    dup_word_frac = F.col("dup_wchars") / F.col("wchars")
    top_gram_frac = F.coalesce(F.col("top_gchars") / F.col("n_chars"), F.lit(0.0))
    dup_gram_frac = F.coalesce(F.col("dup_gchars") / F.col("gchars"), F.lit(0.0))
    entropy = (F.log("n_words")
               - F.col("clnc").cast("double") / F.col("n_words"))
    is_rep = ((dup_gram_frac > 0.4) | (top_gram_frac > 0.06)
              | (distinct_ratio < 0.3))
    return base.select(
        F.col(id_col),
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_distinct_words").cast("long").alias("n_distinct_words"),
        F.round(distinct_ratio, 6).alias("distinct_word_ratio"),
        F.round(dup_word_frac, 6).alias("dup_word_char_frac"),
        F.round(top_gram_frac, 6).alias("top_2gram_char_frac"),
        F.round(dup_gram_frac, 6).alias("dup_2gram_char_frac"),
        F.round(entropy, 6).alias("word_entropy"),
        is_rep.alias("is_repetitive"),
    )


def fingerprint(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """(doc_id, fp) — md5 over whitespace-normalized lowercase text.

    The canonical cheap document fingerprint for exact-dup detection at
    scale; grouping on fp instead of text keeps shuffle rows tiny.
    """
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return docs.select(F.col(id_col), F.md5(norm).alias("fp"))


def bigram_logprob(docs: DataFrame, lam: float = 0.7,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_terms, avg_logprob) — mean log-probability of each
    document under an interpolated bigram LM fit on the corpus itself:
    p(w_i | w_{i-1}) = lam * c(w_{i-1} w_i)/c(w_{i-1})
                     + (1-lam) * c(w_i)/N.
    The KenLM-style perplexity-filter signal (CCNet thresholds a 5-gram
    model; a 2-gram keeps the identical distributed shape — n-gram
    counts are one keyed aggregation, scoring one keyed join).

    100 TB shape: the unigram table is vocabulary-sized (broadcast);
    the bigram count table is NOT broadcastable at scale, so scoring
    joins per-doc bigram tf against it ON THE BIGRAM KEY — the TF-IDF
    shuffle shape. Docs with fewer than 2 tokens have no bigrams and no
    output row (filter upstream or coalesce downstream).

    Determinism: per-term doubles are identical in any engine (same
    left-associated expression); the per-doc sum is DECIMAL(28,15) so
    partitioning cannot reorder floating-point addition.
    """
    toks = docs.select(F.col(id_col),
                       F.split(F.lower(F.col(text_col)), r"\s+").alias("t"))
    uni = toks.select(F.col(id_col), F.explode("t").alias("token"))
    c1 = uni.groupBy("token").agg(F.count(F.lit(1)).alias("c1"))
    total = uni.agg(F.count(F.lit(1)).alias("n_total"))
    big = (toks.withColumn("m", F.size("t") - 1)
           .filter(F.col("m") >= 1)
           .select(F.col(id_col), F.explode(F.expr(
               "transform(sequence(1, m), "
               "i -> struct(t[i-1] AS prev, t[i] AS next))")).alias("b"))
           .select(F.col(id_col), F.col("b.prev").alias("prev"),
                   F.col("b.next").alias("next")))
    c2 = big.groupBy("prev", "next").agg(F.count(F.lit(1)).alias("c2"))
    tf = big.groupBy(id_col, "prev", "next").agg(
        F.count(F.lit(1)).alias("tf"))
    cp = F.broadcast(c1.select(F.col("token").alias("prev"),
                               F.col("c1").alias("cp")))
    cn = F.broadcast(c1.select(F.col("token").alias("next"),
                               F.col("c1").alias("cn")))
    # left-associated exactly as the SQL oracle writes it:
    # (lam*c2)/cp + ((1-lam)*cn)/N — same IEEE doubles in any engine
    p = (F.lit(lam) * F.col("c2") / F.col("cp")
         + F.lit(1.0 - lam) * F.col("cn") / F.col("n_total"))
    scored = (tf.join(c2, ["prev", "next"])
              .join(cp, "prev").join(cn, "next")
              .crossJoin(F.broadcast(total))
              .withColumn("term",
                          (F.col("tf") * F.log(p)).cast("decimal(28,15)")))
    return (scored.groupBy(id_col)
            .agg(F.sum("tf").alias("n_terms"), F.sum("term").alias("s"))
            .select(F.col(id_col),
                    F.col("n_terms").cast("long").alias("n_terms"),
                    F.round(F.col("s").cast("double") / F.col("n_terms"), 9)
                    .alias("avg_logprob")))


CLASSIFIER_BUCKETS = 4096


def classifier_weights(spark, n_buckets: int = CLASSIFIER_BUCKETS):
    """Deterministic stand-in for a trained linear model's weight
    table: bucket -> integer weight in [-1000, 999] (w = m/1000). A
    real fastText-style model loads its trained vector here instead —
    the SHAPE (a small table broadcast onto the token stream) is the
    production inference pattern.
    """
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        (F.conv(F.substring(F.md5(F.concat(F.lit("w:"),
                                           F.col("id").cast("string"))),
                            1, 4), 16, 10).cast("long") % 2000
         - 1000).alias("m"))


CLASSIFIER_NGRAM_SEP = "\x01"


def classifier_feature_stream(docs: DataFrame,
                              n_buckets: int = CLASSIFIER_BUCKETS,
                              text_col: str = "text",
                              id_col: str = "doc_id",
                              word_ngrams: int = 1,
                              null_text_as_empty: bool = False) -> DataFrame:
    """(id, bucket) hashed feature stream — THE single hashing
    contract shared by training (operators/classifier._features) and
    inference (classifier_score), so trained weights always serve the
    inference path unchanged: md5 first 3 hex of the lowercased
    whitespace token, mod n_buckets.

    ``word_ngrams`` >= 2 adds hashed word n-gram features into the
    SAME bucket space — fastText's defining trick (wordNgrams=2 is
    its quality-classifier default; unigram buckets alone under-fit
    short docs where word order carries the signal). An n-gram's hash
    token is the member words joined on \\x01 (a char the whitespace
    tokenizer can never emit inside a token), so "a b" can't collide
    with the single token "ab" by construction.

    ``null_text_as_empty`` preserves the two call sites' historical
    NULL contracts: training coalesces NULL text to "" (the doc keeps
    its label and contributes one ''-token feature); inference drops
    NULL-text docs (no tokens, no score row).
    """
    base = (F.coalesce(F.col(text_col), F.lit(""))
            if null_text_as_empty else F.col(text_col))
    toks = docs.select(F.col(id_col),
                       F.split(F.lower(base), r"\s+").alias("t"))
    streams = [toks.select(F.col(id_col), F.explode("t").alias("token"))]
    for g in range(2, int(word_ngrams) + 1):
        parts = ", ".join(f"t[i-2+{j}]" for j in range(1, g + 1))
        grams = (toks.withColumn("m", F.size("t") - (g - 1))
                 .filter(F.col("m") >= 1)
                 .select(F.col(id_col), F.explode(F.expr(
                     f"transform(sequence(1, m), "
                     f"i -> concat_ws('{CLASSIFIER_NGRAM_SEP}', {parts}))"))
                     .alias("token")))
        streams.append(grams)
    out = streams[0]
    for s in streams[1:]:
        out = out.unionByName(s)
    bucket = (F.conv(F.substring(F.md5("token"), 1, 3), 16, 10)
              .cast("long") % int(n_buckets))
    return out.select(F.col(id_col), bucket.alias("bucket"))


def _validate_weight_meta(weights: DataFrame, n_buckets: int,
                          word_ngrams: int) -> DataFrame:
    """Versioned-artifact check: v2 weight tables carry constant
    n_buckets/word_ngrams columns (save_classifier_weights); a
    mismatch with the caller's parameters would silently drop
    out-of-range buckets through the inner join and skew every score,
    so it raises instead. v1 tables (bucket, m only) pass through —
    old artifacts keep loading."""
    row = None
    if "n_buckets" in weights.columns or "word_ngrams" in weights.columns:
        row = weights.select(
            *[c for c in ("n_buckets", "word_ngrams")
              if c in weights.columns]).first()
    if row is not None:
        saved_b = int(row["n_buckets"]) if "n_buckets" in weights.columns \
            else None
        saved_g = int(row["word_ngrams"]) \
            if "word_ngrams" in weights.columns else None
        if saved_b is not None and saved_b != int(n_buckets):
            raise ValueError(
                f"classifier weights were trained with n_buckets="
                f"{saved_b} but n_buckets={n_buckets} was requested")
        if saved_g is not None and saved_g != int(word_ngrams):
            raise ValueError(
                f"classifier weights were trained with word_ngrams="
                f"{saved_g} but word_ngrams={word_ngrams} was requested")
    return weights.select("bucket", "m")


def classifier_score(docs: DataFrame, n_buckets: int = CLASSIFIER_BUCKETS,
                     text_col: str = "text",
                     id_col: str = "doc_id",
                     weights: DataFrame | None = None,
                     word_ngrams: int = 1) -> DataFrame:
    """(doc_id, n_terms, score) — linear text classifier inference as a
    DataFrame program (the fastText quality-classifier shape used to
    filter pretraining corpora): tokens hash into ``n_buckets`` feature
    buckets, the weight table broadcasts onto the token stream, and the
    document score is sigmoid(mean bucket weight).

    ``weights`` may supply a TRAINED (bucket, m) table — e.g. from
    ``operators.classifier.train_logreg_classifier``, which uses the
    identical token hashing (``classifier_feature_stream``) — in place
    of the deterministic stand-in from ``classifier_weights``. A
    versioned artifact carrying n_buckets/word_ngrams metadata is
    validated against the parameters here (mismatch raises).
    ``word_ngrams`` >= 2 adds fastText-style hashed word-bigram (and
    higher) features; n_terms then counts ALL features, not tokens.

    100 TB shape: map-only expression per token + ONE broadcast join
    (the model is KBs) + one per-doc aggregation — no shuffle beyond
    the final doc agg. Weights are integers m (w = m/1000), so the
    per-doc sum is exact in DECIMAL and partition-order-stable.
    """
    spark = docs.sparkSession
    w = (_validate_weight_meta(weights, n_buckets, word_ngrams)
         if weights is not None
         else classifier_weights(spark, n_buckets))
    feats = classifier_feature_stream(
        docs, n_buckets, text_col=text_col, id_col=id_col,
        word_ngrams=word_ngrams, null_text_as_empty=False)
    agg = (feats
           .join(F.broadcast(w), "bucket")
           .groupBy(id_col)
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum(F.col("m").cast("decimal(28,15)")).alias("s")))
    score = 1.0 / (1.0 + F.exp(-(F.col("s").cast("double")
                                 / F.lit(1000.0) / F.col("n"))))
    return agg.select(F.col(id_col), F.col("n").cast("long").alias("n_terms"),
                      F.round(score, 9).alias("score"))


VOCAB_SIZE = 256


def build_vocab(docs: DataFrame, vocab_size: int = VOCAB_SIZE,
                text_col: str = "text") -> DataFrame:
    """(token, token_id) — the top-``vocab_size`` corpus tokens by
    frequency, ids 1..V assigned in (count DESC, token ASC) order; id 0
    is reserved for OOV at encode time.

    100 TB shape: one token aggregation (map-side combined) followed by
    a distributed TakeOrdered top-V — the global (count, token) sort
    only ever materializes V rows. The final row_number window runs on
    those V rows (a broadcast-sized relation), not the corpus.
    """
    toks = docs.select(
        F.explode(F.regexp_extract_all(F.lower(F.col(text_col)),
                                       F.lit(r"(\S+)"), 1)).alias("token"))
    top = (toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
           .orderBy(F.desc("cnt"), F.asc("token")).limit(vocab_size))
    w = W.orderBy(F.desc("cnt"), F.asc("token"))
    return top.select("token", F.row_number().over(w).alias("token_id"))


def encode_token_stats(docs: DataFrame, vocab_size: int = VOCAB_SIZE,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Tokenizer-application stats per document: encode every token to
    its vocab id (OOV -> 0) and aggregate
    ``(doc_id, n_tokens, n_oov, oov_frac, n_distinct_ids,
    ids_checksum)`` where ``ids_checksum = SUM(pos * token_id)`` over
    1-based positions — a deterministic fingerprint of the full encoded
    id SEQUENCE (order-sensitive), so the oracle hash check covers the
    actual encoding, not just counts.

    100 TB shape: map-only position fan-out + ONE broadcast join against
    the KB-sized vocab + one per-doc aggregation. Emitting the id
    arrays themselves (``collect_list`` over pos) is the same plan; the
    checksum keeps gate output compact. Docs with zero tokens keep a
    row (left join from the id spine, zero-filled).
    """
    vocab = build_vocab(docs, vocab_size, text_col)
    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.regexp_extract_all(F.lower(F.col(text_col)),
                                          F.lit(r"(\S+)"), 1))
        .alias("pos", "token"))
    enc = (toks.join(F.broadcast(vocab), "token", "left")
           .withColumn("tid", F.coalesce("token_id", F.lit(0))))
    agg = (enc.groupBy(id_col)
           .agg(F.count(F.lit(1)).alias("n_tokens"),
                F.sum((F.col("tid") == 0).cast("long")).alias("n_oov"),
                F.countDistinct("tid").alias("n_distinct_ids"),
                F.sum((F.col("pos") + 1) * F.col("tid")).alias("ids_checksum")))
    return (docs.select(id_col).join(agg, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("n_tokens", F.lit(0)).cast("long")
                    .alias("n_tokens"),
                    F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
                    F.when(F.coalesce("n_tokens", F.lit(0)) == 0, F.lit(0.0))
                    .otherwise(F.round(F.col("n_oov") / F.col("n_tokens"), 9))
                    .alias("oov_frac"),
                    F.coalesce("n_distinct_ids", F.lit(0)).cast("long")
                    .alias("n_distinct_ids"),
                    F.coalesce("ids_checksum", F.lit(0)).cast("long")
                    .alias("ids_checksum")))


BM25_QUERY = ("query", "join", "vector", "stream")


def bm25_scores(docs: DataFrame, query_terms: tuple = BM25_QUERY,
                k1: float = 1.2, b: float = 0.75, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Per-document BM25 relevance against a fixed query — the
    retrieval-ranking primitive (Lucene's variant:
    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))``, tf saturation ``k1``,
    length normalization ``b``). Returns
    ``(doc_id, n_terms, score)`` for EVERY document (zero-filled when
    no query term occurs); ``n_terms`` counts query-term occurrences.

    100 TB shape: the token stream is filtered to the query terms
    BEFORE any aggregation (map-only, the stream shrinks to query-hit
    rows), document length is a map-only ``size()`` on the scan (NO
    token explode or per-doc agg for lengths), corpus stats (N, avgdl)
    are one scalar agg broadcast back, and the df relation is
    query-sized (broadcast). Per-doc sums are DECIMAL-accumulated so
    scores are partition-order-stable and engine-reproducible.
    """
    tok_arr = F.regexp_extract_all(F.lower(F.col(text_col)),
                                   F.lit(r"(\S+)"), 1)
    # doc length without exploding: map-only, and doubles as the id
    # spine (every doc keeps a row; NULL text must count as dl=0 like
    # the explode-based formulation did — size(NULL) is NULL/-1)
    dl = docs.select(
        F.col(id_col),
        F.greatest(F.coalesce(F.size(tok_arr), F.lit(0)), F.lit(0))
        .alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("n_docs"),
                   F.avg("dl").alias("avgdl"))
    hits = (docs.select(F.col(id_col), F.explode(tok_arr).alias("token"))
            .filter(F.col("token").isin(*query_terms)))
    tf = hits.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    df = hits.groupBy("token").agg(F.countDistinct(id_col).alias("df"))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    denom = (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    term = (idf * F.col("tf") * (k1 + 1.0) / denom).cast("decimal(28,15)")
    scored = (tf.join(F.broadcast(df), "token")
              .join(dl, id_col)
              .crossJoin(F.broadcast(stats))
              .withColumn("term", term))
    agg = (scored.groupBy(id_col)
           .agg(F.sum("tf").alias("n_terms"),
                F.sum("term").alias("s")))
    return (dl.select(id_col).join(agg, id_col, "left")
            .select(F.col(id_col),
                    F.coalesce("n_terms", F.lit(0)).cast("long")
                    .alias("n_terms"),
                    F.round(F.coalesce(F.col("s").cast("double"), F.lit(0.0)),
                            9).alias("score")))


def zipf_fit(docs: DataFrame, top_v: int = 256, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Corpus-level Zipf's-law fit + vocabulary totals, one output row:
    (grp, slope, intercept, r2, n_types, n_tokens, ttr).

    Least-squares fit of ln(freq) on ln(rank) over the ``top_v`` most
    frequent tokens (freq desc, token tiebreak). Corpus curators use the
    slope (Zipfian text ~ -1) as a generation/degeneracy probe: template
    or machine-looped corpora flatten (slope -> 0) or steepen sharply.

    Scale shape: one token aggregation (the TF relation); the fit runs
    on the top-``top_v`` rows only — TakeOrdered brings back a bounded
    set, so the global rank window is over <= top_v rows by
    construction, never the vocabulary. n_types/n_tokens come from the
    same TF relation (count + exact long sum). ln terms are rounded to
    9dp then DECIMAL(28,15)-summed, so every sum is exact and
    partition-order independent (the cross-engine-stability pattern
    used throughout this module).
    """
    t = F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token")
    toks = docs.select(t)
    tf = toks.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    top = tf.orderBy(F.desc("freq"), F.asc("token")).limit(top_v)
    w = W.orderBy(F.desc("freq"), F.asc("token"))  # bounded: <= top_v rows
    ranked = top.select("freq", F.row_number().over(w).alias("rank"))
    x = F.round(F.log(F.col("rank").cast("double")), 9)
    y = F.round(F.log(F.col("freq").cast("double")), 9)
    dec = lambda c: c.cast("decimal(28,15)")  # noqa: E731
    s = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(dec(x)).cast("double").alias("sx"),
        F.sum(dec(y)).cast("double").alias("sy"),
        F.sum(dec(x * y)).cast("double").alias("sxy"),
        F.sum(dec(x * x)).cast("double").alias("sxx"),
        F.sum(dec(y * y)).cast("double").alias("syy"))
    tot = tf.agg(F.count(F.lit(1)).cast("long").alias("n_types"),
                 F.sum("freq").cast("long").alias("n_tokens"))
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov / varx
    return (s.crossJoin(F.broadcast(tot)).select(
        F.lit(0).cast("long").alias("grp"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6)
        .alias("intercept"),
        F.round(cov * cov / (varx * vary), 6).alias("r2"),
        F.col("n_types"),
        F.col("n_tokens"),
        F.round(F.col("n_types").cast("double") / F.col("n_tokens"), 9)
        .alias("ttr")))


# mojibake marker sequences: UTF-8 bytes of common Latin-1/Win-1252
# characters re-decoded as Latin-1 ("Ã©" = 'é' mangled,
# "â€" = the first two chars of mangled curly punctuation)
_MOJIBAKE_SEQS = ("Ã©", "â€")
_CTRL_RE = r"[\x00-\x08\x0b-\x1f\x7f]"
_NONASCII_RE = r"[^\x00-\x7f]"


def encoding_anomalies(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Per-doc encoding-health probe: (doc_id, n_replacement, n_ctrl,
    mojibake_hits, nonascii_frac, is_suspect) — the ftfy-ish triage a
    web-corpus pipeline runs before spending tokenizer cycles.

    n_replacement counts U+FFFD (decoder already gave up), n_ctrl counts
    C0/C1-ish control characters (binary junk in 'text'), mojibake_hits
    counts the classic UTF-8-as-Latin-1 double-encoding digraphs.
    Map-only length arithmetic over replace/regexp_replace — zero
    shuffles, engine-portable integer math.
    """
    t = F.col(text_col)
    n = F.length(t)
    n_repl = n - F.length(F.replace(t, F.lit("�"), F.lit("")))
    n_ctrl = n - F.length(F.regexp_replace(t, _CTRL_RE, ""))
    moji = sum(
        ((n - F.length(F.replace(t, F.lit(s), F.lit("")))) / len(s)
         ).cast("long")
        for s in _MOJIBAKE_SEQS)
    nonascii = n - F.length(F.regexp_replace(t, _NONASCII_RE, ""))
    return docs.select(
        F.col(id_col),
        n_repl.cast("long").alias("n_replacement"),
        n_ctrl.cast("long").alias("n_ctrl"),
        moji.alias("mojibake_hits"),
        F.round(nonascii.cast("double") / F.greatest(n, F.lit(1)), 6)
        .alias("nonascii_frac"),
        ((n_repl > 0) | (n_ctrl > 0) | (moji > 0)).alias("is_suspect"))


def domain_profile(docs: DataFrame, min_avg_quality: float = 0.5,
                   text_col: str = "text", id_col: str = "doc_id",
                   domain_col: str = "source",
                   lang_col: str = "lang") -> DataFrame:
    """Per-domain curation profile: (source, n_docs, sum_chars,
    avg_quality, n_langs, domain_keep) — the domain-level filter pass
    (RefinedWeb/C4-style source blocklisting by aggregate quality).

    One hash aggregation keyed by domain (domains ≪ documents, so the
    output is broadcast-sized); per-doc quality comes from
    ``quality_features`` (map-only). avg_quality sums the 6dp-rounded
    per-doc scores as DECIMAL(28,15) — exact, partition-stable — then
    divides by the count.
    """
    q = quality_features(docs, text_col, id_col).select(id_col,
                                                        "quality_score")
    per_doc = docs.select(F.col(id_col), F.col(domain_col),
                          F.col(lang_col),
                          F.length(F.col(text_col)).alias("n_chars")) \
        .join(q, id_col)
    agg = (per_doc.groupBy(domain_col)
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("sum_chars"),
                F.sum(F.col("quality_score").cast("decimal(28,15)"))
                .cast("double").alias("q_sum"),
                F.countDistinct(lang_col).cast("long").alias("n_langs")))
    avg_q = F.round(F.col("q_sum") / F.col("n_docs"), 6)
    return agg.select(
        F.col(domain_col), "n_docs", "sum_chars",
        avg_q.alias("avg_quality"), "n_langs",
        (avg_q >= F.lit(float(min_avg_quality))).alias("domain_keep"))


def phrase_search(docs: DataFrame, phrase: str, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Exact-phrase retrieval via a positional inverted index:
    (doc_id, n_hits, first_pos) for documents containing the
    whitespace-tokenized ``phrase`` as adjacent lowercase tokens.

    Plan: posexplode the token stream, KEEP ONLY the phrase's terms
    (the inverted-index posting-list read — Catalyst pushes the isin
    filter into the scan projection), then chain m-1 keyed equi-joins
    ``pos_i = pos_0 + i`` on (doc_id, position) — the standard
    positional-index phrase intersection. Each join's inputs are
    posting-list-sized, never the corpus; positions ride along so no
    re-tokenization happens after the explode.
    """
    terms = [t for t in phrase.lower().split() if t]
    if not terms:
        raise ValueError("empty phrase")
    toks = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), r"\s+"))
        .alias("pos", "token"))
    posting = toks.filter(F.col("token").isin(*set(terms)))
    m = (posting.filter(F.col("token") == terms[0])
         .select(id_col, F.col("pos").alias("p0")))
    for i, term in enumerate(terms[1:], start=1):
        pi = (posting.filter(F.col("token") == term)
              .select(F.col(id_col), (F.col("pos") - i).alias("p0")))
        m = m.join(pi, [id_col, "p0"])
    return (m.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_hits"),
                 F.min("p0").cast("long").alias("first_pos")))


# entity patterns shared by the extractor and the gate oracle — plain
# RE2/Java-compatible syntax (no lookaround), so both engines count
# identically
_ENTITY_PATTERNS = {
    "n_emails": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "n_urls": r"https?://[^\s]+",
    "n_dates": r"\d{4}-\d{2}-\d{2}",
    "n_numbers": r"\b\d+\.?\d*\b",
}


def entity_counts(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Per-doc surface-entity census: (doc_id, n_emails, n_urls,
    n_dates, n_numbers, any_entity) — the cheap structured-content
    probe pipelines use to route documents (code/tabular/contact pages
    behave differently downstream than prose).

    Map-only ``regexp_count`` expressions — zero shuffle at any corpus
    size; patterns are RE2/Java-portable so the DuckDB oracle counts
    the exact same spans.
    """
    t = F.col(text_col)
    cols = [F.regexp_count(t, F.lit(pat)).cast("long").alias(name)
            for name, pat in _ENTITY_PATTERNS.items()]
    out = docs.select(F.col(id_col), *cols)
    any_e = None
    for name in _ENTITY_PATTERNS:
        c = F.col(name) > 0
        any_e = c if any_e is None else (any_e | c)
    return out.select("*", any_e.alias("any_entity"))
