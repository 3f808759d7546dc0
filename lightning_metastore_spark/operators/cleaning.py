"""Corpus-level text cleaning for pretraining pipelines.

``remove_boilerplate_lines`` — the CCNet/Dolma-style line-level corpus
dedup: a line appearing in more than ``max_df`` documents (site
headers, cookie banners, nav footers) is dropped from every document.

Plan shape (100 TB): posexplode lines -> one hash aggregation for line
document-frequency (the boilerplate table is tiny — frequent lines by
definition number far fewer than total lines — so the filter join
broadcasts) -> reassemble per doc with order preserved via the
position index. Two shuffles total: the df aggregation and the per-doc
regroup.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def remove_boilerplate_lines(docs: DataFrame, max_df: int = 2,
                             text_col: str = "text",
                             id_col: str = "doc_id",
                             line_sep: str = "\n") -> DataFrame:
    """(id, text) with corpus-frequent lines removed; line order kept.

    A line's identity is its md5 over the whitespace-normalized
    lowercase form (16-byte shuffle keys, never full lines). Documents
    whose every line is boilerplate come back with empty text rather
    than disappearing.
    """
    lines = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), line_sep)).alias("pos", "line"),
    )
    key = F.md5(F.lower(F.regexp_replace(F.trim(F.col("line")), r"\s+", " ")))
    keyed = lines.withColumn("k", key)
    linedf = (keyed.groupBy("k")
              .agg(F.countDistinct(id_col).alias("line_df")))
    frequent = linedf.filter(F.col("line_df") > max_df).select("k")
    kept = keyed.join(F.broadcast(frequent), "k", "left_anti")
    rebuilt = (kept.groupBy(id_col)
               .agg(F.concat_ws(
                   line_sep,
                   F.transform(
                       F.array_sort(F.collect_list(F.struct("pos", "line"))),
                       lambda s: s["line"])).alias(text_col)))
    # keep all-boilerplate documents as empty text instead of dropping them
    return (docs.select(id_col)
            .join(rebuilt, id_col, "left")
            .select(id_col, F.coalesce(text_col, F.lit("")).alias(text_col)))


def dedup_lines_within_doc(docs: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           line_sep: str = "\n") -> DataFrame:
    """(id, text, n_lines, n_kept) with REPEATED lines removed within
    each document (first occurrence kept, order preserved) — the
    RefinedWeb/Dolma intra-document cleanup for scraped pages that
    repeat nav blocks or paragraphs inside one document.

    Line identity is the whitespace-normalized lowercase md5, matching
    ``remove_boilerplate_lines`` (the corpus-level sibling: that one
    drops lines frequent ACROSS documents and costs two shuffles; this
    one is entirely MAP-ONLY — an index-aware higher-order filter per
    row, zero shuffle, linear scan at any corpus size). Quadratic only
    in each document's line count.
    """
    import re as _re

    # F.split takes a REGEX but the reassembly join is literal — escape
    # so separators like '|' or '.' split on the literal character
    lines = F.split(F.col(text_col), _re.escape(line_sep))

    def norm(c):
        return F.md5(F.lower(F.regexp_replace(F.trim(c), r"\s+", " ")))

    normed = F.transform(lines, norm)
    kept = F.filter(
        lines,
        lambda x, i: ~F.array_contains(F.slice(normed, F.lit(1), i), norm(x)))
    # compute in a separate projection: emitting an output column ALSO
    # named text_col in the same select would make Catalyst re-resolve
    # the lambda's text_col reference against the cleaned output
    staged = docs.select(F.col(id_col), kept.alias("_kept"),
                         F.size(lines).cast("long").alias("n_lines"))
    return staged.select(
        F.col(id_col),
        F.array_join("_kept", line_sep).alias(text_col),
        "n_lines",
        F.size("_kept").cast("long").alias("n_kept"))


def normalize_text(docs: DataFrame, form: str = "NFC",
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Canonical text normalization — the step BEFORE any dedup key or
    tokenizer sees the corpus: Unicode normalization (``form`` in
    NFC/NFKC/NFD/NFKD), control-character stripping and whitespace
    canonicalization, so byte-different renderings of the same text
    ("e\\u0301" vs "\\u00e9", NBSP vs space, stray C0 controls from bad
    decodes) stop defeating exact dedup and inflating vocab. Returns
    (doc_id, text_norm, n_chars_before, n_chars_after, changed).

    Order of operations (fixed, engine-reproducible): (1) Unicode
    normalize, (2) strip C0/C1 controls + DEL except tab/newline/CR
    and NEL ([\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F\\u0080-\\u0084
    \\u0086-\\u009F] — C1 controls, e.g. from bad CP1252 decodes,
    are deleted like their C0 twins; NEL u0085 is a LINE separator
    and collapses to a space in step 3 instead, matching how
    tab/newline/CR are kept then collapsed), (3) collapse every
    whitespace run to one space — Java's \\s is ASCII-only, so the
    Unicode space set (NEL u0085, NBSP u00a0, ogham u1680, the
    u2000-u200a em/en family, line/para separators u2028/u2029,
    narrow-NBSP u202f, math-space u205f, ideographic u3000 — the ones
    NFKC folds but NFC preserves) is enumerated explicitly, (4) trim. The class is one
    Java and RE2 agree on, which keeps the result reproducible outside
    Spark (the pytest twin cross-checks DuckDB's nfc_normalize +
    regexp pipeline character-for-character).

    100 TB shape: the Unicode step is an Arrow-batched pandas UDF
    (stdlib unicodedata — no JVM NFC builtin exists); steps 2-4 are
    JVM regexp expressions fused into the same projection. Map-only,
    zero shuffle, at any corpus size. Case is deliberately preserved
    (lowercasing is a dedup-key concern, not a normalization concern —
    exact_dedup already lowers its key).
    """
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @pandas_udf("string")
    def _uninorm(s: pd.Series) -> pd.Series:
        return s.map(lambda t: unicodedata.normalize(form, t)
                     if t is not None else None)

    stripped = F.regexp_replace(
        _uninorm(F.col(text_col)),
        "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f"
        "\\u0080-\\u0084\\u0086-\\u009f]", "")
    collapsed = F.trim(F.regexp_replace(
        stripped,
        "[\\s\\u0085\\u00a0\\u1680\\u2000-\\u200a\\u2028\\u2029"
        "\\u202f\\u205f\\u3000]+", " "))
    return (docs.select(
        F.col(id_col),
        F.col(text_col).alias("_orig"),
        collapsed.alias("text_norm"))
        .select(F.col(id_col), "text_norm",
                F.coalesce(F.length("_orig"), F.lit(0))
                .cast("long").alias("n_chars_before"),
                F.coalesce(F.length("text_norm"), F.lit(0))
                .cast("long").alias("n_chars_after"),
                (~F.col("text_norm").eqNullSafe(F.col("_orig")))
                .alias("changed")))


def c4_line_clean(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  min_line_words: int = 5,
                  min_sentences: int = 3) -> DataFrame:
    """C4's line- and page-level cleaning rules (Raffel et al. 2020
    §2.2 — the published recipe this repo already carries the URL rule
    of, `functions/html.url_survivors`):

    line kept iff it ends in a terminal punctuation mark (. ! ? or a
    closing quote), has at least ``min_line_words`` words, and does not
    mention 'javascript' (case-insensitive); page kept
    (``c4_keep``) iff the RETAINED text has at least ``min_sentences``
    sentences (terminal-punctuation count — the paper's rough sentence
    notion), the original page contains no 'lorem ipsum' and no curly
    brace (the code-page signal).

    Returns (doc_id, text = kept lines joined by newline, n_lines,
    n_lines_kept, n_sentences, c4_keep). Map-only whole-stage-codegen
    expressions — one scan, zero shuffles, like the Gopher rules.
    """
    raw = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(raw, r"\n")

    def _line_ok(x):
        trimmed = F.trim(x)
        words = F.filter(F.split(trimmed, r"\s+"), lambda w: w != "")
        return (trimmed.rlike(r'[.!?"]$')
                & (F.size(words) >= F.lit(min_line_words))
                & ~F.lower(x).contains("javascript"))

    kept = F.filter(lines, _line_ok)
    text_kept = F.array_join(kept, "\n")
    n_sentences = F.size(F.regexp_extract_all(text_kept,
                                              F.lit(r"([.!?])"), 1))
    keep = ((n_sentences >= F.lit(min_sentences))
            & ~F.lower(raw).contains("lorem ipsum")
            & ~raw.contains("{"))
    return docs.select(
        F.col(id_col),
        text_kept.alias(text_col),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_lines_kept"),
        n_sentences.alias("n_sentences"),
        keep.alias("c4_keep"),
    )
