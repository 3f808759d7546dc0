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
