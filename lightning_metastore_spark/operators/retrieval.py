"""Hybrid-retrieval result fusion.

RAG-style serving over a curated corpus runs BOTH a lexical ranker
(BM25 — functions/text.py) and a dense ranker (ANN cosine top-k —
operators/similarity.py) and fuses the two candidate lists. The
standard parameter-free fusion is Reciprocal Rank Fusion (RRF,
Cormack et al., SIGIR'09): fused(d) = sum_i 1/(k0 + rank_i(d)) over
the lists that returned d — robust to incomparable score scales, which
is exactly the lexical-vs-cosine situation.

Scale design: RRF operates on CANDIDATE LISTS (per-query top-k
results), not corpora — every input is bounded by k * n_queries. Ranks
are row_number windows PARTITIONED by the query key, so fusion of a
million-query batch parallelizes on the query key with one shuffle per
list plus one outer-join co-group on (query, doc). Passing
query_col=None ranks each list globally (a single-partition window) —
only for the one-query case, and documented as such.

Reference parity note: the reference has no retrieval operators
(SURVEY.md §2.7); part of the driver-mandated LLM-pipeline extension.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def rrf_fuse(rankings: list[DataFrame], id_col: str = "doc_id",
             score_col: str = "score", query_col: str | None = None,
             k0: int = 60) -> DataFrame:
    """Fuse ranked candidate lists by Reciprocal Rank Fusion:
    (``[query_col,] doc_id, rank_0..rank_{m-1}, rrf_score, fused_rank``).

    Each input carries (``id_col``, ``score_col``) [+ ``query_col``];
    ranks are dense row_numbers by (score DESC, id) — the id tiebreak
    makes ranks, and therefore the fused ordering, fully deterministic.
    A doc absent from a list contributes nothing for that list (the
    standard RRF convention); ``rank_i`` is NULL there. ``fused_rank``
    ties break by id. The 9-dp rounding on ``rrf_score`` keeps the sum
    engine-reproducible (each addend is an exact reciprocal of a small
    integer, summed in fixed list order).
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    keys = ([query_col] if query_col else []) + [id_col]
    ranked = []
    for i, df in enumerate(rankings):
        w = (W.partitionBy(query_col) if query_col else W.partitionBy()) \
            .orderBy(F.desc(score_col), F.col(id_col))
        ranked.append(df.select(
            *keys, F.row_number().over(w).cast("long").alias(f"rank_{i}")))
    joined = reduce(lambda a, b: a.join(b, keys, "full_outer"), ranked)
    contribs = [
        F.coalesce(1.0 / (F.lit(float(k0)) + F.col(f"rank_{i}")), F.lit(0.0))
        for i in range(len(rankings))]
    score = F.round(reduce(lambda a, b: a + b, contribs), 9)
    wf = (W.partitionBy(query_col) if query_col else W.partitionBy()) \
        .orderBy(F.desc("rrf_score"), F.col(id_col))
    return (joined
            .withColumn("rrf_score", score)
            .withColumn("fused_rank",
                        F.row_number().over(wf).cast("long")))
