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


def hybrid_search(docs: DataFrame, emb: DataFrame, query_terms: tuple,
                  query_vec_id: int, k: int = 10, k0: int = 60,
                  text_col: str = "text", id_col: str = "doc_id",
                  vec_id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  dense: str = "brute", n_cells: int = 16,
                  n_probe: int = 4) -> DataFrame:
    """End-to-end hybrid retrieval: BM25 lexical top-k + dense cosine
    top-k (query-by-example: the vector of ``query_vec_id``), fused by
    ``rrf_fuse``. Returns the fused table
    (doc_id, rank_0 [lexical], rank_1 [dense], rrf_score, fused_rank)
    ordered by fused_rank — the serving-side read over a curated corpus.

    Doc identity: the dense side's ``vec_id_col`` is the document id
    (per-document embeddings, the layout of the embeddings table); the
    query-example row itself is excluded from both candidate lists so
    the query never outranks its own results.

    100 TB shape: the lexical candidates come from corpus-scale BM25
    (functions/text.py — map-filtered token stream, broadcast df
    relation) cut to k via orderBy+limit, which Spark plans as a
    distributed TakeOrderedAndProject (each partition surfaces its k
    best, the driver merges k — no global sort, no single-partition
    window). The dense side defaults to exact brute-force cosine
    (operators/similarity.py — broadcast 1-row query, corpus never
    shuffles); ``dense="ivf"`` switches to the IVF cell-probed path
    (``n_cells`` k-means centroids fit on a hash-sample, ``n_probe``
    cells scanned per query) — the serving shape at billions of
    vectors, where the cell equi-join prunes the scan to probed cells
    and a persisted ``assign_cells`` index makes queries index-free.
    Fusion then runs on two k-row lists — the global rrf windows are
    k-bounded, not corpus-bounded.
    """
    from lightning_metastore_spark.functions.text import bm25_scores
    from lightning_metastore_spark.operators.similarity import (
        brute_force_topk, ivf_topk, kmeans_centroids)

    lex = bm25_scores(docs, tuple(query_terms), text_col=text_col,
                      id_col=id_col)
    lex_topk = (lex.filter((F.col("score") > 0)
                           & (F.col(id_col) != F.lit(int(query_vec_id))))
                .orderBy(F.desc("score"), F.col(id_col))
                .limit(int(k))
                .select(F.col(id_col).alias("doc_id"), "score"))
    qdf = emb.filter(F.col(vec_id_col) == F.lit(int(query_vec_id)))
    if dense == "brute":
        dense_df = brute_force_topk(emb, qdf, k=int(k), id_col=vec_id_col,
                                    vec_col=vec_col,
                                    query_id_col=vec_id_col)
    elif dense == "ivf":
        cents = kmeans_centroids(emb, k=int(n_cells), id_col=vec_id_col,
                                 vec_col=vec_col)
        dense_df = ivf_topk(emb, qdf, cents, k=int(k),
                            nprobe=int(n_probe), id_col=vec_id_col,
                            vec_col=vec_col)
    else:
        raise ValueError(f"dense must be 'brute' or 'ivf', got {dense!r}")
    dense_topk = dense_df.select(F.col("neighbor_id").alias("doc_id"),
                                 F.col("cosine").alias("score"))
    return (rrf_fuse([lex_topk, dense_topk], id_col="doc_id",
                     score_col="score", k0=k0)
            .orderBy("fused_rank"))


def mine_hard_negatives(emb: DataFrame, pairs: DataFrame, k: int = 5,
                        margin: float = 0.0,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        query_col: str = "query_id",
                        pos_col: str = "positive_id") -> DataFrame:
    """Denoised hard-negative mining for contrastive retriever training
    (the DPR/RocketQA recipe): for each supervised (query, positive)
    pair, the k corpus vectors most cosine-similar to the query that
    are neither the query nor its positive, keeping only candidates
    scoring at least ``margin`` BELOW the positive's own score — the
    published denoising rule that drops likely-unlabeled-positives
    (false negatives) from the training batch.

    Returns (query_id, rk, negative_id, cosine, pos_cosine), rk 1..k by
    descending cosine with id tie-breaks.

    Scale shape: identical to ``brute_force_topk`` — the supervision
    set (pairs ⋈ embeddings, one row per pair with both vectors) is
    broadcast, so the corpus NEVER shuffles; the pos-exclusion and the
    margin test are free predicates on the scored stream. Every
    margin-passing candidate (worst case corpus × pairs rows) then
    shuffles on query_id for the ranking window that truncates to k —
    the standard brute-force shape; tighten ``margin`` to thin the
    shuffle. Swap the scoring join for ``ivf_topk`` candidates when the
    supervision set outgrows the broadcast wall.
    """
    from lightning_metastore_spark.operators.similarity import (
        _dot,
        _with_norm,
    )

    c = _with_norm(emb, id_col, vec_col, "negative_id")
    q = _with_norm(emb, id_col, vec_col, "q")
    p = _with_norm(emb, id_col, vec_col, "p")
    qp = (pairs
          .select(F.col(query_col).alias("q"), F.col(pos_col).alias("p"))
          .join(q, "q").join(p, "p")
          .withColumn("pos_cosine",
                      F.round(_dot("q_v", "p_v")
                              / (F.col("q_norm") * F.col("p_norm")), 9))
          .select(F.col("q").alias("query_id"),
                  F.col("p").alias("positive_id"),
                  F.col("q_v").alias("query_v"),
                  F.col("q_norm").alias("query_norm"),
                  "pos_cosine"))
    scored = (
        c.join(F.broadcast(qp),
               (F.col("negative_id") != F.col("query_id"))
               & (F.col("negative_id") != F.col("positive_id")))
        .withColumn("cosine",
                    F.round(_dot("query_v", "negative_id_v")
                            / (F.col("query_norm")
                               * F.col("negative_id_norm")), 9))
        .filter(F.col("cosine") <= F.col("pos_cosine") - F.lit(margin)))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"),
                                          F.asc("negative_id"))
    return (scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("query_id", "rk", "negative_id", "cosine", "pos_cosine")
            .orderBy("query_id", "rk"))
