"""RRF fusion + hybrid (BM25 + dense) retrieval tests: the operators
are verified against independently-computed Python twins (ranks and
reciprocal-rank sums recomputed from scratch, the dense side from raw
numpy cosines), not against their own building blocks."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from lightning_metastore_spark.operators.retrieval import (  # noqa: E402
    hybrid_search, rrf_fuse)

SF_DIR = "/root/testdata/sf0.001"


def _rrf_twin(lists, k0=60):
    """Computed-rank RRF twin: dict doc -> (ranks, score, fused order)."""
    ranks: list[dict] = []
    for rows in lists:
        order = sorted(rows, key=lambda t: (-t[1], t[0]))
        ranks.append({d: i + 1 for i, (d, _) in enumerate(order)})
    docs = sorted({d for r in ranks for d in r})
    score = {d: round(sum(1.0 / (k0 + r[d]) for r in ranks if d in r), 9)
             for d in docs}
    fused = sorted(docs, key=lambda d: (-score[d], d))
    return ranks, score, {d: i + 1 for i, d in enumerate(fused)}


def test_rrf_fuse_matches_computed_rank_twin(spark):
    a = [(1, 9.0), (2, 7.0), (3, 5.0), (4, 3.0)]
    b = [(3, 0.9), (5, 0.8), (1, 0.7)]
    got = {r.doc_id: r for r in rrf_fuse(
        [spark.createDataFrame(a, "doc_id long, score double"),
         spark.createDataFrame(b, "doc_id long, score double")]).collect()}
    ranks, score, fused = _rrf_twin([a, b])
    assert set(got) == {1, 2, 3, 4, 5}
    for d, r in got.items():
        assert r.rank_0 == ranks[0].get(d) and r.rank_1 == ranks[1].get(d)
        assert r.rrf_score == score[d] and r.fused_rank == fused[d]
    # doc 3 (top of dense, mid lexical) must outrank doc 2 (lexical only)
    assert got[3].fused_rank < got[2].fused_rank


def test_rrf_fuse_score_ties_break_by_id(spark):
    rows = [(7, 1.0), (3, 1.0), (5, 1.0)]
    out = rrf_fuse([spark.createDataFrame(
        rows, "doc_id long, score double")]).orderBy("fused_rank").collect()
    assert [r.doc_id for r in out] == [3, 5, 7]
    assert [r.rank_0 for r in out] == [1, 2, 3]


def test_rrf_fuse_per_query_partitioned(spark):
    """With query_col, ranks restart per query and fusion joins on
    (query, doc) — one query's lists never leak into another's."""
    a = [("q1", 1, 5.0), ("q1", 2, 4.0), ("q2", 1, 9.0)]
    b = [("q1", 2, 0.9), ("q2", 3, 0.5)]
    got = {(r.q, r.doc_id): r for r in rrf_fuse(
        [spark.createDataFrame(a, "q string, doc_id long, score double"),
         spark.createDataFrame(b, "q string, doc_id long, score double")],
        query_col="q").collect()}
    assert got[("q1", 1)].rank_0 == 1 and got[("q1", 1)].rank_1 is None
    assert got[("q1", 2)].rank_0 == 2 and got[("q1", 2)].rank_1 == 1
    assert got[("q2", 1)].rank_0 == 1 and got[("q2", 3)].rank_1 == 1
    # q2's fused ranks are its own 1..2
    assert {got[("q2", d)].fused_rank for d in (1, 3)} == {1, 2}


def test_rrf_fuse_empty_raises():
    import pytest

    with pytest.raises(ValueError):
        rrf_fuse([])


def test_hybrid_search_matches_independent_twin(spark):
    """hybrid_search == a from-scratch twin: lexical ranks from the
    (gate-verified) BM25 scores re-sorted in Python, dense ranks from
    raw numpy cosines, RRF recomputed by hand."""
    import numpy as np

    from lightning_metastore_spark.functions.text import bm25_scores

    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(F.col("doc_id") < 40))
    emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
           .filter(F.col("vec_id") < 40))
    terms, qid, k = ("spark", "merge"), 3, 8

    out = hybrid_search(docs, emb, terms, query_vec_id=qid, k=k).collect()

    lex_rows = [(r.doc_id, float(r.score)) for r in
                bm25_scores(docs, terms).collect()
                if r.score > 0 and r.doc_id != qid]
    lex = sorted(lex_rows, key=lambda t: (-t[1], t[0]))[:k]

    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    q = vecs[qid]
    cos = [(i, round(float(np.dot(q, v) / (np.linalg.norm(q)
                                           * np.linalg.norm(v))), 9))
           for i, v in vecs.items() if i != qid]
    dense = sorted(cos, key=lambda t: (-t[1], t[0]))[:k]

    ranks, score, fused = _rrf_twin([lex, dense])
    got = {r.doc_id: r for r in out}
    assert set(got) == set(fused)
    for d, r in got.items():
        assert r.rank_0 == ranks[0].get(d) and r.rank_1 == ranks[1].get(d)
        assert abs(r.rrf_score - score[d]) < 1e-12
        assert r.fused_rank == fused[d]


def test_hybrid_search_excludes_query_example(spark):
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(F.col("doc_id") < 40))
    emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
           .filter(F.col("vec_id") < 40))
    out = hybrid_search(docs, emb, ("spark",), query_vec_id=5, k=5).collect()
    assert out and all(r.doc_id != 5 for r in out)


def test_hybrid_search_lexical_topk_is_distributed(spark):
    """The lexical cut must plan as TakeOrderedAndProject (distributed
    per-partition top-k), never a single-partition global sort."""
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(F.col("doc_id") < 40))
    emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
           .filter(F.col("vec_id") < 40))
    plan = hybrid_search(docs, emb, ("spark",), query_vec_id=5, k=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_hybrid_search_ivf_backend(spark):
    """dense='ivf' swaps the exact dense ranker for the cell-probed
    path: output equals the explicit kmeans+ivf_topk+rrf composition
    (both deterministic), and at full probe coverage (n_probe ==
    n_cells) IVF degenerates to brute force, so the two backends agree
    exactly."""
    from pyspark.sql import functions as F2

    from lightning_metastore_spark.operators.similarity import (
        ivf_topk, kmeans_centroids)

    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter(F2.col("doc_id") < 40))
    emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
           .filter(F2.col("vec_id") < 40))
    terms, qid, k = ("spark", "merge"), 3, 6

    got = hybrid_search(docs, emb, terms, query_vec_id=qid, k=k,
                        dense="ivf", n_cells=4, n_probe=2).collect()
    cents = kmeans_centroids(emb, k=4)
    dense = ivf_topk(emb, emb.filter(F2.col("vec_id") == qid), cents,
                     k=k, nprobe=2)
    from lightning_metastore_spark.functions.text import bm25_scores
    lex = (bm25_scores(docs, terms)
           .filter((F2.col("score") > 0) & (F2.col("doc_id") != qid))
           .orderBy(F2.desc("score"), "doc_id").limit(k)
           .select("doc_id", "score"))
    want = rrf_fuse(
        [lex, dense.select(F2.col("neighbor_id").alias("doc_id"),
                           F2.col("cosine").alias("score"))]).collect()
    assert sorted(map(repr, got)) == sorted(map(repr, want))

    # full probe coverage == brute force
    full = hybrid_search(docs, emb, terms, query_vec_id=qid, k=k,
                         dense="ivf", n_cells=4, n_probe=4).collect()
    brute = hybrid_search(docs, emb, terms, query_vec_id=qid, k=k).collect()
    assert sorted(map(repr, full)) == sorted(map(repr, brute))

    import pytest

    with pytest.raises(ValueError):
        hybrid_search(docs, emb, terms, query_vec_id=qid, dense="hnsw")


def test_mine_hard_negatives_matches_numpy_twin(spark):
    """Independent numpy re-derivation: per pair, rank all non-query
    non-positive vectors by cosine, drop those above pos_cosine -
    margin, take 3 — must equal the Spark result bit-for-bit on the
    round-9 scores."""
    import numpy as np

    from lightning_metastore_spark.operators.retrieval import (
        mine_hard_negatives,
    )

    rng = [((i * 2654435761) % 97) / 97.0 for i in range(200)]
    vecs = {vid: [rng[(vid * 8 + j) % 200] - 0.5 for j in range(8)]
            for vid in range(40)}
    emb = spark.createDataFrame(
        [(vid, v) for vid, v in vecs.items()],
        "vec_id long, embedding array<double>")
    pairs = spark.createDataFrame(
        [(0, 7), (5, 11), (13, 2)], "query_id long, positive_id long")
    got = [(r.query_id, r.rk, r.negative_id, r.cosine, r.pos_cosine)
           for r in mine_hard_negatives(emb, pairs, k=3,
                                        margin=0.05).collect()]

    def cos(a, b):
        a, b = np.array(a), np.array(b)
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 9)

    want = []
    for q, p in [(0, 7), (5, 11), (13, 2)]:
        pc = cos(vecs[q], vecs[p])
        cands = sorted(
            ((-cos(vecs[q], vecs[n]), n) for n in vecs
             if n not in (q, p) and cos(vecs[q], vecs[n]) <= pc - 0.05))
        for rk, (negc, n) in enumerate(cands[:3], 1):
            want.append((q, rk, n, -negc, pc))
    want.sort()
    assert got == want and len(got) == 9
    # positives and the query itself never appear as negatives
    assert all(n not in (q, {0: 7, 5: 11, 13: 2}[q])
               for q, _, n, _, _ in got)
