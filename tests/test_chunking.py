"""Sliding-window chunking, tokenizer-id encoding and SemDeDup-style
semantic dedup: naive-twin equivalence, edge cases, plan shape."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from lightning_metastore_spark.operators.chunking import chunk_documents
from lightning_metastore_spark.operators.dedup import semantic_dedup
from lightning_metastore_spark.functions.text import (
    build_vocab, encode_token_stats)


def _naive_chunks(text: str, chunk_size: int, overlap: int):
    toks = text.split()
    stride = chunk_size - overlap
    n = len(toks)
    if n <= chunk_size:
        n_chunks = 1
    else:
        n_chunks = -(-(n - chunk_size) // stride) + 1
    out = []
    for i in range(n_chunks):
        start = i * stride
        end = min(start + chunk_size, n)
        body = " ".join(toks[start:end])
        out.append((i, start, end, end - start,
                    hashlib.md5(body.encode()).hexdigest()))
    return out


@pytest.mark.parametrize("chunk_size,overlap", [(32, 8), (16, 0), (8, 7)])
def test_chunk_documents_matches_naive(spark, chunk_size, overlap):
    rows = [(1, "the quick brown fox " * 20),      # 80 tokens, multi-chunk
            (2, "short doc"),                       # under one window
            (3, " ".join(str(i) for i in range(chunk_size))),  # exact fit
            (4, ""),                                # empty text
            (5, "   "),                             # whitespace only
            (6, "x " * (chunk_size + 1))]           # one token past a window
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_id, r.chunk_id): (r.start_tok, r.end_tok,
                                    r.n_chunk_tokens, r.chunk_md5)
           for r in chunk_documents(docs, chunk_size, overlap).collect()}
    want = {}
    for doc_id, text in rows:
        for cid, s, e, n, h in _naive_chunks(text, chunk_size, overlap):
            want[(doc_id, cid)] = (s, e, n, h)
    assert got == want


def test_chunk_documents_rejects_bad_overlap(spark):
    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=8, overlap=8)
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=8, overlap=-1)


def test_chunk_documents_is_map_only(spark):
    """Chunking must not shuffle: the executed plan has no Exchange."""
    docs = spark.createDataFrame(
        [(i, "tok " * 50) for i in range(100)], "doc_id long, text string")
    plan = chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_build_vocab_ranking_and_cap(spark):
    docs = spark.createDataFrame(
        [(1, "b b b a a c"), (2, "a d D")], "doc_id long, text string")
    vocab = {r.token: r.token_id for r in build_vocab(docs).collect()}
    # counts: a=3, b=3, c=1, d=2 (lowercased); ties broken by token asc
    assert vocab == {"a": 1, "b": 2, "d": 3, "c": 4}
    capped = build_vocab(docs, vocab_size=2).collect()
    assert {r.token for r in capped} == {"a", "b"}


def test_encode_token_stats_matches_naive(spark):
    rows = [(1, "a b a oovword"), (2, ""), (3, "A a b")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = {r.token: r.token_id
             for r in build_vocab(docs, vocab_size=2).collect()}
    got = {r.doc_id: (r.n_tokens, r.n_oov, r.n_distinct_ids, r.ids_checksum)
           for r in encode_token_stats(docs, vocab_size=2).collect()}
    for doc_id, text in rows:
        ids = [vocab.get(t, 0) for t in text.lower().split()]
        assert got[doc_id] == (
            len(ids), sum(1 for i in ids if i == 0), len(set(ids)),
            sum((p + 1) * i for p, i in enumerate(ids)))


def test_encode_token_stats_broadcasts_vocab(spark):
    docs = spark.createDataFrame(
        [(i, "w%d common" % i) for i in range(50)], "doc_id long, text string")
    plan = (encode_token_stats(docs)._jdf.queryExecution().executedPlan()
            .toString())
    assert "BroadcastHashJoin" in plan


def test_semantic_dedup_keep_rule(spark):
    """Identical vectors share a bucket and only the lowest id is kept;
    the orthogonal vector is its own bucket's sole (kept) member."""
    v = [1.0, 0.5, -0.25, 2.0]
    w = [-1.0, 2.0, 0.5, -0.125]
    emb = spark.createDataFrame(
        [(1, v), (2, v), (3, list(w))],
        "vec_id long, embedding array<double>")
    rows = {r.vec_id: r for r in semantic_dedup(emb).collect()}
    assert rows[1].bucket == rows[2].bucket
    assert (rows[1].kept, rows[2].kept) == (1, 0)
    assert rows[1].n_dups == 1 and rows[2].n_dups == 1
    assert rows[3].kept == 1 and rows[3].n_dups == 0


def test_semantic_dedup_never_pairs_across_buckets(spark):
    """Near-identical vectors in different sign-buckets stay unpaired —
    the bucket restriction (the scale guarantee) is real."""
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(emb, threshold=-1.0).collect()  # pair everything
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    for members in by_bucket.values():
        # with threshold=-1 every same-bucket pair fires, so n_dups
        # must equal bucket size - 1 — and never more (no cross-bucket)
        for r in members:
            assert r.n_dups == len(members) - 1
        kept = [r for r in members if r.kept == 1]
        assert len(kept) == 1
        assert kept[0].vec_id == min(r.vec_id for r in members)


def test_semantic_dedup_kmeans_variant(spark):
    """The k-means-cell variant applies the same within-bucket compare:
    identical vectors always share a cell, so exactly one of each
    duplicate group is kept — and buckets match assign_cells output."""
    v1 = [1.0, 0.0, 0.5, 0.25]
    v2 = [0.0, 1.0, -0.5, 0.125]
    emb = spark.createDataFrame(
        [(1, v1), (2, v1), (3, v2), (4, v2), (5, v2)],
        "vec_id long, embedding array<double>")
    from lightning_metastore_spark.operators.dedup import (
        semantic_dedup_kmeans)

    rows = {r.vec_id: r for r in semantic_dedup_kmeans(emb, k=2).collect()}
    assert rows[1].bucket == rows[2].bucket
    assert rows[3].bucket == rows[4].bucket == rows[5].bucket
    assert (rows[1].kept, rows[2].kept) == (1, 0)
    assert (rows[3].kept, rows[4].kept, rows[5].kept) == (1, 0, 0)
    assert rows[5].n_dups == 2


def test_semantic_dedup_modal_width_wins(spark):
    """Width-mismatched rows in a bucket are filtered to the MODAL
    width (smallest on ties) — an anomalous-width row can never evict
    the normal vectors from pairing, wherever it lands in the batch."""
    from lightning_metastore_spark.operators.dedup import (
        _semdedup_within_buckets)

    v = [1.0, 0.5, -0.25, 2.0]
    rows = ([(9, 0, [5.0, -5.0]), (1, 0, v), (2, 0, v), (3, 0, v)]
            # tie bucket: two width-2 vs two width-3 -> width 2 wins
            + [(20, 1, [1.0, 1.0]), (21, 1, [1.0, 1.0]),
               (22, 1, [2.0, 2.0, 2.0]), (23, 1, [2.0, 2.0, 2.0])])
    vecs = spark.createDataFrame(rows, "vid long, bucket long, v array<double>")
    out = {r.vec_id: r for r in
           _semdedup_within_buckets(vecs, 0.9, "vec_id").collect()}
    # the three identical modal-width vectors pair with each other
    assert (out[1].n_dups, out[2].n_dups, out[3].n_dups) == (2, 2, 2)
    assert (out[1].kept, out[2].kept, out[3].kept) == (1, 0, 0)
    # the anomalous-width row pairs with nothing but survives (kept)
    assert out[9].n_dups == 0 and out[9].kept == 1
    # tie: smaller width is modal; the width-3 twins stay unpaired
    assert out[20].n_dups == 1 and out[21].n_dups == 1
    assert out[22].n_dups == 0 and out[23].n_dups == 0
