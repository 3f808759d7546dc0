"""Dedup operator tests: LSH recall vs the exact answer, determinism,
and behavior on crafted micro-fixtures."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from lightning_metastore_spark.operators import dedup  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_minhash_lsh_recall_equals_exact(spark):
    """The pipeline claim: LSH candidates + exact verify == exact pairs."""
    docs = _docs(spark)
    exact = {(r.doc_id_a, r.doc_id_b)
             for r in dedup.jaccard_pairs(docs, threshold=0.5).collect()}
    lsh = {(r.doc_id_a, r.doc_id_b)
           for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert lsh == exact


def test_simhash_recall_equals_exact(spark):
    docs = _docs(spark)
    exact = {(r.doc_id_a, r.doc_id_b)
             for r in dedup.jaccard_pairs(docs, threshold=0.5).collect()}
    sh = {(r.doc_id_a, r.doc_id_b)
          for r in dedup.simhash_pairs(docs, hamming_max=14, chunks=15,
                                       jaccard_threshold=0.5).collect()}
    assert sh == exact


def test_incremental_minhash_equals_exact_cross_pairs(spark):
    """Incremental batch-vs-corpus dedup must find exactly the exact-
    Jaccard pairs that cross the batch/corpus split — the corpus
    represented only by its persisted shingle + signature artifacts."""
    from pyspark.sql import functions as F

    docs = _docs(spark)
    is_batch = F.col("doc_id") % 10 == 0
    exact = {(r.doc_id_a, r.doc_id_b)
             for r in dedup.jaccard_pairs(docs, threshold=0.5).collect()}
    cross = {(a, b) if a % 10 == 0 else (b, a)
             for a, b in exact if (a % 10 == 0) != (b % 10 == 0)}
    sh = dedup.shingles(docs)
    sig = dedup.minhash_signatures(sh)
    got = {(r.batch_id, r.corpus_id)
           for r in dedup.incremental_minhash_pairs(
               docs.filter(is_batch), sh.filter(~is_batch),
               sig.filter(~is_batch)).collect()}
    assert got == cross and len(cross) > 0


def test_simhash_degenerate_guard(spark):
    """Narrow chunks -> near-all-pairs candidate join: the guard must
    warn by default, raise in error mode, and stay silent for the
    web-scale parameterization."""
    import warnings

    import pytest

    rows = [(1, "w1 w2 w3 w4 w5 w6"), (2, "w1 w2 w3 w4 w5 w6"),
            (3, "x1 x2 x3 x4 x5 x6")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    assert dedup.simhash_collision_probability(15) > 0.6
    assert dedup.simhash_collision_probability(4) < 1e-3
    with pytest.warns(RuntimeWarning, match="all-pairs"):
        dedup.simhash_pairs(df, hamming_max=14, chunks=15)
    with pytest.raises(ValueError, match="all-pairs"):
        dedup.simhash_pairs(df, hamming_max=14, chunks=15,
                            on_degenerate="error")
    # pigeonhole violation is always a hard error (silent recall loss)
    with pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_pairs(df, hamming_max=4, chunks=4)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        dedup.simhash_pairs(df, **dedup.SIMHASH_WEB_SCALE)
    # the function's own defaults must not trip its own guard
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        dedup.simhash_pairs(df)


def test_simhash_web_scale_params_find_dups(spark):
    """SIMHASH_WEB_SCALE (4x15-bit chunks, hamming<=3) finds
    hamming-close near-dups — here exact duplicates (hamming 0) —
    without enumerating unrelated pairs."""
    rows = [(1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "one two three four five six seven eight nine"),
            (4, "unrelated words entirely distinct corpus body text")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {(r.doc_id_a, r.doc_id_b)
             for r in dedup.simhash_pairs(df, jaccard_threshold=0.5,
                                          **dedup.SIMHASH_WEB_SCALE).collect()}
    assert pairs == {(1, 2)}


def test_exact_dedup_micro(spark):
    rows = [(1, "a b c"), (2, "A  b   C"), (3, "different text here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.dup_count for r in dedup.exact_dedup(df).collect()}
    assert out == {1: 2, 3: 1}  # 1 and 2 normalize to the same text


def test_jaccard_pairs_micro(spark):
    rows = [
        (1, "w1 w2 w3 w4 w5 w6"),
        (2, "w1 w2 w3 w4 w5 w6"),          # identical -> jaccard 1.0
        (3, "x1 x2 x3 x4 x5 x6 x7 x8"),    # disjoint
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {(r.doc_id_a, r.doc_id_b): r.jaccard
             for r in dedup.jaccard_pairs(df, threshold=0.5).collect()}
    assert pairs == {(1, 2): 1.0}


def test_minhash_deterministic(spark):
    docs = _docs(spark)
    sig1 = dedup.minhash_signatures(dedup.shingles(docs)).orderBy("doc_id").limit(5).collect()
    sig2 = dedup.minhash_signatures(dedup.shingles(docs)).orderBy("doc_id").limit(5).collect()
    assert sig1 == sig2


def test_embedding_neardup_symmetric_threshold(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pairs = dedup.embedding_neardup_pairs(emb, threshold=0.45).collect()
    assert all(r.vec_id_a < r.vec_id_b for r in pairs)


def test_connected_components_micro(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], ["doc_id_a", "doc_id_b"])
    nodes = spark.createDataFrame([(i,) for i in (1, 2, 3, 7, 8, 9)],
                                  ["doc_id"])
    out = {r.doc_id: r.cluster_id
           for r in dedup.connected_components(pairs, nodes).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 9: 9}


def test_connected_components_paths_agree(spark):
    # chain of 4, a triangle, a self-contained pair, and isolated nodes;
    # string ids exercise the type-generic mapping schema
    pairs = spark.createDataFrame(
        [("d", "c"), ("c", "b"), ("b", "a"), ("x", "y"), ("y", "z"),
         ("x", "z"), ("p", "q")], ["doc_id_a", "doc_id_b"])
    nodes = spark.createDataFrame(
        [(i,) for i in "abcdxyzpqmn"], ["doc_id"])
    expected = {"a": "a", "b": "a", "c": "a", "d": "a",
                "x": "x", "y": "x", "z": "x",
                "p": "p", "q": "p", "m": "m", "n": "n"}
    fast = {r.doc_id: r.cluster_id
            for r in dedup.connected_components(pairs, nodes).collect()}
    dist = {r.doc_id: r.cluster_id
            for r in dedup.connected_components(
                pairs, nodes, driver_cutoff_edges=0).collect()}
    assert fast == expected and dist == expected


def test_connected_components_restores_arrow_conf(spark):
    """The union-find path needs Arrow for its toPandas collect, but a
    library operator must not leave the session conf mutated — a caller
    who deliberately disabled Arrow keeps it disabled afterwards."""
    key = "spark.sql.execution.arrow.pyspark.enabled"
    prior = spark.conf.get(key, None)
    pairs = spark.createDataFrame([(1, 2)], ["doc_id_a", "doc_id_b"])
    nodes = spark.createDataFrame([(1,), (2,), (3,)], ["doc_id"])
    try:
        spark.conf.set(key, "false")
        out = {r.doc_id: r.cluster_id
               for r in dedup.connected_components(pairs, nodes).collect()}
        assert out == {1: 1, 2: 1, 3: 3}
        assert spark.conf.get(key) == "false"
    finally:
        if prior is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prior)


def test_embedding_blocked_equals_brute_force(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    brute = {(r.vec_id_a, r.vec_id_b)
             for r in dedup.embedding_neardup_pairs(emb, 0.45).collect()}
    blocked = {(r.vec_id_a, r.vec_id_b)
               for r in dedup.embedding_neardup_pairs_blocked(emb, 0.45).collect()}
    assert blocked == brute and len(blocked) > 0


def test_corpus_dup_spans_micro(spark):
    # doc1 and doc2 share the exact 5-token prefix; doc3 is unique;
    # doc4 is shorter than k -> whole-text span
    docs = spark.createDataFrame([
        (1, "a b c d e f"),          # spans: "a b c d e", "b c d e f"
        (2, "a b c d e zz"),         # spans: "a b c d e", "b c d e zz"
        (3, "q w e r t y"),
        (4, "tiny doc"),
    ], ["doc_id", "text"])
    out = {r.doc_id: r for r in dedup.corpus_dup_spans(docs, k=5).collect()}
    assert out[1].n_spans == 2 and out[1].n_dup_spans == 1
    assert out[1].dup_span_frac == 0.5
    assert out[2].n_dup_spans == 1
    assert out[3].n_dup_spans == 0 and out[3].dup_span_frac == 0.0
    assert out[4].n_spans == 1 and out[4].n_dup_spans == 0


def test_corpus_dup_spans_within_doc_repeat(spark):
    # the same 5-gram twice INSIDE one doc also counts (occ > 1)
    docs = spark.createDataFrame(
        [(1, "x y z w v x y z w v")], ["doc_id", "text"])
    r = dedup.corpus_dup_spans(docs, k=5).collect()[0]
    # spans at positions 1..6; "x y z w v" occurs at pos 1 and 6
    assert r.n_spans == 6 and r.n_dup_spans == 2


def test_remove_dup_spans_excises_covered_tokens(spark):
    """Removal twin of the micro fixture: tokens covered by any
    corpus-duplicated k-window disappear; everything else survives in
    order. doc4 (< k tokens, unique) is untouched; a short doc whose
    WHOLE text duplicates empties entirely."""
    docs = spark.createDataFrame([
        (1, "a b c d e f"),          # "a b c d e" dups with doc2
        (2, "a b c d e zz"),
        (3, "q w e r t y"),
        (4, "tiny doc"),
        (5, "tiny doc"),             # whole-text dup of doc4
    ], ["doc_id", "text"])
    out = {r.doc_id: r for r in
           dedup.remove_dup_spans(docs, k=5).collect()}
    # docs 1,2: window [0,5) covered -> first five tokens removed
    assert out[1].clean_text == "f" and out[1].n_removed == 5
    assert out[2].clean_text == "zz" and out[2].removed_frac == round(5 / 6, 6)
    assert out[3].clean_text == "q w e r t y" and out[3].n_removed == 0
    # doc4/doc5: the whole-text window duplicates -> both empty
    assert out[4].clean_text == "" and out[4].removed_frac == 1.0
    assert out[5].clean_text == ""


def test_remove_dup_spans_matches_naive_twin(spark):
    """Sequential twin over a corpus with overlapping and within-doc
    duplicated windows: coverage = union of all duplicated k-window
    intervals, exactly."""
    texts = {1: "p q r s t u v p q r s t",   # "p q r s t" at 0 and 7
             2: "p q r s t m n o",
             3: "m n o p q r s t x",
             4: "unique words only here now"}
    k = 5
    docs = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])

    # naive: count every positional k-gram corpus-wide, cover, excise
    from collections import Counter
    grams: Counter = Counter()
    toks = {i: t.lower().split() for i, t in texts.items()}
    for tk in toks.values():
        if len(tk) < k:
            grams[tuple(tk)] += 1
        else:
            for i in range(len(tk) - k + 1):
                grams[tuple(tk[i:i + k])] += 1
    want = {}
    for did, tk in toks.items():
        n = len(tk)
        covered = [False] * n
        if n < k:
            if grams[tuple(tk)] > 1:
                covered = [True] * n
        else:
            for i in range(n - k + 1):
                if grams[tuple(tk[i:i + k])] > 1:
                    for j in range(i, i + k):
                        covered[j] = True
        kept = [t for t, c in zip(tk, covered) if not c]
        want[did] = (" ".join(kept), n, n - len(kept))

    out = {r.doc_id: r for r in
           dedup.remove_dup_spans(docs, k=k).collect()}
    for did, (ct, n, nr) in want.items():
        assert (out[did].clean_text, out[did].n_tokens,
                out[did].n_removed) == (ct, n, nr), did
    assert any(r[2] > 0 for r in want.values())  # the fixture has bite


def test_span_index_incremental_admission(spark):
    """Incremental exact-substring dedup: a new batch is admitted or
    rejected against the stored span index only — the corpus is never
    rescanned. Counts match a naive recount; within-batch duplication
    does not reject."""
    corpus = spark.createDataFrame([
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "one two three four five six seven eight"),
    ], ["doc_id", "text"])
    idx = dedup.span_index(corpus, k=5)
    # occurrence counts are exact
    assert idx.count() > 0
    assert idx.agg(F.sum("occ")).collect()[0][0] == 4 + 4  # 8-k+1 each

    batch = spark.createDataFrame([
        # 3 of 4 windows shared with corpus doc 1 -> reject at 0.5
        (10, "alpha beta gamma delta epsilon zeta eta NEW"),
        # fully novel -> admit
        (11, "totally fresh words that no corpus doc ever used"),
        # duplicated WITHIN the batch only -> still admitted
        (12, "totally fresh words that no corpus doc ever used"),
    ], ["doc_id", "text"])
    out = {r.doc_id: r for r in dedup.span_batch_against_index(
        batch, idx, k=5, max_dup_frac=0.5).collect()}
    assert not out[10].admit and out[10].n_known_spans == 3
    assert out[10].n_spans == 4
    assert out[11].admit and out[11].n_known_spans == 0
    assert out[12].admit, "within-batch dup must not reject"

    # naive recount of known windows for doc 10
    corpus_grams = set()
    for t in ("alpha beta gamma delta epsilon zeta eta theta",
              "one two three four five six seven eight"):
        tk = t.split()
        for i in range(len(tk) - 4):
            corpus_grams.add(tuple(tk[i:i + 5]))
    tk = "alpha beta gamma delta epsilon zeta eta NEW".lower().split()
    want_known = sum(1 for i in range(len(tk) - 4)
                     if tuple(tk[i:i + 5]) in corpus_grams)
    assert out[10].n_known_spans == want_known


def test_span_batch_against_index_short_doc_and_empty_batch(spark):
    """Whole-text window semantics carry over: a short doc whose full
    text exists in the corpus is fully known; a short novel doc is
    admitted with one unknown span."""
    corpus = spark.createDataFrame([(1, "tiny doc")], ["doc_id", "text"])
    idx = dedup.span_index(corpus, k=5)
    batch = spark.createDataFrame(
        [(10, "tiny doc"), (11, "other text")], ["doc_id", "text"])
    out = {r.doc_id: r for r in dedup.span_batch_against_index(
        batch, idx, k=5, max_dup_frac=0.5).collect()}
    assert out[10].known_frac == 1.0 and not out[10].admit
    assert out[11].n_spans == 1 and out[11].n_known_spans == 0


# --- content-defined chunking ---------------------------------------------

def test_cdc_chunks_cover_text_losslessly(spark):
    from lightning_metastore_spark.operators.dedup import cdc_chunks
    import re

    texts = {1: "the quick brown fox jumps over the lazy dog " * 5,
             2: "short", 3: ""}
    df = spark.createDataFrame(list(texts.items()), ["doc_id", "text"])
    rows = cdc_chunks(df).orderBy("doc_id", "ck").collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # chunk lengths reassemble the normalized text exactly, in order
    for d, t in texts.items():
        norm = re.sub(r"\s+", " ", t, flags=re.ASCII)
        if not norm:
            assert d not in by_doc       # empty doc -> no chunk rows
            continue
        chunks = by_doc[d]
        assert [r.ck for r in chunks] == list(range(1, len(chunks) + 1))
        assert sum(r.chunk_len for r in chunks) == len(norm)


def test_cdc_edit_disturbs_only_local_chunks(spark):
    from lightning_metastore_spark.operators.dedup import cdc_chunks

    base = "the quick brown fox jumps over the lazy dog " * 8
    edited = base[:200] + "XYZ" + base[200:]   # one insertion mid-text
    df = spark.createDataFrame([(1, base), (2, edited)],
                               ["doc_id", "text"])
    rows = cdc_chunks(df).collect()
    a = [r.chunk_md5 for r in sorted((r for r in rows if r.doc_id == 1),
                                     key=lambda r: r.ck)]
    b = [r.chunk_md5 for r in sorted((r for r in rows if r.doc_id == 2),
                                     key=lambda r: r.ck)]
    from collections import Counter

    shared = sum((Counter(a) & Counter(b)).values())
    # the overwhelming majority of chunks survive the edit (multiset
    # overlap — the text is periodic so hashes repeat) — that is the
    # content-defined property; fixed-width chunking would share
    # nothing after the shift
    assert shared >= len(a) - 3
    assert a != b                          # the edited region did change


def test_cdc_dup_stats_partition_invariant_and_exact(spark):
    from lightning_metastore_spark.operators.dedup import (
        cdc_chunks, cdc_dup_stats)

    prefix = " ".join(f"word{j}x{j * 7 % 13}" for j in range(60))
    texts = [(i, prefix + f" unique tail {i} " * 3) for i in range(8)]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    a = sorted(map(tuple, cdc_dup_stats(df).collect()))
    b = sorted(map(tuple, cdc_dup_stats(df.repartition(5)).collect()))
    assert a == b
    # naive recount from the chunk table
    rows = cdc_chunks(df).collect()
    from collections import defaultdict
    docs_of = defaultdict(set)
    for r in rows:
        docs_of[r.chunk_md5].add(r.doc_id)
    for (doc_id, n_chunks, n_dup, frac, _avg) in a:
        mine = [r for r in rows if r.doc_id == doc_id]
        assert n_chunks == len(mine)
        want_dup = sum(1 for r in mine if len(docs_of[r.chunk_md5]) > 1)
        assert n_dup == want_dup
        assert frac == round(want_dup / max(len(mine), 1), 6)
    # the shared prefix actually produces cross-doc dup chunks
    assert any(r[2] > 0 for r in a)


def test_cdc_incremental_index_admission(spark):
    from lightning_metastore_spark.operators.dedup import (
        cdc_batch_against_index, cdc_chunk_index)

    prefix = " ".join(f"word{j}x{j * 7 % 13}" for j in range(60))
    corpus = spark.createDataFrame(
        [(i, prefix + f" corpus tail {i} " * 3) for i in range(6)],
        ["doc_id", "text"])
    index = cdc_chunk_index(corpus).persist()
    batch = spark.createDataFrame([
        (100, prefix + " tiny new bit"),          # mostly recycled
        (101, "completely novel content " +
              " ".join(f"fresh{j}" for j in range(40))),
    ], ["doc_id", "text"])
    out = {r.doc_id: r for r in
           cdc_batch_against_index(batch, index,
                                   max_known_frac=0.5).collect()}
    assert out[100].known_frac > 0.5 and not out[100].admit
    assert out[101].known_frac < 0.2 and out[101].admit
    # the corpus index never grew — operator is read-only on it
    assert index.count() == cdc_chunk_index(corpus).count()


# ---------------------------------------------------------------------------
# dedup_keep (cluster -> canonical representative -> filtered corpus)
# ---------------------------------------------------------------------------

def _uf_keep(pairs, all_ids, scores=None):
    """Python union-find twin of dedup_keep's keep rule."""
    parent = {i: i for i in all_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    clusters = {}
    for i in all_ids:
        clusters.setdefault(find(i), []).append(i)
    kept = {}
    for root, members in clusters.items():
        cid = min(members)
        if scores is None:
            rep = cid
        else:
            rep = max(members, key=lambda m: (scores[m], -m))
        kept[rep] = (cid, len(members))
    return kept


def test_dedup_keep_explicit_pairs_min_id(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(1, 7)],
        "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_id_a long, doc_id_b long")
    out = dedup.dedup_keep(docs, pairs=pairs)
    got = {r.doc_id: (r.cluster_id, r.cluster_size)
           for r in out.collect()}
    assert got == {1: (1, 3), 4: (4, 1), 5: (5, 2)}
    # original columns survive
    assert set(out.columns) == {"doc_id", "text", "cluster_id",
                                "cluster_size"}


def test_dedup_keep_score_col_keeps_best_with_tiebreak(spark):
    docs = spark.createDataFrame(
        [(1, "a", 0.1), (2, "b", 0.9), (3, "c", 0.9),
         (4, "d", 0.5), (5, "e", 0.2), (6, "f", 0.2)],
        "doc_id long, text string, q double")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_id_a long, doc_id_b long")
    out = dedup.dedup_keep(docs, pairs=pairs, score_col="q")
    got = {r.doc_id: (r.cluster_id, r.cluster_size)
           for r in out.collect()}
    # cluster {1,2,3}: 2 and 3 tie at 0.9 -> smaller id 2 wins;
    # {5,6}: tie at 0.2 -> 5; singleton 4 kept
    assert got == {2: (1, 3), 4: (4, 1), 5: (5, 2)}


def test_dedup_keep_exact_method(spark):
    docs = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other"),
         (4, " HELLO WORLD ")],
        "doc_id long, text string")
    out = dedup.dedup_keep(docs, method="exact")
    got = {r.doc_id: r.cluster_size for r in out.collect()}
    assert got == {1: 3, 3: 1}


def test_dedup_keep_minhash_equals_union_find_twin(spark):
    docs = _docs(spark).limit(200).cache()
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.5)
    pair_rows = [(r.doc_id_a, r.doc_id_b) for r in pairs.collect()]
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    want = _uf_keep(pair_rows, ids)
    out = dedup.dedup_keep(docs, method="minhash", threshold=0.5)
    got = {r.doc_id: (r.cluster_id, r.cluster_size)
           for r in out.collect()}
    assert got == want
    docs.unpersist()


def test_dedup_keep_rejects_unknown_method(spark):
    import pytest as _pytest

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        dedup.dedup_keep(docs, method="fuzzy")
