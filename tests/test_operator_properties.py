"""Property-based tests (hypothesis) for the round-6 pipeline operators:
each Spark program is checked against a brute-force Python model on
randomized micro-corpora."""

from __future__ import annotations

import sys
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")

from lightning_metastore_spark.operators.dedup import corpus_dup_spans  # noqa: E402
from lightning_metastore_spark.operators.packing import packed_offsets  # noqa: E402
from lightning_metastore_spark.operators.sampling import (  # noqa: E402
    mixture_resample)

WORD = st.sampled_from(["a", "bb", "ccc", "dd", "e"])
DOC = st.lists(WORD, min_size=1, max_size=12).map(" ".join)

_SETTINGS = dict(max_examples=8, deadline=None)


@settings(**_SETTINGS)
@given(st.lists(DOC, min_size=1, max_size=8), st.integers(2, 7))
def test_packing_matches_naive_cumsum(docs_texts, capacity):
    spark = _spark()
    rows = [(i * 3 + 1, t) for i, t in enumerate(docs_texts)]  # sparse ids
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in packed_offsets(df, capacity=capacity,
                                               n_blocks=3).collect()}
    cum = 0
    for doc_id, text in rows:
        n = len(text.split())
        r = out[doc_id]
        assert (r.start_offset, r.end_offset) == (cum, cum + n)
        assert r.first_chunk == cum // capacity
        assert r.last_chunk == max((cum + n - 1) // capacity, r.first_chunk)
        assert r.n_chunks == r.last_chunk - r.first_chunk + 1
        cum += n


@settings(**_SETTINGS)
@given(st.lists(DOC, min_size=2, max_size=8), st.integers(2, 4))
def test_dup_spans_match_bruteforce(docs_texts, k):
    spark = _spark()
    rows = [(i, t) for i, t in enumerate(docs_texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in corpus_dup_spans(df, k=k).collect()}
    # brute force: positional k-grams (whole text when shorter than k)
    spans = {}
    for doc_id, t in rows:
        toks = t.lower().split()
        if len(toks) >= k:
            spans[doc_id] = [" ".join(toks[i:i + k])
                             for i in range(len(toks) - k + 1)]
        else:
            spans[doc_id] = [" ".join(toks)]
    occ = Counter(g for gs in spans.values() for g in gs)
    for doc_id, gs in spans.items():
        r = out[doc_id]
        assert r.n_spans == len(gs)
        assert r.n_dup_spans == sum(1 for g in gs if occ[g] > 1)


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 100),
                          st.sampled_from(["en", "de", "fr"])),
                min_size=1, max_size=20, unique_by=lambda x: x[0]),
       st.floats(0.1, 1.0))
def test_mixture_resample_invariants(rows, target_frac):
    spark = _spark()
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    weights = {"en": 0.5, "de": 0.5}  # fr absent -> dropped
    out = mixture_resample(df, weights, target_frac=target_frac).collect()
    assert len(out) == len(rows)
    for r in out:
        assert 0.0 <= r.keep_rate <= 1.0
        if r.lang == "fr":
            assert r.keep_rate == 0.0 and not r.kept
        if r.keep_rate == 1.0:
            assert r.kept
        if r.keep_rate == 0.0:
            assert not r.kept


def _spark():
    from lightning_metastore_spark.session import get_spark
    s = get_spark("tests")
    s.sparkContext.setLogLevel("ERROR")
    return s


@settings(**_SETTINGS)
@given(st.lists(DOC, min_size=2, max_size=7))
def test_bigram_logprob_matches_bruteforce(docs_texts):
    import math

    from lightning_metastore_spark.functions.text import bigram_logprob

    spark = _spark()
    rows = [(i, t) for i, t in enumerate(docs_texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in bigram_logprob(df).collect()}
    toks = {i: t.lower().split() for i, t in rows}
    c1 = Counter(w for ts in toks.values() for w in ts)
    n_total = sum(c1.values())
    c2 = Counter((ts[j], ts[j + 1]) for ts in toks.values()
                 for j in range(len(ts) - 1))
    for i, ts in toks.items():
        grams = [(ts[j], ts[j + 1]) for j in range(len(ts) - 1)]
        if not grams:
            assert i not in out
            continue
        want = sum(math.log(0.7 * c2[g] / c1[g[0]]
                            + 0.3 * c1[g[1]] / n_total)
                   for g in grams) / len(grams)
        assert out[i].n_terms == len(grams)
        assert abs(out[i].avg_logprob - want) < 1e-7


@settings(**_SETTINGS)
@given(st.lists(DOC, min_size=1, max_size=6))
def test_incremental_equals_filtered_full_pairs(docs_texts):
    """incremental(batch, corpus artifacts) == full jaccard_pairs
    restricted to cross-split pairs, on any random corpus."""
    from lightning_metastore_spark.operators import dedup

    spark = _spark()
    rows = [(i, t) for i, t in enumerate(docs_texts * 2)]  # force dups
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    exact = {(r.doc_id_a, r.doc_id_b)
             for r in dedup.jaccard_pairs(df, threshold=0.5).collect()}
    cross = {(a, b) if a % 2 == 0 else (b, a)
             for a, b in exact if (a % 2) != (b % 2)}
    sh = dedup.shingles(df)
    sig = dedup.minhash_signatures(sh)
    from pyspark.sql import functions as F
    is_b = F.col("doc_id") % 2 == 0
    got = {(r.batch_id, r.corpus_id)
           for r in dedup.incremental_minhash_pairs(
               df.filter(is_b), sh.filter(~is_b),
               sig.filter(~is_b)).collect()}
    assert got == cross


from lightning_metastore_spark.operators.chunking import (  # noqa: E402
    chunk_documents)
from lightning_metastore_spark.functions.text import (  # noqa: E402
    build_vocab, encode_token_stats)


@settings(**_SETTINGS)
@given(st.lists(st.one_of(DOC, st.just("")), min_size=1, max_size=8),
       st.integers(2, 10), st.integers(0, 5))
def test_chunking_matches_naive(texts, chunk_size, overlap):
    import hashlib

    if overlap >= chunk_size:
        overlap = chunk_size - 1
    spark = _spark()
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.doc_id, r.chunk_id): (r.start_tok, r.end_tok, r.chunk_md5)
           for r in chunk_documents(df, chunk_size, overlap).collect()}
    stride = chunk_size - overlap
    want = {}
    for doc_id, text in rows:
        toks = text.split()
        n = len(toks)
        n_chunks = 1 if n <= chunk_size else -(-(n - chunk_size) // stride) + 1
        for c in range(n_chunks):
            s, e = c * stride, min(c * stride + chunk_size, n)
            want[(doc_id, c)] = (s, e, hashlib.md5(
                " ".join(toks[s:e]).encode()).hexdigest())
    assert got == want


@settings(**_SETTINGS)
@given(st.lists(st.one_of(DOC, st.just("")), min_size=1, max_size=8),
       st.integers(1, 6))
def test_token_encoding_matches_naive(texts, vocab_size):
    spark = _spark()
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    counts = Counter(w for _, t in rows for w in t.lower().split())
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    vocab = {w: i + 1 for i, (w, _) in enumerate(ranked[:vocab_size])}
    got_vocab = {r.token: r.token_id
                 for r in build_vocab(df, vocab_size).collect()}
    assert got_vocab == vocab
    got = {r.doc_id: (r.n_tokens, r.n_oov, r.n_distinct_ids, r.ids_checksum)
           for r in encode_token_stats(df, vocab_size).collect()}
    for doc_id, text in rows:
        ids = [vocab.get(w, 0) for w in text.lower().split()]
        assert got[doc_id] == (
            len(ids), sum(1 for x in ids if x == 0), len(set(ids)),
            sum((p + 1) * x for p, x in enumerate(ids)))


def test_null_and_degenerate_inputs_do_not_crash(spark):
    """Review batch: NULL text / NULL vectors are survivable everywhere
    an Arrow or size() path used to choke (scraped corpora contain
    them)."""
    from pyspark.sql import functions as F

    from lightning_metastore_spark.operators.bpe import (
        apply_bpe_merges, learn_bpe_merges)
    from lightning_metastore_spark.operators.chunking import chunk_documents
    from lightning_metastore_spark.operators.dedup import semantic_dedup
    from lightning_metastore_spark.operators.packing import greedy_pack_bins
    from lightning_metastore_spark.operators.unigram_lm import (
        apply_unigram_lm, train_unigram_lm)

    docs = spark.createDataFrame(
        [(1, "real text body here"), (2, None), (3, "")],
        "doc_id long, text string")

    merges = learn_bpe_merges(docs, n_merges=2, min_pair_freq=1)
    bpe = {r.doc_id: r.n_words for r in apply_bpe_merges(docs, merges).collect()}
    assert bpe[2] == 0 and bpe[3] == 0 and bpe[1] == 4

    pieces = train_unigram_lm(docs, vocab_size=8, em_iters=1,
                              max_piece_len=2, seed_size=16)
    ulm = {r.doc_id: r.n_words
           for r in apply_unigram_lm(docs, pieces).collect()}
    assert ulm[2] == 0 and ulm[1] == 4

    ch = chunk_documents(docs, chunk_size=4, overlap=1)
    per_doc = {r.doc_id for r in ch.collect()}
    assert per_doc == {1, 2, 3}          # every doc_id appears
    assert all(r.n_chunk_tokens >= 0 for r in ch.collect())

    bins = {r.doc_id: r for r in
            greedy_pack_bins(docs, capacity=8, n_shards=2).collect()}
    assert bins[2].n_tokens == 0 and bins[2].bin_fill >= 0

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.001]), (3, None), (4, None),
         (5, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>")
    sem = {r.vec_id: r.kept for r in semantic_dedup(emb, threshold=0.99,
                                                    n_planes=2).collect()}
    # degenerate rows survive as kept=1; the near-dup pair still dedups
    assert sem[3] == 1 and sem[4] == 1 and sem[5] == 1
    assert (sem[1], sem[2]) in {(1, 0), (0, 1)}


def test_weighted_sample_accepts_fractional_weights(spark):
    from lightning_metastore_spark.operators.sampling import (
        weighted_sample_n)

    df = spark.createDataFrame(
        [(i, 0.05 + (i % 10) / 10.0) for i in range(100)],
        "doc_id long, w double")
    out = weighted_sample_n(df, n=20, weight_col="w")
    assert out.count() == 20             # (0,1] weights are legal E-S input
    # zero/negative weights still rejected
    df2 = spark.createDataFrame([(1, 0.0), (2, -3.0), (3, 0.5)],
                                "doc_id long, w double")
    rows = weighted_sample_n(df2, n=5, weight_col="w").collect()
    assert [r.doc_id for r in rows] == [3]


def test_dedup_lines_literal_separator(spark):
    from lightning_metastore_spark.operators.cleaning import (
        dedup_lines_within_doc)

    df = spark.createDataFrame([(1, "a|b|a|c")], "doc_id long, text string")
    row = dedup_lines_within_doc(df, line_sep="|").collect()[0]
    assert row.text == "a|b|c" and (row.n_lines, row.n_kept) == (4, 3)


@settings(**_SETTINGS)
@given(st.lists(st.text(alphabet="abc xyz.", min_size=0, max_size=120),
                min_size=1, max_size=6),
       st.integers(8, 64))
def test_cdc_chunks_lossless_and_deterministic(texts, modulus):
    """CDC property: for ANY text, chunk lengths reassemble the
    whitespace-normalized text exactly and chunking is deterministic."""
    import re

    from lightning_metastore_spark.operators.dedup import cdc_chunks

    spark = _spark()
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = cdc_chunks(df, modulus=modulus).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, t in rows:
        norm = re.sub(r"\s+", " ", t, flags=re.ASCII)
        got = sorted(by_doc.get(i, []), key=lambda r: r.ck)
        if not norm:
            assert got == []
            continue
        assert sum(r.chunk_len for r in got) == len(norm)
        assert [r.ck for r in got] == list(range(1, len(got) + 1))
        assert all(r.chunk_len >= 1 for r in got)
    again = cdc_chunks(df, modulus=modulus).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 15), st.integers(0, 15)),
                min_size=1, max_size=25),
       st.booleans())
def test_pagerank_mass_conserved_any_graph(edge_list, symmetric):
    """PageRank property: total rank mass is 1 on any graph, in both
    the symmetric and the directed (dangling-corrected) mode."""
    from lightning_metastore_spark.operators.graph import pagerank

    edges = [(a, b) for a, b in edge_list if a != b]
    if not edges:
        return
    spark = _spark()
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = pagerank(df, n_iter=3, symmetrize=symmetric).collect()
    total = sum(r["rank"] for r in rows)
    assert abs(total - 1.0) < 1e-9
    assert all(r["rank"] > 0 for r in rows)


@settings(**_SETTINGS)
@given(st.lists(
    st.tuples(st.integers(0, 4),          # user_id — few users, heavy reuse
              st.integers(0, 3),          # ts second — heavy collisions
              st.sampled_from(["s1", "s2", "s3", "noise"])),
    min_size=1, max_size=30))
def test_funnel_strict_ordering_under_timestamp_ties(events):
    """funnel_counts' strict-ordering semantics under adversarial
    timestamp ties (the DuckDB oracle can't see this): a stage-k event
    at the SAME timestamp as the user's t_{k-1} must NOT advance the
    funnel — only ts strictly greater counts. Checked against a
    sequential twin of the published definition: t_1(u) = min ts of a
    stage-1 event, t_k(u) = min ts of a stage-k event with
    ts > t_{k-1}(u)."""
    import datetime as dt

    from lightning_metastore_spark.operators.temporal import funnel_counts

    stages = ["s1", "s2", "s3"]
    t0 = dt.datetime(2024, 1, 1)
    rows = [(u, t0 + dt.timedelta(seconds=s), e) for u, s, e in events]

    # sequential twin
    per_user: dict[int, list] = {}
    for u, ts, e in rows:
        per_user.setdefault(u, []).append((ts, e))
    reached = [0] * len(stages)
    for u, evs in per_user.items():
        t_prev = None
        for k, stage in enumerate(stages):
            cand = [ts for ts, e in evs if e == stage
                    and (t_prev is None or ts > t_prev)]
            if not cand:
                break
            t_prev = min(cand)
            reached[k] += 1

    spark = _spark()
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {r.stage_idx: (r.n_users, r.conversion)
           for r in funnel_counts(df, stages).collect()}
    assert [got[k + 1][0] for k in range(len(stages))] == reached
    base = max(reached[0], 1)
    for k in range(len(stages)):
        assert got[k + 1][1] == round(reached[k] / base, 6)


@settings(**_SETTINGS)
@given(st.lists(DOC, min_size=2, max_size=8), st.integers(2, 4))
def test_remove_dup_spans_matches_bruteforce(docs_texts, k):
    """Randomized twin for the span REMOVAL operator: every token
    covered by any corpus-duplicated k-window (>= 2 occurrences,
    within- or cross-doc) is excised; survivors keep their order."""
    from lightning_metastore_spark.operators.dedup import remove_dup_spans

    spark = _spark()
    rows = [(i, t) for i, t in enumerate(docs_texts)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    grams: Counter = Counter()
    toks = {i: t.lower().split() for i, t in rows}
    for tk in toks.values():
        if len(tk) < k:
            grams[tuple(tk)] += 1
        else:
            for i in range(len(tk) - k + 1):
                grams[tuple(tk[i:i + k])] += 1

    out = {r.doc_id: r for r in remove_dup_spans(df, k=k).collect()}
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
        assert out[did].clean_text == " ".join(kept), (did, tk)
        assert out[did].n_removed == sum(covered)


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 9)),
                min_size=1, max_size=40),
       st.integers(1, 4))
def test_rolling_active_users_matches_bruteforce(user_days, window_days):
    """DAU/WAU twin: n_active(day) = distinct users with >= 1 event in
    the window_days window ending at day, for every day from the first
    activity to the last (trailing windows after the last observed day
    are dropped)."""
    import datetime as dt

    from lightning_metastore_spark.operators.temporal import (
        rolling_active_users)

    t0 = dt.datetime(2024, 3, 1)
    rows = [(u, t0 + dt.timedelta(days=d, hours=u % 3))
            for u, d in user_days]
    spark = _spark()
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {r.day.date(): r.n_active
           for r in rolling_active_users(df, window_days).collect()}

    days_by_user: dict = {}
    for u, d in user_days:
        days_by_user.setdefault(u, set()).add(d)
    max_d = max(d for _, d in user_days)
    want = {}
    for day in range(0, max_d + 1):
        lo = day - window_days + 1
        n = sum(1 for u, ds in days_by_user.items()
                if any(lo <= d <= day for d in ds))
        if n:
            want[(t0 + dt.timedelta(days=day)).date()] = n
    assert got == want


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 9)),
                min_size=1, max_size=40),
       st.integers(1, 5))
def test_retention_cohorts_matches_bruteforce(user_days, max_offset):
    """Cohort-retention twin: for each first-day cohort and offset,
    n_active = distinct cohort users active exactly offset days after
    their first day; retention = n_active / cohort_size; offset 0 is
    always 1.0."""
    import datetime as dt

    from lightning_metastore_spark.operators.temporal import (
        retention_cohorts)

    t0 = dt.datetime(2024, 3, 1)
    rows = [(u, t0 + dt.timedelta(days=d, hours=u % 3))
            for u, d in user_days]
    spark = _spark()
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {(r.cohort_day.date(), r.offset_days): (r.n_active, r.retention)
           for r in retention_cohorts(df, max_offset).collect()}

    days_by_user: dict = {}
    for u, d in user_days:
        days_by_user.setdefault(u, set()).add(d)
    first = {u: min(ds) for u, ds in days_by_user.items()}
    cohort_users: dict = {}
    for u, f in first.items():
        cohort_users.setdefault(f, set()).add(u)
    want = {}
    for f, users in cohort_users.items():
        for off in range(0, max_offset + 1):
            n = sum(1 for u in users if f + off in days_by_user[u])
            if n:
                want[((t0 + dt.timedelta(days=f)).date(), off)] = \
                    (n, round(n / len(users), 6))
    assert got == want
    for (day, off), (n, r) in got.items():
        if off == 0:
            assert r == 1.0


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 20)),
                min_size=1, max_size=20),
       st.lists(st.tuples(st.integers(0, 3), st.integers(0, 20),
                          st.integers(0, 99)),
                min_size=0, max_size=20),
       st.one_of(st.none(), st.integers(1, 8)))
def test_asof_join_matches_bruteforce(left_rows, right_rows, tol):
    """Backward as-of twin under heavy key/timestamp collisions: each
    left row takes the LATEST deduplicated right value with
    right.ts <= left.ts (ties match), NULLed when older than the
    tolerance window."""
    import datetime as dt

    from lightning_metastore_spark.operators.temporal import asof_join

    spark = _spark()
    t0 = dt.datetime(2024, 6, 1)

    # deduplicate the right side per (key, ts) — the operator's
    # documented precondition for fully deterministic output: keep the
    # max value per (key, ts)
    rdedup: dict = {}
    for u, s, v in right_rows:
        rk = (u, s)
        rdedup[rk] = max(rdedup.get(rk, -1), v)

    left = spark.createDataFrame(
        [(i, u, t0 + dt.timedelta(seconds=s))
         for i, (u, s) in enumerate(left_rows)],
        "row_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(u, t0 + dt.timedelta(seconds=s), v)
         for (u, s), v in sorted(rdedup.items())],
        "user_id long, ts timestamp, val long") \
        if rdedup else spark.createDataFrame(
        [], "user_id long, ts timestamp, val long")

    got = {r.row_id: r.val_asof
           for r in asof_join(left, right, tolerance_seconds=tol)
           .collect()}

    for i, (u, s) in enumerate(left_rows):
        cands = [(rs, v) for (ru, rs), v in rdedup.items()
                 if ru == u and rs <= s]
        want = None
        if cands:
            rs, v = max(cands)
            if tol is None or s - rs <= tol:
                want = v
        assert got[i] == want, (i, u, s, got[i], want)


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 1), st.integers(0, 40)),
                min_size=1, max_size=15),
       st.lists(st.tuples(st.integers(0, 1), st.integers(0, 40)),
                min_size=1, max_size=15),
       st.integers(-4, 4), st.integers(1, 6))
def test_range_join_matches_bruteforce(lrows, rrows, lo, width):
    """Band-bucketed range join vs the naive double loop, with values
    sitting exactly on bucket boundaries (integers over a small range,
    inclusive BETWEEN on both ends, optional equi-key)."""
    from lightning_metastore_spark.operators.temporal import range_join

    hi = lo + width
    spark = _spark()
    left = spark.createDataFrame(
        [(i, k, float(v) / 2) for i, (k, v) in enumerate(lrows)],
        "lid long, k long, lv double")
    right = spark.createDataFrame(
        [(j, k, float(v) / 2) for j, (k, v) in enumerate(rrows)],
        "rid long, k long, rv double")
    got = sorted((r.lid, r.rid) for r in range_join(
        left, right, "lv", "rv", float(lo), float(hi),
        by=("k",)).collect())
    want = sorted(
        (i, j)
        for i, (lk, lv) in enumerate(lrows)
        for j, (rk, rv) in enumerate(rrows)
        if lk == rk and lv / 2 + lo <= rv / 2 <= lv / 2 + hi)
    assert got == want


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 300)),
                min_size=1, max_size=30),
       st.integers(1, 10))
def test_sessionize_matches_bruteforce(events, gap_minutes):
    """Gap-sessionization twin under dense/tied timestamps: session
    boundaries open exactly when the idle gap exceeds gap_minutes;
    counts, starts and ends match a sequential sweep."""
    import datetime as dt

    from lightning_metastore_spark.operators.temporal import sessionize

    t0 = dt.datetime(2024, 1, 1)
    rows = [(u, t0 + dt.timedelta(minutes=m)) for u, m in events]
    spark = _spark()
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {(r.user_id, r.session_id):
           (r.n_events, r.session_start, r.session_end)
           for r in sessionize(df, gap_minutes=gap_minutes).collect()}

    per_user: dict = {}
    for u, m in events:
        per_user.setdefault(u, []).append(m)
    want = {}
    for u, ms in per_user.items():
        ms.sort()
        sid, n, start = 0, 0, None
        prev = None
        for m in ms:
            if prev is None or m - prev > gap_minutes:
                if sid:
                    want[(u, sid)] = (n, t0 + dt.timedelta(minutes=start),
                                      t0 + dt.timedelta(minutes=prev))
                sid += 1
                n, start = 0, m
            n += 1
            prev = m
        want[(u, sid)] = (n, t0 + dt.timedelta(minutes=start),
                          t0 + dt.timedelta(minutes=prev))
    assert got == want


@settings(**_SETTINGS)
@given(st.lists(DOC, min_size=1, max_size=6),
       st.lists(DOC, min_size=1, max_size=6),
       st.integers(2, 4))
def test_span_admission_matches_bruteforce(corpus_texts, batch_texts, k):
    """Incremental span admission twin: known spans are exactly the
    batch windows whose token sequence exists anywhere in the corpus
    (whole-text window for short docs)."""
    from lightning_metastore_spark.operators.dedup import (
        span_batch_against_index, span_index)

    spark = _spark()
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)], ["doc_id", "text"])
    batch = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(batch_texts)],
        ["doc_id", "text"])

    def windows(text):
        tk = text.lower().split()
        if len(tk) < k:
            return [tuple(tk)]
        return [tuple(tk[i:i + k]) for i in range(len(tk) - k + 1)]

    corpus_grams = {w for t in corpus_texts for w in windows(t)}
    idx = span_index(corpus, k=k)
    out = {r.doc_id: r for r in span_batch_against_index(
        batch, idx, k=k).collect()}
    for i, t in enumerate(batch_texts):
        ws = windows(t)
        known = sum(1 for w in ws if w in corpus_grams)
        r = out[100 + i]
        assert (r.n_spans, r.n_known_spans) == (len(ws), known), (i, t)


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 200),
                          st.sampled_from(["en", "de", "fr", "zh"])),
                min_size=1, max_size=24, unique_by=lambda x: x[0]),
       st.sampled_from([0.0, 0.5, 1.0, 2.0]),
       st.floats(0.1, 1.0))
def test_temperature_resample_invariants(rows, tau, target_frac):
    """Rates in [0,1]; expected kept mass sum(rate_g * n_g) never
    exceeds target_frac * N (the cap only loses mass); at tau=1 every
    rate equals target_frac; decisions consistent with rates."""
    from lightning_metastore_spark.operators.sampling import (
        temperature_resample)

    spark = _spark()
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    out = temperature_resample(df, tau=tau, target_frac=target_frac).collect()
    assert len(out) == len(rows)
    n = Counter(lang for _, lang in rows)
    mass = sum(r.keep_rate for r in out)
    assert mass <= target_frac * len(rows) + 1e-6 * len(rows)
    for r in out:
        assert 0.0 <= r.keep_rate <= 1.0
        if tau == 1.0:
            assert abs(r.keep_rate - round(target_frac, 6)) <= 1e-6
        if r.keep_rate == 1.0:
            assert r.kept
        if r.keep_rate == 0.0:
            assert not r.kept


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 300), st.integers(-5, 5), DOC),
                min_size=1, max_size=16, unique_by=lambda x: x[0]),
       st.integers(1, 40), st.integers(2, 6))
def test_budget_select_matches_single_window(rows, budget, n_blocks):
    """Randomized twin of the scale-shape contract: cum_tokens always
    equals the naive global (score DESC, id) cumulative sum — heavy
    score ties included — and selection is the prefix rule."""
    from lightning_metastore_spark.operators.sampling import budget_select

    spark = _spark()
    df = spark.createDataFrame(rows, ["doc_id", "score", "text"])
    out = {r.doc_id: r for r in
           budget_select(df, budget_tokens=budget, score_col="score",
                         n_blocks=n_blocks).collect()}
    cum = 0
    for doc_id, _, text in sorted(rows, key=lambda t: (-t[1], t[0])):
        cum += len(text.split())
        r = out[doc_id]
        assert r.cum_tokens == cum
        assert bool(r.selected) == (cum <= budget)


@settings(**_SETTINGS)
@given(st.lists(st.lists(st.tuples(st.integers(0, 30),
                                   st.integers(0, 9).map(float)),
                         min_size=1, max_size=8,
                         unique_by=lambda x: x[0]),
                min_size=1, max_size=3),
       st.integers(1, 80))
def test_rrf_fuse_matches_bruteforce(lists, k0):
    """Randomized RRF twin: ranks, reciprocal-rank sums and the fused
    order all match a Python model for any number of lists with
    arbitrary overlap and score ties."""
    from lightning_metastore_spark.operators.retrieval import rrf_fuse

    spark = _spark()
    dfs = [spark.createDataFrame(rows, "doc_id long, score double")
           for rows in lists]
    got = {r.doc_id: r for r in rrf_fuse(dfs, k0=k0).collect()}
    ranks = []
    for rows in lists:
        order = sorted(rows, key=lambda t: (-t[1], t[0]))
        ranks.append({d: i + 1 for i, (d, _) in enumerate(order)})
    docs = sorted({d for rk in ranks for d in rk})
    score = {d: round(sum(1.0 / (k0 + rk[d]) for rk in ranks if d in rk), 9)
             for d in docs}
    fused = sorted(docs, key=lambda d: (-score[d], d))
    assert set(got) == set(docs)
    for pos, d in enumerate(fused, 1):
        assert got[d].fused_rank == pos
        assert got[d].rrf_score == score[d]
        for i, rk in enumerate(ranks):
            assert got[d][f"rank_{i}"] == rk.get(d)


@settings(**_SETTINGS)
@given(st.lists(st.text(max_size=40), min_size=1, max_size=8))
def test_normalize_text_matches_python_model(texts):
    """Randomized twin over arbitrary Unicode (controls, NBSP, astral
    chars, exotic whitespace): NFC + control strip + Java-\\s-semantics
    collapse ([\\t\\n\\r space NBSP] after the strip — NOT Python's
    wider \\s) + space trim, modeled exactly in Python."""
    import re
    import unicodedata

    from lightning_metastore_spark.operators.cleaning import normalize_text

    spark = _spark()
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in normalize_text(df, form="NFC").collect()}

    ctrl = re.compile("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f"
                      "\\u0080-\\u0084\\u0086-\\u009f]")
    ws = re.compile("[\\t\\n\\r \\x85 ]+")
    for i, t in rows:
        want = ws.sub(" ", ctrl.sub("", unicodedata.normalize("NFC", t)))
        want = want.strip(" ")
        r = got[i]
        assert r.text_norm == want, (repr(t), repr(r.text_norm), repr(want))
        assert r.n_chars_before == len(t)
        assert r.n_chars_after == len(want)
        assert bool(r.changed) == (want != t)


URL_SCHEME = st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp", ""])
URL_HOST = st.sampled_from(["A.com", "example.ORG", "x.Y.z"])
URL_PORT = st.sampled_from(["", ":80", ":443", ":8080"])
URL_PATH = st.sampled_from(["", "/", "/p", "/p/Q/"])
URL_PARAM = st.sampled_from(["a=1", "b=2", "utm_x=9", "gclid=g", "z",
                             "A=3", "ref=t", ""])
URL_FRAG = st.sampled_from(["", "#f", "#sec/2?x=1"])


@st.composite
def _url(draw):
    scheme = draw(URL_SCHEME)
    q = "&".join(draw(st.lists(URL_PARAM, max_size=4)))
    return ((scheme + "://" if scheme else "") + draw(URL_HOST)
            + draw(URL_PORT) + draw(URL_PATH)
            + ("?" + q if q else "") + draw(URL_FRAG))


@settings(**_SETTINGS)
@given(st.lists(_url(), min_size=1, max_size=12))
def test_url_canonicalize_matches_twin_randomized(urls):
    from tests.test_html import _twin_canon

    from lightning_metastore_spark.functions.html import url_canonicalize

    spark = _spark()
    df = spark.createDataFrame(list(enumerate(urls)),
                               "doc_id long, url string")
    got = {r.doc_id: r.canonical_url for r in url_canonicalize(df).collect()}
    assert got == {i: _twin_canon(u) for i, u in enumerate(urls)}


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 500),
                          st.sampled_from(["head", "middle", "tail", "x"])),
                min_size=1, max_size=20, unique_by=lambda x: x[0]),
       st.floats(0.0, 1.0), st.floats(0.0, 1.0))
def test_bucket_resample_matches_twin_randomized(rows, r_mid, r_tail):
    import hashlib

    from lightning_metastore_spark.operators.sampling import bucket_resample

    spark = _spark()
    df = spark.createDataFrame(rows, "doc_id long, bucket string")
    rates = {"head": 1.0, "middle": r_mid, "tail": r_tail}
    got = {r.doc_id: (r.keep_rate, r.kept)
           for r in bucket_resample(df, rates).collect()}
    for i, b in rows:
        rate = rates.get(b, 0.0)
        if rate >= 1.0:
            kept = True
        else:
            h = hashlib.md5(f"bkt:{i}".encode()).hexdigest()[:8]
            kept = h < format(int(rate * 4294967296.0), "08x")
        assert got[i] == (round(rate, 6), kept), (i, b, rate)


@settings(**_SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 300),
                          st.sampled_from(["en", "de"]),
                          st.integers(-5, 5)),
                min_size=1, max_size=16, unique_by=lambda x: x[0]))
def test_perplexity_buckets_matches_twin_randomized(rows):
    from tests.test_lm_filter import _twin_buckets

    from lightning_metastore_spark.operators.lm_filter import (
        perplexity_buckets)

    spark = _spark()
    scored = spark.createDataFrame(
        [(d, g, float(s)) for d, g, s in rows],
        "doc_id long, lang string, avg_logprob double")
    got = {r.doc_id: (r.lang, r.avg_logprob, r.rank_frac, r.bucket)
           for r in perplexity_buckets(scored).collect()}
    assert got == _twin_buckets([(d, g, float(s)) for d, g, s in rows])
