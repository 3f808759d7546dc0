"""Contamination-check and mixture-resampling operator tests."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from lightning_metastore_spark.operators.contamination import (  # noqa: E402
    contamination_overlap)
from lightning_metastore_spark.operators.sampling import (  # noqa: E402
    mixture_resample)


def test_contamination_overlap_micro(spark):
    train = spark.createDataFrame([
        (1, "the quick brown fox jumps high"),   # shares "the quick brown",
                                                 # "quick brown fox"
        (2, "totally different words here now"),
        (3, "short doc"),                        # < n words -> whole-text shingle
    ], ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(100, "the quick brown fox runs away")], ["doc_id", "text"])
    out = {r.doc_id: r for r in contamination_overlap(train, bench, n=3).collect()}
    assert out[1].n_shingles == 4 and out[1].n_contaminated == 2
    assert out[1].contam_frac == 0.5 and bool(out[1].is_contaminated)
    assert out[2].n_contaminated == 0 and not bool(out[2].is_contaminated)
    assert out[3].n_shingles == 1 and out[3].n_contaminated == 0


def test_contamination_is_deterministic(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    train = docs.filter(F.col("doc_id") % 25 != 0)
    a = contamination_overlap(train, bench).orderBy("doc_id").collect()
    b = contamination_overlap(train, bench).orderBy("doc_id").collect()
    assert a == b and len(a) == train.count()


def test_mixture_resample_rates_and_determinism(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    weights = {"en": 0.3, "de": 0.1, "fr": 0.3, "es": 0.15, "zh": 0.15}
    out = mixture_resample(docs, weights, target_frac=0.6)
    rows = out.orderBy("doc_id").collect()
    assert len(rows) == docs.count()
    # fr is over-weighted relative to its share -> rate capped at 1.0,
    # meaning every fr doc is kept
    fr = [r for r in rows if r.lang == "fr"]
    assert fr and all(r.keep_rate == 1.0 and r.kept for r in fr)
    # kept fraction per language approximates its rate (hash-uniformity)
    for lang in ("en", "zh"):
        grp = [r for r in rows if r.lang == lang]
        rate = grp[0].keep_rate
        kept_frac = sum(r.kept for r in grp) / len(grp)
        assert abs(kept_frac - rate) < 0.2
    # decisions are a pure function of doc_id -> rerun is identical
    assert rows == out.orderBy("doc_id").collect()


def test_mixture_resample_unknown_group_dropped(spark):
    docs = spark.createDataFrame(
        [(1, "en"), (2, "xx"), (3, "en")], ["doc_id", "lang"])
    out = {r.doc_id: r for r in
           mixture_resample(docs, {"en": 1.0}, target_frac=0.5).collect()}
    assert out[2].keep_rate == 0.0 and not out[2].kept


def test_weighted_sample_n_matches_naive(spark):
    """A-ES weighted sampling: exact naive-twin equality (same md5
    uniforms, same key formula), heavy weights dominate, zero-weight
    rows excluded."""
    import hashlib
    import math

    from lightning_metastore_spark.operators.sampling import (
        weighted_sample_n)

    rows = [(i, 1 + (i % 5)) for i in range(200)] + [(999, 100000), (998, 0)]
    docs = spark.createDataFrame(rows, "doc_id long, w long")
    got = [(r.doc_id, r.sample_rank)
           for r in weighted_sample_n(docs, n=30, weight_col="w",
                                      id_col="doc_id").collect()]

    def key(i, w):
        h = int(hashlib.md5(f"wsample:{i}".encode()).hexdigest()[:8], 16)
        u = (h + 1.0) / 4294967297.0
        return round(-math.log(u) / w, 9)

    want = sorted(((key(i, w), i) for i, w in rows if w >= 1))[:30]
    assert got == [(i, rk + 1) for rk, (_, i) in enumerate(want)]
    assert got[0][0] == 999          # the 100000-weight doc wins
    assert all(i != 998 for i, _ in got)


# --- Bloom-filter decontamination artifact ---------------------------------

def _bloom_fixture(spark):
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc {i} unique tail words here") for i in range(20)]
        + [(100, "secret benchmark question one two three"),
           (101, "another held out example four five six")],
        ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(1, "secret benchmark question one two three"),
         (2, "another held out example four five six")],
        ["doc_id", "text"])
    return docs, bench


def test_bloom_contamination_no_false_negatives_and_exact_at_size(spark):
    """Zero false negatives by construction; at a comfortably-sized
    filter the FP term vanishes and the Bloom output EQUALS the exact
    broadcast-set operator row for row."""
    from lightning_metastore_spark.operators.contamination import (
        bloom_contamination, bloom_fp_rate, build_ngram_bloom,
        contamination_overlap)

    docs, bench = _bloom_fixture(spark)
    bloom = build_ngram_bloom(bench, n=3, n_bits=1 << 18, k=5)
    assert bloom["n_grams"] > 0 and bloom_fp_rate(bloom) < 1e-10

    got = sorted(map(tuple, bloom_contamination(docs, bloom).collect()))
    want = sorted(map(tuple, contamination_overlap(docs, bench, n=3).collect()))
    assert got == want
    flagged = {r[0] for r in got if r[4]}
    assert flagged == {100, 101}


def test_bloom_contamination_superset_under_small_filter(spark):
    """An undersized filter may over-flag (false positives) but can
    NEVER under-count: per-doc n_contaminated >= the exact operator's."""
    from lightning_metastore_spark.operators.contamination import (
        bloom_contamination, build_ngram_bloom, contamination_overlap)

    docs, bench = _bloom_fixture(spark)
    bloom = build_ngram_bloom(bench, n=3, n_bits=64, k=2)  # deliberately tiny
    got = {r.doc_id: r.n_contaminated
           for r in bloom_contamination(docs, bloom).collect()}
    want = {r.doc_id: r.n_contaminated
            for r in contamination_overlap(docs, bench, n=3).collect()}
    assert set(got) == set(want)
    assert all(got[d] >= want[d] for d in want)
    # the held-out docs are still fully contaminated
    assert got[100] >= want[100] > 0


def test_bloom_fp_rate_tracks_theory(spark):
    """Measured FP frequency on novel grams stays within ~4x of the
    analytic (1-e^(-kn/m))^k (generous bound for a small sample)."""
    from lightning_metastore_spark.operators.contamination import (
        _bloom_positions, bloom_fp_rate, build_ngram_bloom)

    import numpy as np

    bench = spark.createDataFrame(
        [(i, f"bench gram {i} alpha {i * 7} beta {i * 13}")
         for i in range(100)], ["doc_id", "text"])
    bloom = build_ngram_bloom(bench, n=3, n_bits=1 << 12, k=3)
    theory = bloom_fp_rate(bloom)
    assert 0 < theory < 0.5
    bits = np.frombuffer(bloom["bits"], dtype=np.uint8)
    novel = [f"novel {i} gram {i * 31}" for i in range(4000)]
    fp = sum(
        all(bits[p >> 3] & (1 << (p & 7))
            for p in _bloom_positions(s, bloom["k"], bloom["n_bits"]))
        for s in novel) / len(novel)
    assert fp <= 4 * theory + 0.01


def test_bloom_artifact_roundtrip_and_partition_invariance(spark, tmp_path):
    from lightning_metastore_spark.operators.contamination import (
        bloom_contamination, build_ngram_bloom, load_ngram_bloom,
        save_ngram_bloom)

    docs, bench = _bloom_fixture(spark)
    bloom = build_ngram_bloom(bench, n=3)
    path = str(tmp_path / "bloom_artifact")
    save_ngram_bloom(spark, bloom, path)
    loaded = load_ngram_bloom(spark, path)
    assert loaded == bloom

    a = sorted(map(tuple, bloom_contamination(docs, bloom).collect()))
    b = sorted(map(tuple, bloom_contamination(
        docs.repartition(7), loaded).collect()))
    assert a == b
    # build is partition-invariant too (partial-bitmap OR is commutative)
    bloom2 = build_ngram_bloom(bench.repartition(5), n=3)
    assert bloom2["bits"] == bloom["bits"] and \
        bloom2["n_grams"] == bloom["n_grams"]


def test_bloom_positions_python_jvm_agree(spark):
    """The md5 double-hash position derivation is the engine-portable
    contract: the Python reference (_bloom_positions — used by tests
    and any external verifier), the JVM codegen expression
    (_bloom_position_cols — used by build and membership), and the
    DuckDB gate oracle must all emit identical positions. Pin the
    first two here (the oracle is pinned by the correctness gate)."""
    from pyspark.sql import functions as F

    from lightning_metastore_spark.operators.contamination import (
        _bloom_position_cols, _bloom_positions)

    strs = ["alpha beta gamma", "", "a", "秘密 基准 问题",
            "one two three four", "x" * 200]
    for n_bits, k in ((1 << 20, 4), (64, 2), (1 << 12, 7)):
        df = spark.createDataFrame([(s,) for s in strs], ["s"])
        got = {r["s"]: list(r["ps"]) for r in df.select(
            "s", _bloom_position_cols(F.col("s"), k, n_bits).alias("ps"))
            .collect()}
        for s in strs:
            assert got[s] == _bloom_positions(s, k, n_bits), (s, n_bits, k)


def test_bloom_build_exact_at_8mb_filter(spark):
    """The distributed bit_or build must produce the EXACT bitmap at a
    large (8 MB, n_bits=2^26) filter: every expected bit set, no other
    bit set, driver receiving only word rows (never p partial bitmaps).
    Expected bits are recomputed in pure Python from the distinct gram
    set via _bloom_positions — the engine-portable reference."""
    import numpy as np

    from lightning_metastore_spark.operators.contamination import (
        _bloom_positions, build_ngram_bloom)
    from lightning_metastore_spark.operators.dedup import shingles

    bench = spark.createDataFrame(
        [(i, f"gram {i} alpha {i * 7} beta {i * 13} gamma {i % 11}")
         for i in range(300)], ["doc_id", "text"])
    n_bits, k = 1 << 26, 4
    bloom = build_ngram_bloom(bench.repartition(13), n=3,
                              n_bits=n_bits, k=k)
    grams = {r["shingle"] for r in
             shingles(bench, 3).select("shingle").distinct().collect()}
    want = np.zeros(n_bits // 8, dtype=np.uint8)
    for s in grams:
        for p in _bloom_positions(s, k, n_bits):
            want[p >> 3] |= np.uint8(1 << (p & 7))
    got = np.frombuffer(bloom["bits"], dtype=np.uint8)
    assert bloom["n_grams"] == len(grams)
    assert len(bloom["bits"]) == n_bits // 8
    assert np.array_equal(got, want)


def test_bloom_build_supports_non_word_aligned_n_bits(spark):
    """Any multiple-of-8 n_bits is legal (the ceil-sized word array +
    byte truncation): n_bits=1032 must build, size to 129 bytes, and
    probe without IndexError."""
    from lightning_metastore_spark.operators.contamination import (
        bloom_contamination, build_ngram_bloom)

    docs, bench = _bloom_fixture(spark)
    bloom = build_ngram_bloom(bench, n=3, n_bits=1032, k=2)
    assert len(bloom["bits"]) == 129 and bloom["n_grams"] == 9
    out = bloom_contamination(docs, bloom).collect()
    assert len(out) == docs.count()
    flagged = {r.doc_id for r in out if r.is_contaminated}
    assert {100, 101} <= flagged   # no false negatives, any n_bits


# --- temperature resampling + token-budget selection -----------------------

def test_temperature_resample_tau1_is_natural(spark):
    """tau=1 keeps natural proportions: every group's rate is exactly
    target_frac (share_g * N / n_g == 1), so keep_rate == target_frac
    everywhere after the 6dp round."""
    from lightning_metastore_spark.operators.sampling import (
        temperature_resample)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = temperature_resample(docs, tau=1.0, target_frac=0.6).collect()
    assert len(rows) == docs.count()
    assert all(r.keep_rate == 0.6 for r in rows)


def test_temperature_resample_tau05_matches_python_twin(spark):
    """tau=0.5 replays the integer-frozen sqrt path bit-for-bit in pure
    Python (hashlib md5, same fixed IEEE evaluation order) — the same
    determinism contract the sampling_quantize_suite 'temperature' gate
    pins against DuckDB."""
    import hashlib
    import math
    from collections import Counter

    from lightning_metastore_spark.operators.sampling import (
        temperature_resample)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    langs = {r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()}
    n = Counter(langs.values())
    s = {g: int(round(math.sqrt(ng) * 1e9)) for g, ng in n.items()}
    s_total, n_total = sum(s.values()), sum(n.values())
    rate = {g: min(1.0, 0.6 * (s[g] / s_total) * n_total / n[g]) for g in n}

    def kept(doc_id, g):
        r = rate[g]
        if r >= 1.0:
            return True
        thr = format(math.floor(r * 4294967296.0), "08x")
        return hashlib.md5(f"temp:{doc_id}".encode()).hexdigest()[:8] < thr

    out = temperature_resample(docs, tau=0.5, target_frac=0.6).collect()
    assert len(out) == len(langs)
    for r in out:
        g = langs[r.doc_id]
        assert r.keep_rate == round(rate[g], 6), (r.doc_id, g)
        assert bool(r.kept) == kept(r.doc_id, g), (r.doc_id, g)


def test_temperature_resample_flattens_toward_tail(spark):
    """Smoothing up-weights minority groups: the tail group's keep rate
    strictly exceeds the head group's at tau=0.5, and tau=0 gives both
    groups equal target shares (uniform)."""
    from lightning_metastore_spark.operators.sampling import (
        temperature_resample)

    rows = [(i, "en") for i in range(90)] + [(1000 + i, "fr")
                                             for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    by_lang = {}
    for r in temperature_resample(docs, tau=0.5, target_frac=0.5).collect():
        by_lang[r.lang] = r.keep_rate
    assert by_lang["fr"] > by_lang["en"]
    # tau -> 0: uniform shares; fr (10 docs) gets 0.5 * 0.5 * 100 / 10,
    # capped at 1.0
    caps = {r.lang: r.keep_rate for r in
            temperature_resample(docs, tau=0.0, target_frac=0.5).collect()}
    assert caps["fr"] == 1.0


def test_budget_select_equals_single_window_twin(spark):
    """The blocked prefix sum equals the naive single-partition window
    bit-for-bit: same cum_tokens and selection at any block count and
    any input partitioning (approx cuts only move block balance)."""
    from lightning_metastore_spark.operators.sampling import budget_select

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = {r.doc_id: (r.text or "", int(r.n_chars)) for r in docs.collect()}
    order = sorted(texts, key=lambda d: (-texts[d][1], d))
    want, cum = {}, 0
    for d in order:
        nt = len(texts[d][0].split())
        cum += nt
        want[d] = (nt, cum, cum <= 25000)

    outs = [budget_select(df, budget_tokens=25000, score_col="n_chars",
                          n_blocks=nb).collect()
            for df, nb in ((docs, 2), (docs.repartition(13), 5),
                           (docs.repartition(1), 64))]
    for rows in outs:
        assert len(rows) == len(texts)
        for r in rows:
            nt, cm, sel = want[r.doc_id]
            assert (r.n_tokens, r.cum_tokens, bool(r.selected)) == \
                (nt, cm, sel), r.doc_id


def test_budget_select_null_scores_dropped(spark):
    """NULL scores cannot be placed in the score order — the documented
    contract drops them; non-null rows are unaffected."""
    from lightning_metastore_spark.operators.sampling import budget_select

    docs = spark.createDataFrame(
        [(1, 5.0, "a b c"), (2, None, "d e"), (3, 1.0, "f")],
        "doc_id long, q double, text string")
    rows = {r.doc_id: r for r in
            budget_select(docs, budget_tokens=3, score_col="q").collect()}
    assert set(rows) == {1, 3}
    assert rows[1].cum_tokens == 3 and bool(rows[1].selected)
    assert rows[3].cum_tokens == 4 and not bool(rows[3].selected)


def test_epoch_schedule_matches_python_twin_and_temperature(spark):
    """epoch_schedule replays the integer-frozen share math in Python
    (epochs = floor(target/n), residual in [0,1)) and decomposes the
    SAME per-doc factor temperature_resample caps: where epochs == 0
    the residual equals the resample keep_rate; an up-sampled group
    shows epochs >= 1 exactly where the resample rate saturated at 1."""
    import math
    from collections import Counter

    from lightning_metastore_spark.operators.sampling import (
        epoch_schedule, temperature_resample)

    rows = [(i, "en") for i in range(90)] + [(1000 + i, "fr")
                                             for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    tau, tf = 0.5, 1.2

    sched = {r.lang: r for r in
             epoch_schedule(docs, tau=tau, target_frac=tf).collect()}
    n = Counter(lang for _, lang in rows)
    s = {g: int(round(math.sqrt(ng) * 1e9)) for g, ng in n.items()}
    st, nt = sum(s.values()), sum(n.values())
    for g, ng in n.items():
        target = tf * (s[g] / st) * nt
        per_doc = round(target / ng, 9)     # the operator's 9dp boundary
        r = sched[g]
        assert r.n_g == ng
        assert r.target_docs == int(round(target))
        assert r.n_epochs == math.floor(per_doc)
        assert abs(r.residual_rate - (per_doc - math.floor(per_doc))) < 1e-9
        assert 0.0 <= r.residual_rate < 1.0

    # decomposition vs the capped resample at the same (tau, target):
    # tf=0.8 puts en below one pass (epochs 0, residual == the resample
    # keep_rate) and fr above it (epochs >= 1 exactly where the
    # resample rate saturated at 1)
    sched2 = {r.lang: r for r in
              epoch_schedule(docs, tau=tau, target_frac=0.8).collect()}
    rates = {r.lang: r.keep_rate for r in
             temperature_resample(docs, tau=tau, target_frac=0.8)
             .select("lang", "keep_rate").distinct().collect()}
    assert sched2["fr"].n_epochs >= 1 and rates["fr"] == 1.0  # up-sampled
    assert sched2["en"].n_epochs == 0                         # down-sampled
    assert abs(sched2["en"].residual_rate - rates["en"]) < 1e-6


def test_contamination_report_attributes_exact_grams(spark):
    """The report returns exactly the overlapping n-grams (Python-set
    twin), deterministically ranked, capped per doc, and consistent
    with contamination_overlap's counts."""
    from lightning_metastore_spark.operators.contamination import (
        contamination_overlap, contamination_report)

    train = spark.createDataFrame([
        (1, "the quick brown fox jumps high"),
        (2, "totally different words here now"),
    ], ["doc_id", "text"])
    bench = spark.createDataFrame(
        [(100, "the quick brown fox runs away")], ["doc_id", "text"])

    rep = contamination_report(train, bench, n=3).collect()

    def grams(t, n=3):
        w = t.lower().split()
        return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)} \
            if len(w) >= n else {" ".join(w)}

    want = sorted(grams(train.collect()[0].text) & grams(bench.collect()[0].text))
    got1 = [(r.gram_rank, r.shingle) for r in rep if r.doc_id == 1]
    assert got1 == list(enumerate(want, 1))
    assert not [r for r in rep if r.doc_id == 2]     # clean doc absent

    counts = {r.doc_id: r.n_contaminated for r in
              contamination_overlap(train, bench, n=3).collect()}
    assert counts[1] == len(got1)

    capped = contamination_report(train, bench, n=3, max_grams=1).collect()
    assert [(r.doc_id, r.gram_rank) for r in capped] == [(1, 1)]


def test_dsir_select_matches_python_twin(spark):
    """DSIR importance resampling replays bit-for-bit in pure Python
    (same hashing, same integer-frozen log-ratio table, same Gumbel
    key), and prefers target-like raw docs."""
    import hashlib
    import math
    import re

    from lightning_metastore_spark.operators.sampling import dsir_select

    target_rows = [(100 + i, "spark query plan shuffle join optimizer")
                   for i in range(5)]
    raw_rows = ([(i, "spark plan join shuffle stage %d" % (i % 3))
                 for i in range(10)]
                + [(20 + i, "cooking recipes garden flowers %d" % (i % 3))
                   for i in range(10)])
    target = spark.createDataFrame(target_rows, "doc_id long, text string")
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")

    B, N = 64, 8
    got = dsir_select(raw, target, n=N, n_buckets=B).collect()

    def buckets(text):
        return [int(hashlib.md5(t.encode()).hexdigest()[:3], 16) % B
                for t in re.split(r"\s+", text.lower())]

    ct, cr = {}, {}
    for _, t in target_rows:
        for b in buckets(t):
            ct[b] = ct.get(b, 0) + 1
    for _, t in raw_rows:
        for b in buckets(t):
            cr[b] = cr.get(b, 0) + 1
    nt = sum(ct.values()) + B
    nr = sum(cr.values()) + B
    lr = {j: round((math.log((ct.get(j, 0) + 1) / nt)
                    - math.log((cr.get(j, 0) + 1) / nr)) * 1e9)
          for j in range(B)}

    keys = []
    for d, t in raw_rows:
        lw = sum(lr[b] for b in buckets(t))
        u = ((int(hashlib.md5(f"dsir:{d}".encode()).hexdigest()[:8], 16)
              + 1.0) / 4294967297.0)
        g = -math.log(-math.log(u))
        keys.append((round(lw * 1e-9 + g, 9), -d, d, round(lw * 1e-9, 9)))
    keys.sort(reverse=True)
    want = [(d, lwr, i + 1) for i, (_, _, d, lwr) in enumerate(keys[:N])]
    assert sorted((r.doc_id, r.log_weight, r.sample_rank) for r in got) \
        == sorted(want)
    # the importance weights favor target-like docs
    picked = {r.doc_id for r in got}
    assert len([d for d in picked if d < 20]) > len(picked) / 2


def test_dsir_select_partition_invariant(spark):
    from lightning_metastore_spark.operators.sampling import dsir_select

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(120)
    target = docs.filter("doc_id % 10 = 0")
    a = dsir_select(docs, target, n=15, n_buckets=128).collect()
    b = dsir_select(docs.repartition(11), target.repartition(3),
                    n=15, n_buckets=128).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)) and len(a) == 15


def test_bucket_resample_matches_md5_twin(spark):
    """Per-bucket thinning: bit-exact vs a Python replay of the hex
    keep rule; rate-1.0 buckets keep everything, unmapped buckets
    drop everything."""
    import hashlib

    from lightning_metastore_spark.operators.sampling import (
        bucket_resample)

    rows = [(i, ["head", "middle", "tail", "junk"][i % 4])
            for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, bucket string")
    rates = {"head": 1.0, "middle": 0.5, "tail": 0.1}
    got = {r.doc_id: (r.keep_rate, r.kept)
           for r in bucket_resample(df, rates).collect()}

    want = {}
    for i, b in rows:
        rate = rates.get(b, 0.0)
        if rate >= 1.0:
            kept = True
        else:
            h = hashlib.md5(f"bkt:{i}".encode()).hexdigest()[:8]
            kept = h < format(int(rate * 4294967296.0), "08x")
        want[i] = (round(rate, 6), kept)
    assert got == want
    assert all(got[i][1] for i, b in rows if b == "head")
    assert not any(got[i][1] for i, b in rows if b == "junk")


def test_bucket_resample_composes_with_perplexity_buckets(spark):
    """The CCNet terminal flow: buckets -> thinning; head survives
    whole, tail is decimated; rerun identical (pure id function)."""
    from lightning_metastore_spark.operators.lm_filter import (
        perplexity_buckets)
    from lightning_metastore_spark.operators.sampling import (
        bucket_resample)

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .selectExpr("doc_id", "lang",
                        "CAST(n_chars AS DOUBLE) AS avg_logprob"))
    out = bucket_resample(perplexity_buckets(docs))
    rows = out.collect()
    assert len(rows) == docs.count()
    by = {}
    for r in rows:
        by.setdefault(r.bucket, []).append(r)
    assert all(r.kept for r in by["head"])
    tail_frac = sum(r.kept for r in by["tail"]) / len(by["tail"])
    assert tail_frac < 0.35
    assert sorted(map(tuple, rows)) == sorted(
        map(tuple, out.collect()))
