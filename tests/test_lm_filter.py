"""Reference-LM filtering tests: artifact train/score vs a pure-Python
twin with identical left-associated IEEE evaluation, OOV smoothing
contract, reference-likeness ordering, and partition invariance."""

from __future__ import annotations

import math
import re
import sys
from decimal import Decimal

sys.path.insert(0, "/root/repo")

from lightning_metastore_spark.operators.lm_filter import (  # noqa: E402
    score_with_bigram_lm,
    train_bigram_lm,
)

REF = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the lazy dog sleeps while the quick fox runs"),
    (3, "a quick brown dog and a lazy fox"),
]
RAW = [
    (10, "the quick brown fox runs"),        # reference-like
    (11, "the lazy dog sleeps"),             # reference-like
    (12, "zxq vbnm qwerty asdf zxcv"),       # all OOV
    (13, "one"),                             # single token: no bigrams
    (14, "fox the the fox"),                 # seen tokens, odd order
]


def twin_scores(ref_rows, raw_rows, lam):
    toks = {d: re.split(r"\s+", t.lower()) for d, t in ref_rows}
    c1, c2 = {}, {}
    for ts in toks.values():
        for w in ts:
            c1[w] = c1.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    n, v = sum(c1.values()), len(c1)
    denom = float(n + v + 1)
    out = {}
    for d, t in raw_rows:
        ts = re.split(r"\s+", t.lower())
        if len(ts) < 2:
            continue
        s, cnt = Decimal(0), 0
        tf = {}
        for a, b in zip(ts, ts[1:]):
            tf[(a, b)] = tf.get((a, b), 0) + 1
        for (a, b), f in tf.items():
            if (a, b) in c2 and a in c1:
                lam_term = lam * c2[(a, b)] / c1[a]
            else:
                lam_term = 0.0
            p = lam_term + (1.0 - lam) * (c1.get(b, 0) + 1.0) / denom
            term = f * math.log(p)
            # Spark's double->decimal cast: shortest repr, HALF_UP
            from decimal import ROUND_HALF_UP
            s += Decimal(repr(term)).quantize(Decimal("1e-15"),
                                              rounding=ROUND_HALF_UP)
            cnt += f
        out[d] = (cnt, round(float(s) / cnt, 9))
    return out


def test_lm_filter_matches_python_twin(spark, tmp_path):
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    p = str(tmp_path / "lm")
    stats = train_bigram_lm(ref, p)
    assert stats["vocab"] == len({w for _, t in REF
                                  for w in t.lower().split()})
    got = {r.doc_id: (r.n_terms, r.avg_logprob)
           for r in score_with_bigram_lm(raw, p, lam=0.7).collect()}
    want = twin_scores(REF, RAW, 0.7)
    assert got == want
    assert 13 not in got                     # <2 tokens: no row
    # reference-like text scores above OOV junk
    assert got[10][1] > got[12][1] and got[11][1] > got[12][1]


def test_lm_filter_partition_invariant_on_real_docs(spark, tmp_path):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(80)
    ref = docs.filter("doc_id % 4 = 0")
    p = str(tmp_path / "lm_real")
    train_bigram_lm(ref, p)
    a = sorted(map(tuple,
                   score_with_bigram_lm(docs, p).collect()))
    b = sorted(map(tuple,
                   score_with_bigram_lm(docs.repartition(13), p)
                   .collect()))
    assert a == b and len(a) > 0


def test_lm_filter_cast_decimal_truncation_edge(spark, tmp_path):
    """Spark's cast(decimal(28,15)) truncation semantics vs the twin's
    quantize: pin one crafted doc whose terms exercise negative values
    (all log-probs are negative)."""
    ref = spark.createDataFrame(REF, "doc_id long, text string")
    raw = spark.createDataFrame([(50, "the the the the")],
                                "doc_id long, text string")
    p = str(tmp_path / "lm_edge")
    train_bigram_lm(ref, p)
    got = {r.doc_id: (r.n_terms, r.avg_logprob)
           for r in score_with_bigram_lm(raw, p, lam=0.7).collect()}
    want = twin_scores(REF, [(50, "the the the the")], 0.7)
    assert got == want


# ---------------------------------------------------------------------------
# perplexity_buckets (CCNet head/middle/tail)
# ---------------------------------------------------------------------------

def _twin_buckets(rows, cuts=(1.0 / 3.0, 2.0 / 3.0)):
    """Pure-Python replay: percent_rank over (group ORDER BY score
    DESC, id ASC), HALF_UP 9dp (Spark F.round), strict-< cuts."""
    from collections import defaultdict
    from decimal import ROUND_HALF_UP

    lo, hi = cuts
    groups = defaultdict(list)
    for d, g, s in rows:
        groups[g].append((d, s))
    out = {}
    for g, ds in groups.items():
        order = sorted(ds, key=lambda x: (-x[1], x[0]))
        n = len(order)
        for i, (d, s) in enumerate(order):
            pr = 0.0 if n == 1 else i / (n - 1)
            pr = float(Decimal(repr(pr)).quantize(Decimal("1e-9"),
                                                  rounding=ROUND_HALF_UP))
            bucket = ("head" if pr < lo
                      else "middle" if pr < hi else "tail")
            out[d] = (g, s, pr, bucket)
    return out


def test_perplexity_buckets_matches_twin_with_ties(spark):
    from lightning_metastore_spark.operators.lm_filter import (
        perplexity_buckets)

    rows = [
        # 7-doc group with a score tie straddling the head boundary
        (1, "en", -2.0), (2, "en", -2.5), (3, "en", -2.5),
        (4, "en", -3.0), (5, "en", -3.5), (6, "en", -4.0),
        (7, "en", -9.0),
        # single-doc group: percent_rank 0 -> head
        (8, "fr", -5.0),
        # two-doc group: 0 -> head, 1 -> tail
        (9, "de", -1.0), (10, "de", -8.0),
    ]
    scored = spark.createDataFrame(
        rows, "doc_id long, lang string, avg_logprob double")
    got = {r.doc_id: (r.lang, r.avg_logprob, r.rank_frac, r.bucket)
           for r in perplexity_buckets(scored).collect()}
    assert got == _twin_buckets(rows)
    assert got[8][3] == "head"


def test_perplexity_buckets_real_docs_partition_invariant(spark, tmp_path):
    from lightning_metastore_spark.operators.lm_filter import (
        perplexity_buckets)

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(120)
    ref = docs.filter("doc_id % 4 = 0")
    p = str(tmp_path / "lm_bkt")
    train_bigram_lm(ref, p)
    scored = (score_with_bigram_lm(docs, p)
              .join(docs.select("doc_id", "lang"), "doc_id"))
    a = sorted(map(tuple, perplexity_buckets(scored).collect()))
    b = sorted(map(tuple,
                   perplexity_buckets(scored.repartition(13)).collect()))
    assert a == b and len(a) > 0
    # per-group thirds: each group's head count is within 1 of n//3
    from collections import Counter
    per = Counter((g, bkt) for _, g, _, _, bkt in a)
    tot = Counter(g for _, g, _, _, bkt in a)
    for g, n in tot.items():
        if n >= 3:
            assert abs(per[(g, "head")] - n / 3.0) <= 1.0


def test_perplexity_buckets_rejects_bad_cuts(spark):
    import pytest as _pytest

    from lightning_metastore_spark.operators.lm_filter import (
        perplexity_buckets)

    scored = spark.createDataFrame(
        [(1, "en", -1.0)], "doc_id long, lang string, avg_logprob double")
    with _pytest.raises(ValueError):
        perplexity_buckets(scored, cuts=(0.5, 0.4))
    with _pytest.raises(ValueError):
        perplexity_buckets(scored, cuts=(0.0, 0.5))


# ---------------------------------------------------------------------------
# Order-n Kneser-Ney reference LM
# ---------------------------------------------------------------------------

def kn_twin(ref_rows, raw_rows, order=3, D=0.75, min_count=1):
    """Pure-Python bit-for-bit replay of the train_kn_lm /
    score_with_kn_tables contract: chained continuation counts from
    the (pruned) top table, fixed-D interpolated KN with a uniform
    1/(V+1) floor, identical left-associated IEEE evaluation,
    DECIMAL(28,15) per-doc sums, HALF_UP 9dp mean."""
    from decimal import ROUND_HALF_UP

    n = order
    toks = {d: re.split(r"\s+", (t or "").lower()) for d, t in ref_rows}
    top = {}
    for ts in toks.values():
        for i in range(len(ts) - n + 1):
            g = tuple(ts[i:i + n])
            top[g] = top.get(g, 0) + 1
    if min_count > 1:
        top = {g: c for g, c in top.items() if c >= min_count}
    levels = {n: top}
    for k in range(n - 1, 0, -1):
        lower = {}
        for g in levels[k + 1]:
            lower[g[1:]] = lower.get(g[1:], 0) + 1
        levels[k] = lower
    ctx = {}
    for j in range(1, n):
        cj = {}
        for g, c in levels[j + 1].items():
            key = g[:j]
            s, f = cj.get(key, (0, 0))
            cj[key] = (s + c, f + 1)
        ctx[j] = cj
    V = len({w for ts in toks.values() for w in ts})
    T = sum(levels[1].values())
    U = len(levels[1])
    u_floor = D * U / T / (V + 1.0)
    out = {}
    for d, t in raw_rows:
        ts = re.split(r"\s+", (t or "").lower())
        if len(ts) < n:
            continue
        tf = {}
        for i in range(len(ts) - n + 1):
            g = tuple(ts[i:i + n])
            tf[g] = tf.get(g, 0) + 1
        s_dec, cnt = Decimal(0), 0
        for g, f in tf.items():
            kc1 = levels[1].get((g[-1],), 0)
            p = max(kc1 - D, 0.0) / T + u_floor
            for k in range(2, n + 1):
                ckey = g[n - k:n - 1]
                if ckey in ctx[k - 1]:
                    s_, f_ = ctx[k - 1][ckey]
                    ck = levels[k].get(g[n - k:], 0)
                    p = max(ck - D, 0.0) / s_ + D * f_ / s_ * p
            term = f * math.log(p)
            from decimal import ROUND_HALF_UP as _H
            s_dec += Decimal(repr(term)).quantize(Decimal("1e-15"),
                                                  rounding=_H)
            cnt += f
        avg = float(Decimal(repr(float(s_dec) / cnt))
                    .quantize(Decimal("1e-9"), rounding=ROUND_HALF_UP))
        out[d] = (cnt, avg)
    return out


def test_kn_lm_matches_python_twin(spark, tmp_path):
    from lightning_metastore_spark.operators.lm_filter import (
        score_with_kn_lm, train_kn_lm)

    ref = spark.createDataFrame(REF, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    p = str(tmp_path / "kn")
    stats = train_kn_lm(ref, p, order=3)
    assert stats["order"] == 3 and stats["vocab"] > 0
    got = {r.doc_id: (r.n_terms, r.avg_logprob)
           for r in score_with_kn_lm(raw, p).collect()}
    want = kn_twin(REF, RAW, order=3)
    assert got == want
    # docs shorter than the order emit no row
    assert 13 not in got
    # reference-like text still orders above OOV junk under KN
    assert got[10][1] > got[12][1] and got[11][1] > got[12][1]


def test_kn_lm_orders_2_and_4_match_twin(spark, tmp_path):
    from lightning_metastore_spark.operators.lm_filter import (
        score_with_kn_lm, train_kn_lm)

    ref = spark.createDataFrame(REF, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    for order in (2, 4):
        p = str(tmp_path / f"kn{order}")
        train_kn_lm(ref, p, order=order)
        got = {r.doc_id: (r.n_terms, r.avg_logprob)
               for r in score_with_kn_lm(raw, p).collect()}
        assert got == kn_twin(REF, RAW, order=order), order
    # 4-gram: the 4-token doc 13? no — doc 13 has 1 token; doc 10/11
    # have 5/4 tokens so order=4 keeps them with 2/1 terms
    p4 = str(tmp_path / "kn4")
    got4 = {r.doc_id: r.n_terms
            for r in score_with_kn_lm(spark.createDataFrame(
                RAW, "doc_id long, text string"), p4).collect()}
    assert got4[10] == 2 and got4[11] == 1


def test_kn_lm_min_count_prunes_and_still_scores(spark, tmp_path):
    from lightning_metastore_spark.operators.lm_filter import (
        score_with_kn_lm, train_kn_lm)

    ref = spark.createDataFrame(REF, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    p = str(tmp_path / "kn_pruned")
    train_kn_lm(ref, p, order=2, min_count=2)
    got = {r.doc_id: (r.n_terms, r.avg_logprob)
           for r in score_with_kn_lm(raw, p).collect()}
    assert got == kn_twin(REF, RAW, order=2, min_count=2)
    # the pruned artifact is strictly smaller than the unpruned one
    unp = str(tmp_path / "kn_unpruned")
    train_kn_lm(ref, unp, order=2)
    n_pruned = spark.read.parquet(f"{p}/o2").count()
    n_full = spark.read.parquet(f"{unp}/o2").count()
    assert 0 < n_pruned < n_full


def test_kn_lm_partition_invariant_on_real_docs(spark, tmp_path):
    from lightning_metastore_spark.operators.lm_filter import (
        score_with_kn_lm, train_kn_lm)

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(80)
    ref = docs.filter("doc_id % 4 = 0")
    p = str(tmp_path / "kn_real")
    train_kn_lm(ref, p, order=3)
    a = sorted(map(tuple, score_with_kn_lm(docs, p).collect()))
    b = sorted(map(tuple,
                   score_with_kn_lm(docs.repartition(13), p).collect()))
    assert a == b and len(a) > 0


def test_score_with_reference_lm_dispatches_on_artifact(spark, tmp_path):
    """curate/ingest consume EITHER artifact layout through one
    loader: bigram artifacts score through score_with_bigram_lm
    (lam honored), KN artifacts through score_with_kn_lm."""
    from lightning_metastore_spark.operators.lm_filter import (
        score_with_kn_lm, score_with_reference_lm, train_kn_lm)

    ref = spark.createDataFrame(REF, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    bp = str(tmp_path / "bg")
    train_bigram_lm(ref, bp)
    kp = str(tmp_path / "kn")
    train_kn_lm(ref, kp, order=3)

    via_generic_bg = sorted(map(tuple,
                                score_with_reference_lm(raw, bp, lam=0.7)
                                .collect()))
    direct_bg = sorted(map(tuple,
                           score_with_bigram_lm(raw, bp, lam=0.7)
                           .collect()))
    assert via_generic_bg == direct_bg
    via_generic_kn = sorted(map(tuple,
                                score_with_reference_lm(raw, kp)
                                .collect()))
    direct_kn = sorted(map(tuple, score_with_kn_lm(raw, kp).collect()))
    assert via_generic_kn == direct_kn and via_generic_kn != via_generic_bg


def test_kn_lm_rejects_bad_params_and_short_reference(spark, tmp_path):
    import pytest

    from lightning_metastore_spark.operators.lm_filter import train_kn_lm

    ref = spark.createDataFrame(REF, "doc_id long, text string")
    with pytest.raises(ValueError, match="order"):
        train_kn_lm(ref, str(tmp_path / "x"), order=1)
    with pytest.raises(ValueError, match="discount"):
        train_kn_lm(ref, str(tmp_path / "x"), discount=1.5)
    short = spark.createDataFrame([(1, "one two")],
                                  "doc_id long, text string")
    with pytest.raises(ValueError, match="no 3-grams"):
        train_kn_lm(short, str(tmp_path / "short"), order=3)


def test_bigram_lm_min_count_and_vocab_prune(spark, tmp_path):
    """train_bigram_lm pruning knobs: pruned bigrams back off like
    unseen ones; pruned unigrams become OOV; both replayed by the
    same twin run on adjusted stats."""
    from lightning_metastore_spark.operators.lm_filter import (
        score_with_bigram_lm as score_bg)

    ref = spark.createDataFrame(REF, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    p = str(tmp_path / "bg_pruned")
    stats = train_bigram_lm(ref, p, min_count=2, vocab_min_count=2)
    got = {r.doc_id: (r.n_terms, r.avg_logprob)
           for r in score_bg(raw, p, lam=0.7).collect()}

    # twin with the same pruning applied up front
    toks = {d: re.split(r"\s+", t.lower()) for d, t in REF}
    c1, c2 = {}, {}
    for ts in toks.values():
        for w in ts:
            c1[w] = c1.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    c1 = {w: c for w, c in c1.items() if c >= 2}
    c2 = {g: c for g, c in c2.items() if c >= 2}
    n, v = sum(c1.values()), len(c1)
    assert stats == {"n_total": n, "vocab": v}
    denom = float(n + v + 1)
    from decimal import ROUND_HALF_UP
    for d, t in RAW:
        ts = re.split(r"\s+", t.lower())
        if len(ts) < 2:
            assert d not in got
            continue
        tf = {}
        for a, b in zip(ts, ts[1:]):
            tf[(a, b)] = tf.get((a, b), 0) + 1
        s, cnt = Decimal(0), 0
        for (a, b), f in tf.items():
            if (a, b) in c2 and a in c1:
                lam_term = 0.7 * c2[(a, b)] / c1[a]
            else:
                lam_term = 0.0
            pr = lam_term + (1.0 - 0.7) * (c1.get(b, 0) + 1.0) / denom
            term = f * math.log(pr)
            s += Decimal(repr(term)).quantize(Decimal("1e-15"),
                                              rounding=ROUND_HALF_UP)
            cnt += f
        assert got[d] == (cnt, round(float(s) / cnt, 9)), d


def test_kn_lm_auto_discount(spark, tmp_path):
    """discount='auto' estimates D = n1/(n1 + 2*n2) from the top-order
    count-of-counts (the Ney/KenLM default), freezes it into meta, and
    scores bit-identically to passing the same D explicitly; a
    reference whose count-of-counts degenerate falls back to 0.75."""
    from lightning_metastore_spark.operators.lm_filter import (
        score_with_kn_lm, train_kn_lm)

    ref = spark.createDataFrame(REF, "doc_id long, text string")
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    p = str(tmp_path / "kn_auto")
    train_kn_lm(ref, p, order=2, discount="auto")

    # replicate the estimate from the same counts
    toks = {d: re.split(r"\s+", t.lower()) for d, t in REF}
    top = {}
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            top[(a, b)] = top.get((a, b), 0) + 1
    n1 = sum(1 for c in top.values() if c == 1)
    n2 = sum(1 for c in top.values() if c == 2)
    want_d = n1 / (n1 + 2.0 * n2)
    meta = spark.read.parquet(f"{p}/meta").first()
    assert meta["discount"] == want_d and 0.0 < want_d < 1.0

    got = {r.doc_id: (r.n_terms, r.avg_logprob)
           for r in score_with_kn_lm(raw, p).collect()}
    assert got == kn_twin(REF, RAW, order=2, D=want_d)
    # explicit-D artifact scores identically
    pe = str(tmp_path / "kn_explicit")
    train_kn_lm(ref, pe, order=2, discount=want_d)
    gote = {r.doc_id: (r.n_terms, r.avg_logprob)
            for r in score_with_kn_lm(raw, pe).collect()}
    assert gote == got

    # degenerate count-of-counts (every bigram unique: n2=0) -> 0.75
    uniq = spark.createDataFrame(
        [(1, "a b c d e f g h")], "doc_id long, text string")
    pu = str(tmp_path / "kn_degenerate")
    train_kn_lm(uniq, pu, order=2, discount="auto")
    assert spark.read.parquet(f"{pu}/meta").first()["discount"] == 0.75

    import pytest
    with pytest.raises(ValueError, match="float or 'auto'"):
        train_kn_lm(ref, str(tmp_path / "x"), discount="automatic")
