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
