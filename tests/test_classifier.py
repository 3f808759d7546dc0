"""Quality-classifier TRAINING tests: a pure-Python twin replays the
whole GD loop bit-for-bit (the module's integer/decimal-freezing
contract), training is partition-invariant, learns a separating model
that plugs into classifier_score, and artifacts round-trip."""

from __future__ import annotations

import hashlib
import math
import re
import sys

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from lightning_metastore_spark.functions.text import (  # noqa: E402
    classifier_score,
)
from lightning_metastore_spark.operators.classifier import (  # noqa: E402
    load_classifier_weights,
    save_classifier_weights,
    train_logreg_classifier,
)


def _bucket(token: str, n_buckets: int) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:3], 16) % n_buckets


def _spark_round(x: float, n: int = 0) -> float:
    """Spark's F.round on a double: shortest-repr decimal, HALF_UP."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-n)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def twin_train(rows, n_buckets, iters, lr, word_ngrams=1):
    """Pure-Python replay of train_logreg_classifier: same hashing
    (incl. the \\x01-joined word-n-gram tokens), same frozen
    9dp / integer-1e-12 factors, same weight steps."""
    feats, nd, ys = {}, {}, {}
    for doc_id, text, y in rows:
        if y is None:
            continue
        toks = re.split(r"\s+", (text or "").lower())
        hash_toks = list(toks)
        for g in range(2, word_ngrams + 1):
            hash_toks += ["\x01".join(toks[i:i + g])
                          for i in range(len(toks) - g + 1)]
        tf = {}
        for t in hash_toks:
            b = _bucket(t, n_buckets)
            tf[b] = tf.get(b, 0) + 1
        feats[doc_id] = tf
        nd[doc_id] = sum(tf.values())
        ys[doc_id] = float(y)

    m = [0] * n_buckets
    for _ in range(iters):
        grads = {}
        for d, tf in feats.items():
            s = sum(m[b] * c for b, c in tf.items())
            p = 1.0 / (1.0 + math.exp(-(s / 1000.0 / nd[d])))
            e9 = int(_spark_round(_spark_round(p - ys[d], 9) * 1e9))
            f = int(_spark_round(e9 * 1000.0 / nd[d]))
            for b, c in tf.items():
                grads[b] = grads.get(b, 0) + f * c
        for b, g in grads.items():
            m[b] = m[b] - round(lr * (g * 1e-12) * 1000.0)
    return m


ROWS = [
    (1, "alpha beta gamma delta", 1),
    (2, "spam spam spam buy", 0),
    (3, "alpha gamma epsilon zeta", 1),
    (4, "buy now spam now now", 0),
    (5, "delta epsilon beta words", 1),
    (6, "now buy spam buy", 0),
    (7, "  leading space alpha", 1),   # split yields a '' token
    (8, None, 0),                      # NULL text still labeled
]


def test_train_matches_python_twin_bitwise(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string, label int")
    got = {r.bucket: r.m for r in
           train_logreg_classifier(docs, "label", iters=4, lr=2.0,
                                   n_buckets=64).collect()}
    want = twin_train(ROWS, 64, 4, 2.0)
    assert len(got) == 64
    assert [got[j] for j in range(64)] == want


def test_train_partition_invariant_and_real_docs_twin(spark):
    """Bit-identical weights at different partition counts, and the
    twin agrees on REAL document text (messy whitespace included)."""
    real = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .orderBy("doc_id").limit(30)
            .withColumn("label", (F.col("doc_id") % 2).cast("int")))
    rows = [(r.doc_id, r.text, r.label)
            for r in real.select("doc_id", "text", "label").collect()]
    a = train_logreg_classifier(real, "label", iters=3, lr=1.0,
                                n_buckets=128)
    b = train_logreg_classifier(real.repartition(13), "label", iters=3,
                                lr=1.0, n_buckets=128)
    wa = sorted((r.bucket, r.m) for r in a.collect())
    wb = sorted((r.bucket, r.m) for r in b.collect())
    assert wa == wb
    want = twin_train(rows, 128, 3, 1.0)
    assert [m for _, m in wa] == want


def test_trained_model_separates_and_serves_inference(spark):
    rows = []
    for i in range(60):
        if i % 2:
            rows.append((i, f"informative varied prose text number{i % 7}", 1))
        else:
            rows.append((i, f"spam buy now click spam {i % 3}", 0))
    docs = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w = train_logreg_classifier(docs, "label", iters=6, lr=2.0,
                                n_buckets=256)
    scored = {r.doc_id: r.score
              for r in classifier_score(docs, n_buckets=256,
                                        weights=w).collect()}
    pos = [scored[i] for i in range(60) if i % 2]
    neg = [scored[i] for i in range(60) if not i % 2]
    assert min(pos) > max(neg)            # clean linear separation
    assert min(pos) > 0.5 > max(neg)


def test_null_labels_dropped(spark):
    with_null = [(1, "a b", 1), (2, "c d", 0), (3, "e f", None)]
    without = [(1, "a b", 1), (2, "c d", 0)]
    d1 = spark.createDataFrame(with_null, "doc_id long, text string, label int")
    d2 = spark.createDataFrame(without, "doc_id long, text string, label int")
    w1 = sorted((r.bucket, r.m) for r in
                train_logreg_classifier(d1, "label", iters=2,
                                        n_buckets=32).collect())
    w2 = sorted((r.bucket, r.m) for r in
                train_logreg_classifier(d2, "label", iters=2,
                                        n_buckets=32).collect())
    assert w1 == w2


def test_weights_artifact_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string, label int")
    w = train_logreg_classifier(docs, "label", iters=2, n_buckets=32)
    p = str(tmp_path / "clf")
    save_classifier_weights(spark, w, p)
    back = load_classifier_weights(spark, p)
    assert (sorted((r.bucket, r.m) for r in back.collect())
            == sorted((r.bucket, r.m) for r in w.collect()))
    s1 = {r.doc_id: r.score for r in
          classifier_score(docs, n_buckets=32, weights=back).collect()}
    s2 = {r.doc_id: r.score for r in
          classifier_score(docs, n_buckets=32, weights=w).collect()}
    assert s1 == s2


def test_word_bigram_features_match_twin_and_serve_inference(spark):
    """fastText parity: word_ngrams=2 trains over hashed word-bigram
    features in the same bucket space, bit-matching the twin; the
    trained table serves classifier_score(word_ngrams=2) and the
    bigram signal separates docs that unigrams alone cannot."""
    docs = spark.createDataFrame(ROWS, "doc_id long, text string, label int")
    got = {r.bucket: r.m for r in
           train_logreg_classifier(docs, "label", iters=4, lr=2.0,
                                   n_buckets=64, word_ngrams=2).collect()}
    want = twin_train(ROWS, 64, 4, 2.0, word_ngrams=2)
    assert [got[j] for j in range(64)] == want
    assert want != twin_train(ROWS, 64, 4, 2.0)   # bigrams changed it

    # word-ORDER signal: same unigrams, opposite labels by order
    rows = []
    for i in range(40):
        if i % 2:
            rows.append((i, "good value fast service good value", 1))
        else:
            rows.append((i, "value good service fast value good", 0))
    d = spark.createDataFrame(rows, "doc_id long, text string, label int")
    w2 = train_logreg_classifier(d, "label", iters=6, lr=2.0,
                                 n_buckets=256, word_ngrams=2)
    from lightning_metastore_spark.functions.text import classifier_score

    s2 = {r.doc_id: r.score
          for r in classifier_score(d, n_buckets=256, weights=w2,
                                    word_ngrams=2).collect()}
    pos = [s2[i] for i in range(40) if i % 2]
    neg = [s2[i] for i in range(40) if not i % 2]
    assert min(pos) > max(neg)        # bigrams separate order-flips
    # unigram-only model cannot: identical features for both classes
    w1 = train_logreg_classifier(d, "label", iters=6, lr=2.0,
                                 n_buckets=256)
    s1 = {r.doc_id: r.score
          for r in classifier_score(d, n_buckets=256, weights=w1).collect()}
    assert len({round(v, 9) for v in s1.values()}) == 1


def test_versioned_artifact_validates_and_v1_still_loads(spark, tmp_path):
    """r11 ADVICE: the saved artifact records n_buckets/word_ngrams;
    loading it with mismatched parameters raises instead of silently
    skewing scores; a v1 artifact (bucket, m only) keeps loading."""
    import pytest

    from lightning_metastore_spark.functions.text import classifier_score

    docs = spark.createDataFrame(ROWS, "doc_id long, text string, label int")
    w = train_logreg_classifier(docs, "label", iters=2, n_buckets=32,
                                word_ngrams=2)
    p = str(tmp_path / "clf_v2")
    save_classifier_weights(spark, w, p, n_buckets=32, word_ngrams=2)
    back = load_classifier_weights(spark, p)
    assert {"bucket", "m", "n_buckets", "word_ngrams"} <= set(back.columns)

    ok = classifier_score(docs, n_buckets=32, weights=back, word_ngrams=2)
    assert ok.count() > 0
    with pytest.raises(ValueError, match="n_buckets=32"):
        classifier_score(docs, n_buckets=64, weights=back,
                         word_ngrams=2).collect()
    with pytest.raises(ValueError, match="word_ngrams=2"):
        classifier_score(docs, n_buckets=32, weights=back).collect()

    # v1 layout: no metadata columns -> no validation, still serves
    p1 = str(tmp_path / "clf_v1")
    save_classifier_weights(spark, w, p1)
    back1 = load_classifier_weights(spark, p1)
    assert set(back1.columns) == {"bucket", "m"}
    assert classifier_score(docs, n_buckets=32, weights=back1,
                            word_ngrams=2).count() > 0
