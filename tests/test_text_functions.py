"""Text-analysis function tests on crafted micro-fixtures."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from lightning_metastore_spark.functions import text as tf  # noqa: E402


def test_token_counts_micro(spark):
    df = spark.createDataFrame([(1, "hello world foo"), (2, "a")],
                               ["doc_id", "text"])
    out = {r.doc_id: (r.n_chars, r.n_tokens) for r in tf.token_counts(df).collect()}
    assert out[1] == (15, 3)
    assert out[2] == (1, 1)


def test_lang_id_micro(spark):
    df = spark.createDataFrame([
        (1, "the cat sat on the mat and the dog"),
        (2, "der hund und die katze ist nicht da"),
        (3, "le chat et la souris dans une maison"),
        (4, "el perro y los gatos es una casa que"),
        (5, "这 是 中文 文本"),
        (6, "zzz qqq www"),
    ], ["doc_id", "text"])
    out = {r.doc_id: r.pred_lang for r in tf.lang_id(df).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "es", 5: "zh", 6: "und"}


def test_quality_score_bounds(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over a lazy dog in the sun"),
         (2, "x")], ["doc_id", "text"])
    out = {r.doc_id: r.quality_score for r in tf.quality_features(df).collect()}
    assert 0.0 <= out[2] < out[1] <= 1.0


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame([(1, " Hello   World "), (2, "hello world")],
                               ["doc_id", "text"])
    fps = [r.fp for r in tf.fingerprint(df).orderBy("doc_id").collect()]
    assert fps[0] == fps[1]
