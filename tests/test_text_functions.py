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


def test_repetition_features_micro(spark):
    # doc 1: "a b a b" -> words a:2 b:2; 2-grams "a b":2, "b a":1
    # doc 2: all-distinct words; doc 3: single word (no 2-grams)
    df = spark.createDataFrame([
        (1, "a b a b"),
        (2, "one two three four"),
        (3, "solo"),
    ], ["doc_id", "text"])
    out = {r.doc_id: r for r in tf.repetition_features(df).collect()}

    r1 = out[1]
    assert r1.n_words == 4 and r1.n_distinct_words == 2
    assert r1.distinct_word_ratio == 0.5
    assert r1.dup_word_char_frac == 1.0  # every word repeats
    # top 2-gram "a b" count 2, len 3 -> 6 chars over 7 text chars
    assert r1.top_2gram_char_frac == round(6 / 7, 6)
    # dup gram chars 6 over total gram chars 9
    assert r1.dup_2gram_char_frac == round(6 / 9, 6)
    # entropy of {2/4, 2/4} = ln 2
    import math
    assert abs(r1.word_entropy - round(math.log(2), 6)) < 1e-9
    assert bool(r1.is_repetitive)

    r2 = out[2]
    assert r2.distinct_word_ratio == 1.0
    assert r2.dup_word_char_frac == 0.0
    assert r2.dup_2gram_char_frac == 0.0
    assert not bool(r2.is_repetitive)

    r3 = out[3]  # no 2-grams -> zero-coalesced fractions
    assert r3.n_words == 1
    assert r3.top_2gram_char_frac == 0.0
    assert r3.word_entropy == 0.0
