"""Text-analysis function tests on crafted micro-fixtures."""

from __future__ import annotations

import sys

import pytest

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


def test_bigram_logprob_micro(spark):
    """Hand-checked interpolated bigram LM on a 2-doc corpus."""
    import math

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], ["doc_id", "text"])
    out = {r.doc_id: r for r in tf.bigram_logprob(docs).collect()}
    # corpus: tokens a,b,a,b,a,b,c (N=7); c1: a=3,b=3,c=1
    # bigrams: doc1 = (a,b),(b,a),(a,b); doc2 = (a,b),(b,c)
    # c2: (a,b)=3, (b,a)=1, (b,c)=1
    lam = 0.7
    p_ab = lam * 3 / 3 + (1 - lam) * 3 / 7
    p_ba = lam * 1 / 3 + (1 - lam) * 3 / 7
    p_bc = lam * 1 / 3 + (1 - lam) * 1 / 7
    exp1 = (2 * math.log(p_ab) + math.log(p_ba)) / 3
    exp2 = (math.log(p_ab) + math.log(p_bc)) / 2
    assert out[1].n_terms == 3 and abs(out[1].avg_logprob - exp1) < 1e-8
    assert out[2].n_terms == 2 and abs(out[2].avg_logprob - exp2) < 1e-8
    # single-token doc contributes no bigram row
    one = spark.createDataFrame([(9, "solo")], ["doc_id", "text"])
    assert tf.bigram_logprob(one).count() == 0


def test_classifier_score_deterministic_and_bounded(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(50)
    a = {r.doc_id: r.score for r in tf.classifier_score(docs).collect()}
    b = {r.doc_id: r.score for r in tf.classifier_score(docs).collect()}
    assert a == b and len(a) == 50
    assert all(0.0 < s < 1.0 for s in a.values())
    # scores separate documents (a constant classifier would be useless)
    assert len(set(a.values())) > 10


def test_classifier_weights_table_shape(spark):
    w = tf.classifier_weights(spark).collect()
    assert len(w) == tf.CLASSIFIER_BUCKETS
    ms = [r.m for r in w]
    assert min(ms) >= -1000 and max(ms) <= 999
    assert len(set(ms)) > 1000  # weights actually vary


def test_bm25_scores_match_naive(spark):
    """BM25 vs a plain-Python oracle (Lucene variant), incl. a doc with
    no query hits (zero-filled) and an empty doc (dl=0 still counted in
    N/avgdl)."""
    import math

    from lightning_metastore_spark.functions.text import bm25_scores

    rows = [(1, "join the fast join query"), (2, "slow scan only"),
            (3, ""), (4, "vector vector stream join")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    q = ("query", "join", "vector", "stream")
    got = {r.doc_id: (r.n_terms, r.score)
           for r in bm25_scores(docs, query_terms=q).collect()}

    toks = {d: t.lower().split() for d, t in rows}
    N = len(rows)
    avgdl = sum(len(t) for t in toks.values()) / N
    df = {term: sum(1 for t in toks.values() if term in t) for term in q}
    k1, b = 1.2, 0.75
    for d, t in toks.items():
        n_terms = sum(1 for w in t if w in q)
        s = 0.0
        for term in q:
            tf = t.count(term)
            if tf == 0 or df[term] == 0:
                continue
            idf = math.log(1.0 + (N - df[term] + 0.5) / (df[term] + 0.5))
            s += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * len(t) / avgdl))
        assert got[d] == (n_terms, round(s, 9)), d
    assert got[2] == (0, 0.0) and got[3] == (0, 0.0)


def test_zipf_fit_recovers_powerlaw(spark):
    # synthetic exactly-Zipfian corpus: token w_r appears round(1000/r)
    # times -> ln(freq) ~ ln(1000) - 1.0 * ln(rank)
    import numpy as np
    from pyspark.sql import functions as F

    rows = []
    for r in range(1, 51):
        rows.extend([(r, "w%03d" % r)] * round(1000 / r))
    df = spark.createDataFrame(rows, ["i", "w"]) \
        .groupBy("i").agg(F.concat_ws(" ", F.collect_list("w"))
                          .alias("text")) \
        .withColumnRenamed("i", "doc_id")
    out = tf.zipf_fit(df, top_v=50).collect()[0]
    # numpy reference fit over the identical (rank, freq) points
    freqs = sorted((round(1000 / r) for r in range(1, 51)), reverse=True)
    x = np.log(np.arange(1, 51)); y = np.log(freqs)
    slope_ref, intercept_ref = np.polyfit(x, y, 1)
    assert out["slope"] == pytest.approx(slope_ref, abs=1e-4)
    assert out["intercept"] == pytest.approx(intercept_ref, abs=1e-4)
    assert out["r2"] > 0.99
    assert out["n_types"] == 50
    assert out["n_tokens"] == sum(freqs)


def test_zipf_fit_partition_invariant(spark):
    df = spark.createDataFrame(
        [(i, "alpha beta beta gamma gamma gamma delta") for i in range(40)],
        ["doc_id", "text"])
    a = tf.zipf_fit(df, top_v=16).collect()[0]
    b = tf.zipf_fit(df.repartition(13), top_v=16).collect()[0]
    assert a == b


def test_encoding_anomalies_detects_injected(spark):
    moji = "Ã©"          # mangled e-acute
    bad = "ok text" + "�" + "\x07\x08" + moji + moji
    df = spark.createDataFrame([(1, "clean ascii text"),
                                (2, bad),
                                (3, "中文 文本")],
                               ["doc_id", "text"])
    out = {r.doc_id: r for r in tf.encoding_anomalies(df).collect()}
    assert (out[1].n_replacement, out[1].n_ctrl, out[1].mojibake_hits) == (0, 0, 0)
    assert out[1].is_suspect is False
    assert out[2].n_replacement == 1
    assert out[2].n_ctrl == 2
    assert out[2].mojibake_hits == 2
    assert out[2].is_suspect is True
    # CJK is non-ascii but NOT suspect
    assert out[3].is_suspect is False
    assert out[3].nonascii_frac > 0.5


def test_domain_profile_aggregates_and_verdict(spark):
    good = ("the quick brown fox jumps over the lazy dog and runs to the "
            "hills in a long winding tale of many different words") * 2
    df = spark.createDataFrame(
        [(1, good, "en", "srcA"), (2, good + " extra tokens here", "fr", "srcA"),
         (3, "x! y! z!", "en", "srcB")],
        ["doc_id", "text", "lang", "source"])
    out = {r.source: r for r in tf.domain_profile(df, min_avg_quality=0.5)
           .collect()}
    assert out["srcA"].n_docs == 2
    assert out["srcA"].n_langs == 2
    assert bool(out["srcA"].domain_keep) is True
    assert bool(out["srcB"].domain_keep) is False
    # avg equals the mean of the per-doc scores
    q = {r.doc_id: r.quality_score for r in tf.quality_features(df).collect()}
    assert out["srcA"].avg_quality == pytest.approx((q[1] + q[2]) / 2, abs=1e-6)


def test_phrase_search_positions_and_counts(spark):
    df = spark.createDataFrame([
        (1, "big data is big and big data wins"),
        (2, "data big is not the phrase"),
        (3, "prefix words big data"),
        (4, "no match here"),
    ], ["doc_id", "text"])
    out = {r.doc_id: (r.n_hits, r.first_pos)
           for r in tf.phrase_search(df, "big data").collect()}
    assert out == {1: (2, 0), 3: (1, 2)}


def test_phrase_search_three_terms_and_repeats(spark):
    df = spark.createDataFrame([
        (1, "a a a b"),       # "a a" hits at 0 and 1; "a a b" at 1
        (2, "a b a a"),
    ], ["doc_id", "text"])
    two = {r.doc_id: r.n_hits for r in tf.phrase_search(df, "a a").collect()}
    assert two == {1: 2, 2: 1}
    three = {r.doc_id: (r.n_hits, r.first_pos)
             for r in tf.phrase_search(df, "a a b").collect()}
    assert three == {1: (1, 1)}


def test_quantile_normalize_per_group_ranks(spark):
    from lightning_metastore_spark.operators.sampling import (
        quantile_normalize)

    df = spark.createDataFrame(
        [(1, "en", 10), (2, "en", 20), (3, "en", 30),
         (4, "fr", 5), (5, "fr", 500)],
        ["doc_id", "lang", "n_chars"])
    out = {r.doc_id: r.pct_rank
           for r in quantile_normalize(df, "n_chars", "lang").collect()}
    assert out[1] == 0.0 and out[2] == 0.5 and out[3] == 1.0
    # extreme raw gap, same normalized spread as en's min/max
    assert out[4] == 0.0 and out[5] == 1.0


def test_entity_counts_exact_spans(spark):
    df = spark.createDataFrame([
        (1, "reach a@b.io or c.d+x@e-f.org via https://x.io/p?q=1 "
            "on 2024-01-02 and 1999-12-31 buy 3 for 9.99"),
        (2, "no entities in plain prose here"),
        (3, "ftp://not-matched and 2024/01/02 slashed date"),
    ], ["doc_id", "text"])
    out = {r.doc_id: r for r in tf.entity_counts(df).collect()}
    assert (out[1].n_emails, out[1].n_urls, out[1].n_dates) == (2, 1, 2)
    assert out[1].n_numbers >= 2 and bool(out[1].any_entity)
    assert (out[2].n_emails, out[2].n_urls, out[2].n_dates,
            out[2].n_numbers) == (0, 0, 0, 0)
    assert not bool(out[2].any_entity)
    assert out[3].n_urls == 0 and out[3].n_dates == 0
    assert out[3].n_numbers > 0  # the slashed date's digit runs count


def test_gopher_quality_rules_twin(spark):
    """Hand-built docs exercising every Gopher rule, verified against
    an independent Python re-derivation of the published thresholds."""
    import re

    from lightning_metastore_spark.functions.text import (
        gopher_quality_rules,
    )

    good = ("the quick brown fox jumps with great energy and that "
            "steady pace shows just how much these animals have to "
            "offer when they run through the quiet forest and keep "
            "moving along the winding path toward the distant hills "
            "while birds watch from tall branches above the meadow "
            "and the evening light settles over every quiet field")
    docs = spark.createDataFrame(
        [(1, good),                                  # passes everything
         (2, "too short to pass the word count rule"),
         (3, "- " + "\n- ".join(["the item of and that"] * 20)),  # bullets
         (4, good.replace(" and ", " ### and ### ")),  # symbol ratio
         (5, " ".join(["12345 67890"] * 40)),          # no alpha, no stops
         (6, None),
         (7, "")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in gopher_quality_rules(docs).collect()}

    def twin(text):
        text = text or ""
        words = [w for w in re.split(r"\s+", text.lower()) if w]
        nw = max(len(words), 1)
        lines = text.split("\n")
        nl = max(len(lines), 1)
        mean_len = sum(len(w) for w in words) / nw
        symbols = len(re.findall(r"#|\.\.\.|…", text))
        bullets = sum(1 for l in lines if re.match(r"^\s*[•‣▪\-\*]", l))
        ellip = sum(1 for l in lines if re.search(r"(\.\.\.|…)\s*$", l))
        alpha = sum(1 for w in words if re.search(r"[a-z]", w))
        stops = len({"the", "be", "to", "of", "and", "that", "have",
                     "with"} & set(words))
        keep = (50 <= len(words) <= 100_000 and 3 <= mean_len <= 10
                and symbols / nw < 0.1 and bullets / nl < 0.9
                and ellip / nl < 0.3 and alpha / nw > 0.8 and stops >= 2)
        return (len(words), round(mean_len, 6), round(symbols / nw, 6),
                round(bullets / nl, 6), round(ellip / nl, 6),
                round(alpha / nw, 6), stops, keep)

    for doc_id, text in [(1, good), (2, "too short to pass the word "
                                     "count rule"),
                         (3, "- " + "\n- ".join(["the item of and that"]
                                                * 20)),
                         (4, good.replace(" and ", " ### and ### ")),
                         (5, " ".join(["12345 67890"] * 40)),
                         (6, None), (7, "")]:
        r = got[doc_id]
        assert (r.n_words, r.mean_word_len, r.symbol_word_ratio,
                r.bullet_line_frac, r.ellipsis_line_frac,
                r.alpha_word_frac, r.n_stop_present,
                r.gopher_keep) == twin(text), doc_id
    assert got[1].gopher_keep and not any(
        got[i].gopher_keep for i in (2, 3, 4, 5, 6, 7))


def test_curate_gopher_stage(spark):
    """use_gopher_rules rejects with reason gopher_rules; row count
    stays invariant and the default config is unaffected."""
    from lightning_metastore_spark.operators.pipeline import (
        CurationConfig,
        curate_corpus,
    )

    long_good = ("the steady rhythm of these long sentences keeps the "
                 "word count well above fifty and that gives the rule "
                 "set something real to measure with plenty of common "
                 "stop words spread through the text so the presence "
                 "test passes while every other ratio stays in range "
                 "and the final line carries the count past the floor")
    docs = spark.createDataFrame(
        [(1, long_good), (2, "way too short for gopher")],
        "doc_id long, text string")
    base = curate_corpus(docs, CurationConfig(min_quality=0.0,
                                              boilerplate_max_df=10,
                                              use_minhash=False))
    assert base.count() == 2 and all(r.keep for r in base.collect())
    out = {r.doc_id: r for r in curate_corpus(
        docs, CurationConfig(min_quality=0.0, boilerplate_max_df=10,
                             use_minhash=False,
                             use_gopher_rules=True)).collect()}
    assert len(out) == 2
    assert out[1].keep and out[1].drop_reason is None
    assert not out[2].keep and out[2].drop_reason == "gopher_rules"
