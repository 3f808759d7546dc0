"""Line-level corpus dedup (boilerplate removal) tests."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from lightning_metastore_spark.operators.cleaning import (  # noqa: E402
    remove_boilerplate_lines,
)

HEADER = "Cookie Policy | Accept All"
FOOTER = "(c) 2026 Example Corp"


def test_boilerplate_lines_removed_order_kept(spark):
    docs = spark.createDataFrame([
        (1, f"{HEADER}\nunique first body\nmore text one\n{FOOTER}"),
        (2, f"{HEADER}\nsecond body here\n{FOOTER}"),
        (3, f"{HEADER}\nthird body text\nextra line\n{FOOTER}"),
    ], ["doc_id", "text"])
    out = {r.doc_id: r.text for r in
           remove_boilerplate_lines(docs, max_df=2).collect()}
    assert out[1] == "unique first body\nmore text one"
    assert out[2] == "second body here"
    assert out[3] == "third body text\nextra line"


def test_normalized_matching_and_empty_docs(spark):
    docs = spark.createDataFrame([
        (1, "SHARED   LINE\nbody a"),
        (2, "shared line\nbody b"),
        (3, "Shared Line"),  # only boilerplate -> empty text, row kept
    ], ["doc_id", "text"])
    out = {r.doc_id: r.text for r in
           remove_boilerplate_lines(docs, max_df=2).collect()}
    assert out[1] == "body a" and out[2] == "body b"
    assert out[3] == ""


def test_below_threshold_untouched(spark):
    docs = spark.createDataFrame([
        (1, "common\nbody a"), (2, "common\nbody b"), (3, "solo doc")],
        ["doc_id", "text"])
    out = {r.doc_id: r.text for r in
           remove_boilerplate_lines(docs, max_df=2).collect()}
    assert out[1] == "common\nbody a"  # df=2 <= max_df: kept
    assert out[3] == "solo doc"


def test_dedup_lines_within_doc(spark):
    """Repeated lines inside a doc collapse to the first occurrence
    (whitespace/case-insensitive identity), order preserved; other
    docs untouched; the plan is map-only (zero shuffle)."""
    from lightning_metastore_spark.operators.cleaning import (
        dedup_lines_within_doc)

    docs = spark.createDataFrame(
        [(1, "a\nb\nA \nc\nb"), (2, "x"), (3, ""), (4, "Nav\nbody\nNAV")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in dedup_lines_within_doc(docs).collect()}
    assert (out[1].text, out[1].n_lines, out[1].n_kept) == ("a\nb\nc", 5, 3)
    assert (out[2].text, out[2].n_kept) == ("x", 1)
    assert (out[3].text, out[3].n_lines, out[3].n_kept) == ("", 1, 1)
    assert (out[4].text, out[4].n_lines, out[4].n_kept) == ("Nav\nbody", 3, 2)

    plan = (dedup_lines_within_doc(docs)._jdf.queryExecution()
            .executedPlan().toString())
    assert "Exchange" not in plan


def test_dedup_lines_within_doc_matches_naive(spark):
    import random

    from lightning_metastore_spark.operators.cleaning import (
        dedup_lines_within_doc)

    rng = random.Random(3)
    vocab = ["alpha", "beta", "Gamma", " beta", "delta\t x"]
    rows = [(i, "\n".join(rng.choice(vocab)
                          for _ in range(rng.randint(0, 12))))
            for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.text, r.n_lines, r.n_kept)
           for r in dedup_lines_within_doc(docs).collect()}

    def normk(s):
        return " ".join(s.strip().lower().split())

    for doc_id, text in rows:
        lines = text.split("\n")
        seen, keep = set(), []
        for ln in lines:
            k = normk(ln)
            if k not in seen:
                seen.add(k)
                keep.append(ln)
        assert got[doc_id] == ("\n".join(keep), len(lines), len(keep)), doc_id


def test_normalize_text_unicode_and_whitespace(spark):
    """NFC composes combining sequences; NFKC additionally folds
    ligatures/NBSP; controls stripped; whitespace runs collapse;
    NULL text passes through with changed=False."""
    from lightning_metastore_spark.operators.cleaning import normalize_text

    rows = [
        (1, "café"),            # e + combining acute -> é
        (2, "ﬁle  with nbsp"),   # fi-ligature + NBSP
        (3, "ok\x00\x07 text\x0b here"),   # C0 controls
        (4, "  already clean  "),
        (5, None),
        (6, "a\x85b\x92c"),     # NEL -> space; C1 PU2 stripped
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    nfc = {r.doc_id: r for r in normalize_text(docs, form="NFC").collect()}
    assert nfc[1].text_norm == "café" and nfc[1].changed
    assert nfc[1].n_chars_before == 5 and nfc[1].n_chars_after == 4
    # NFC does NOT fold the ligature; NBSP still collapses to a space
    assert nfc[2].text_norm == "ﬁle with nbsp"
    assert nfc[3].text_norm == "ok text here" and nfc[3].changed
    assert nfc[4].text_norm == "already clean" and nfc[4].changed
    assert nfc[5].text_norm is None and not nfc[5].changed
    assert nfc[5].n_chars_before == 0 and nfc[5].n_chars_after == 0
    assert nfc[6].text_norm == "a bc" and nfc[6].changed

    nfkc = {r.doc_id: r for r in
            normalize_text(docs, form="NFKC").collect()}
    assert nfkc[2].text_norm == "file with nbsp"   # ligature folded

    import pytest

    with pytest.raises(ValueError):
        normalize_text(docs, form="NFX")


def test_normalize_text_matches_duckdb_pipeline(spark):
    """Character-for-character engine cross-check: the same fixed
    pipeline (nfc_normalize -> control strip -> whitespace collapse ->
    trim) in DuckDB produces identical output — normalization is an
    engine-portable corpus contract, not a Spark detail."""
    import duckdb

    from lightning_metastore_spark.operators.cleaning import normalize_text

    rows = [(1, "café dürer"),
            (2, "Å Å angstrom"),      # ring + Å sign -> same NFC
            (3, "tabs\tand\r\nnewlines nbsp  runs"),
            (4, "ctrl\x01\x02\x7fhere"),
            (5, "plain ascii"),
            # C1 controls strip; NEL (u0085) collapses to a space
            (6, "c1\x80\x9fctrls\x85nel")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text_norm
           for r in normalize_text(docs, form="NFC").collect()}

    con = duckdb.connect()
    for doc_id, text in rows:
        want = con.execute(r"""
            SELECT trim(regexp_replace(
                     regexp_replace(nfc_normalize(?),
                       '[\x00-\x08\x0b\x0c\x0e-\x1f\x7f\x{0080}-\x{0084}\x{0086}-\x{009f}]', '', 'g'),
                     '[\s\x{0085}\x{00a0}\x{1680}\x{2000}-\x{200a}\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}]+', ' ', 'g'))""", [text]).fetchone()[0]
        assert got[doc_id] == want, (doc_id, got[doc_id], want)


def test_normalize_text_feeds_exact_dedup(spark):
    """The point of normalization: byte-different renderings of the
    same text become one dedup group after normalize_text."""
    from pyspark.sql import functions as F

    from lightning_metastore_spark.operators.cleaning import normalize_text
    from lightning_metastore_spark.operators.dedup import exact_dedup

    docs = spark.createDataFrame(
        [(1, "café noir"), (2, "café  noir"),
         (3, "espresso bar")],
        "doc_id long, text string")
    norm = normalize_text(docs).select("doc_id",
                                       F.col("text_norm").alias("text"))
    kept = {r.doc_id: r.dup_count for r in exact_dedup(norm).collect()}
    assert kept == {1: 2, 3: 1}
    # without normalization they stay distinct
    raw = {r.doc_id: r.dup_count for r in exact_dedup(docs).collect()}
    assert len(raw) == 3


def test_normalize_text_collapses_unicode_spaces_under_nfc(spark):
    """NFC preserves em/ideographic/para spaces; the explicit collapse
    class must still fold them, so visually identical renderings share
    dedup keys (the operator's whole purpose)."""
    from lightning_metastore_spark.operators.cleaning import (
        normalize_text)

    rows = [(1, "a b"), (2, "a\u2003b"), (3, "a\u3000 b"),
            (4, "a\u2028b"), (5, "a\u202f\u205fb")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.text_norm
           for r in normalize_text(df, form="NFC").collect()}
    assert got == {i: "a b" for i in range(1, 6)}


def test_c4_line_clean_twin(spark):
    """Independent Python re-derivation of the C4 line/page rules on
    docs exercising every rule: terminal punctuation, line word floor,
    javascript lines, sentence floor, lorem ipsum, curly braces."""
    import re

    from lightning_metastore_spark.operators.cleaning import c4_line_clean

    docs = spark.createDataFrame(
        [(1, "This line ends with a period and has words.\n"
             "short line.\n"
             "no terminal punctuation here at all\n"
             "Please enable javascript to view this page.\n"
             "Another proper sentence ends right here!\n"
             "And a third full sentence closes the page?"),
         (2, "Only one proper sentence lives on this page."),
         (3, "A page with lorem ipsum filler text inside it. "
             "Second sentence here. Third sentence too."),
         (4, "A code page { return 42; } with braces. "
             "Second sentence. Third sentence."),
         (5, None)],
        "doc_id long, text string")
    got = {r.doc_id: r for r in c4_line_clean(docs).collect()}

    def twin(text):
        text = text or ""
        lines = text.split("\n")
        kept = [x for x in lines
                if re.search(r'[.!?"]$', x.strip())
                and len([w for w in re.split(r"\s+", x.strip()) if w]) >= 5
                and "javascript" not in x.lower()]
        tk = "\n".join(kept)
        n_sent = len(re.findall(r"[.!?]", tk))
        keep = (n_sent >= 3 and "lorem ipsum" not in text.lower()
                and "{" not in text)
        return (tk, len(lines), len(kept), n_sent, keep)

    texts = {1: "This line ends with a period and has words.\n"
                "short line.\n"
                "no terminal punctuation here at all\n"
                "Please enable javascript to view this page.\n"
                "Another proper sentence ends right here!\n"
                "And a third full sentence closes the page?",
             2: "Only one proper sentence lives on this page.",
             3: "A page with lorem ipsum filler text inside it. "
                "Second sentence here. Third sentence too.",
             4: "A code page { return 42; } with braces. "
                "Second sentence. Third sentence.",
             5: None}
    for doc_id, text in texts.items():
        r = got[doc_id]
        assert (r.text, r.n_lines, r.n_lines_kept, r.n_sentences,
                r.c4_keep) == twin(text), doc_id
    assert got[1].c4_keep                       # 3 kept sentences
    assert not got[2].c4_keep                   # sentence floor
    assert not got[3].c4_keep                   # lorem ipsum
    assert not got[4].c4_keep                   # curly brace
    assert not got[5].c4_keep                   # NULL = empty page
    # the javascript and unterminated lines are gone from doc 1
    assert "javascript" not in got[1].text
    assert "no terminal punctuation" not in got[1].text
