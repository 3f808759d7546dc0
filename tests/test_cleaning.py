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
