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
