"""SUITE_SECTIONS (plans/pipeline_queries.py) stays in sync with the
melted gate suites it attributes: every registered section is a runnable
standalone builder, and the section keys match the tag values the suite
actually emits — so a new suite member can't ship without a bench
section (and a per-section timing) of its own."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from tests.conftest import SF_DIR  # noqa: E402


def _suite_tags(df, col):
    return {r[col] for r in df.select(col).distinct().collect()}


def test_every_section_is_registered_and_runs(spark):
    from lightning_metastore_spark.plans.pipeline_queries import (
        PIPELINE_QUERIES, SUITE_SECTIONS)

    for suite, sections in SUITE_SECTIONS.items():
        assert suite in PIPELINE_QUERIES, suite
        assert sections, suite
        for sec, build in sections.items():
            df = build(spark, SF_DIR)
            assert df.limit(1).count() >= 0, (suite, sec)


def test_section_keys_match_suite_tag_values(spark):
    from lightning_metastore_spark.plans.pipeline_queries import (
        PIPELINE_QUERIES, SUITE_SECTIONS)

    # suites whose tag column carries exactly the section keys
    exact = {"dedup_cluster_suite": "section",
             "corpus_profile_suite": "section",
             "sampling_quantize_suite": "section",
             "text_lm_suite": "section",
             "dedup_neardup_suite": "method",
             "ann_topk_suite": "method"}
    for suite, col in exact.items():
        got = _suite_tags(PIPELINE_QUERIES[suite].build(spark, SF_DIR), col)
        assert got == set(SUITE_SECTIONS[suite]), (suite, got)

    # temporal_rollup: the 'rollup' section alone emits the three
    # grouping-sets resolutions; every other section is its own tag
    tr = _suite_tags(PIPELINE_QUERIES["temporal_rollup"].build(spark, SF_DIR),
                     "resolution")
    want = ({"hour", "day", "week"}
            | (set(SUITE_SECTIONS["temporal_rollup"]) - {"rollup"}))
    assert tr == want

    # dq_suite: one dq_name row per section
    dq = _suite_tags(PIPELINE_QUERIES["dq_suite"].build(spark, SF_DIR),
                     "dq_name")
    assert len(dq) == len(SUITE_SECTIONS["dq_suite"])
