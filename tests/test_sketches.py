"""Sketch accuracy: approximate aggregates must land within their
declared error bounds of the exact answers."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from lightning_metastore_spark.plans.pipeline_queries import sketch_profile  # noqa: E402
from lightning_metastore_spark.session import load_tables  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402


def test_sketch_profile_within_bounds(spark):
    """The gate emits accuracy VERDICT columns (sketch vs exact computed
    in the same query); every verdict must hold, and the deterministic
    exact columns must equal an independently computed groundtruth."""
    prof = {r.event_type: r for r in sketch_profile(spark, SF_DIR).collect()}
    ev = load_tables(spark, SF_DIR, ("events",))["events"]
    exact = {r.event_type: r for r in
             ev.groupBy("event_type")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.countDistinct("user_id").alias("users"))
             .collect()}
    assert set(prof) == set(exact)
    for et, a in prof.items():
        e = exact[et]
        assert a.n == e.n and a.exact_users == e.users, et
        assert a.users_ok and a.p50_ok and a.p95_ok, et
