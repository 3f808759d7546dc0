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
    approx = {r.event_type: r for r in sketch_profile(spark, SF_DIR).collect()}
    ev = load_tables(spark, SF_DIR, ("events",))["events"]
    exact = {r.event_type: r for r in
             ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("users"),
                  F.expr("percentile(value, 0.5)").alias("p50"))
             .collect()}
    assert set(approx) == set(exact)
    for et, a in approx.items():
        e = exact[et]
        # HLL++ rsd=0.02 -> allow 6% (3 sigma)
        assert abs(a.approx_users - e.users) <= max(3, 0.06 * e.users), et
        # approx percentile with 10k accuracy on this data is near-exact
        assert abs(a.p50 - e.p50) <= max(1.0, 0.05 * abs(e.p50)), et
        assert a.p50 <= a.p95
