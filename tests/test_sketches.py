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


def test_heavy_hitters_exact_and_bounded(spark):
    """Sketch-then-verify heavy hitters: output equals the exact
    groupBy-count answer for every s and partitioning — the sketch only
    bounds memory, the verify step makes the answer exact."""
    import random

    from lightning_metastore_spark.operators.heavy_hitters import (
        heavy_hitters)

    rng = random.Random(31)
    # zipf-ish: a few hot items + a long tail of near-unique ones
    vals = (["hot_a"] * 900 + ["hot_b"] * 500 + ["warm"] * 120
            + [f"tail{i}" for i in range(3000)])
    rng.shuffle(vals)
    items = spark.createDataFrame([(v,) for v in vals], "item string")

    for s in (0.05, 0.02):
        for df in (items, items.repartition(17)):
            got = [(r.rank, r.item, r.cnt) for r in
                   heavy_hitters(df, s=s).collect()]
            n = len(vals)
            from collections import Counter
            want = [(i + 1, t, c) for i, (t, c) in enumerate(
                sorted(((t, c) for t, c in Counter(vals).items()
                        if c >= s * n), key=lambda tc: (-tc[1], tc[0])))]
            assert got == want, (s, got, want)
    # sanity: the hot items actually qualified
    assert any(t == "hot_a" for _, t, _ in got)
