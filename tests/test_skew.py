"""Skew utilities: salted join / two-phase agg must equal their plain
counterparts on skewed data."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from lightning_metastore_spark.operators import skew  # noqa: E402


def _skewed(spark):
    # 90% of rows share key 0
    hot = spark.range(9000).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    rest = spark.range(1000).select((F.col("id") % 50 + 1).alias("k"),
                                    F.col("id").alias("v"))
    return hot.union(rest)


def test_salted_join_equals_plain(spark):
    large = _skewed(spark)
    small = spark.range(51).select(F.col("id").alias("k"),
                                   (F.col("id") * 10).alias("w"))
    plain = large.join(small, "k").groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw"))
    salted = skew.salted_join(large, small, ["k"], salt=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw"))
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join(spark):
    large = _skewed(spark)
    small = spark.range(5).select(F.col("id").alias("k"), F.lit("x").alias("w"))
    plain = large.join(small, "k", "left").count()
    salted = skew.salted_join(large, small, ["k"], salt=4, how="left").count()
    assert salted == plain


def test_two_phase_agg_equals_plain(spark):
    df = _skewed(spark)
    plain = {(r.k): (r.n, r.s, r.mx) for r in
             df.groupBy("k").agg(F.count(F.lit(1)).alias("n"),
                                 F.sum("v").alias("s"),
                                 F.max("v").alias("mx")).collect()}
    two = {(r.k): (r.n, r.s, r.mx) for r in
           skew.two_phase_agg(df, ["k"],
                              {"n": "count(*)", "s": "sum(v)", "mx": "max(v)"},
                              salt=8).collect()}
    assert two == plain


def test_skyline_matches_not_exists(spark):
    """Two-phase distributed skyline == the NOT EXISTS definition,
    invariant to input partitioning; duplicates of a skyline point all
    survive."""
    import random

    from lightning_metastore_spark.operators.skyline import skyline

    rng = random.Random(13)
    rows = [(i, rng.randint(0, 50), rng.randint(0, 50))
            for i in range(300)]
    rows += [(900, 0, 50), (901, 0, 50)]      # duplicate extreme point
    df = spark.createDataFrame(rows, "id long, cost long, value long")

    got = sorted(r.id for r in
                 skyline(df, minimize=["cost"], maximize=["value"]).collect())
    want = sorted(
        i for i, c, v in rows
        if not any((c2 <= c and v2 >= v and (c2 < c or v2 > v))
                   for _, c2, v2 in rows))
    assert got == want
    assert 900 in got and 901 in got

    got13 = sorted(r.id for r in skyline(
        df.repartition(13), minimize=["cost"], maximize=["value"]).collect())
    assert got13 == got


def test_skyline_three_dims(spark):
    from lightning_metastore_spark.operators.skyline import skyline

    rows = [(1, 1, 1, 1), (2, 2, 2, 2), (3, 1, 2, 0), (4, 3, 1, 0)]
    df = spark.createDataFrame(rows, "id long, a long, b long, c long")
    got = sorted(r.id for r in
                 skyline(df, minimize=["a", "b", "c"]).collect())
    # (2,2,2) dominated by (1,1,1); (3: 1,2,0) escapes via c; (4: 3,1,0)
    # escapes via b/c against 1 and via a-vs-b trade against 3
    assert got == [1, 3, 4]


def test_skyline_keeps_null_rows(spark):
    """A NULL criterion can neither dominate nor be dominated — the
    row is always kept (SQL NULL semantics, matching the oracle)."""
    from lightning_metastore_spark.operators.skyline import skyline

    rows = [(1, 1, 10), (2, 5, 20), (3, None, 50), (4, 9, 9)]
    df = spark.createDataFrame(rows, "id long, cost long, value long")
    got = sorted(r.id for r in
                 skyline(df, minimize=["cost"], maximize=["value"]).collect())
    # 1 and 2 trade cost-vs-value; 3 survives via its NULL cost;
    # 4 is dominated by 2 (5<=9, 20>=9, strict)
    assert got == [1, 2, 3]


def test_skyline_per_group(spark):
    """Per-group skyline: fronts are independent across groups and
    each equals the single-group skyline of that slice."""
    import random

    from lightning_metastore_spark.operators.skyline import (
        skyline, skyline_per_group)

    rng = random.Random(17)
    rows = [(i, ["a", "b", "c"][i % 3], rng.randint(0, 30),
             rng.randint(0, 30)) for i in range(240)]
    df = spark.createDataFrame(rows, "id long, g string, cost long, value long")
    got = sorted((r.g, r.id) for r in skyline_per_group(
        df, ["g"], minimize=["cost"], maximize=["value"]).collect())
    want = []
    for g in ("a", "b", "c"):
        sub = df.filter(df.g == g)
        want += [(g, r.id) for r in
                 skyline(sub, minimize=["cost"], maximize=["value"]).collect()]
    assert got == sorted(want)
