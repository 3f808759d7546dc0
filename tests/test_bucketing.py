"""Bucketed co-located join: writing both fact tables bucketed by the
join key removes the shuffle from subsequent joins — the plan must show
a join with NO Exchange on either side. This is the 100 TB strategy for
repeated fact-fact joins (SCALE.md)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    t_orders = f"b_orders_{tmp_path.name}"
    t_lineitem = f"b_lineitem_{tmp_path.name}"
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable(t_orders))
    (lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable(t_lineitem))
    # at test scale Spark would broadcast; disable it so the plan shows
    # the co-located SortMergeJoin a 100TB fact-fact join would use
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (spark.table(t_lineitem)
                  .join(spark.table(t_orders),
                        F.col("l_orderkey") == F.col("o_orderkey"))
                  .groupBy("o_orderstatus")
                  .agg(F.count(F.lit(1)).alias("n")))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "SelectedBucketsCount: 8 out of 8" in plan
        # bucketed layout co-locates both sides: no Exchange below the join
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        # and the result is still right
        n_total = sum(r.n for r in joined.collect())
        assert n_total == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE {t_orders}")
        spark.sql(f"DROP TABLE {t_lineitem}")
