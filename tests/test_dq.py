"""DQ check tests mirroring the reference's expected-count style
(RegisterDataQualityTestSuite.scala:221-249 — (name, table, type,
total, valid, invalid) rows on tiny fixtures)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from lightning_metastore_spark.operators import dq  # noqa: E402


def _fixture(spark):
    customer = spark.createDataFrame(
        [(1, "c1"), (2, "c2"), (3, "c3")], ["id", "name"])
    order = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3), (4, 1), (5, 9)], ["oid", "cid"])
    return customer, order


def test_pk_check_counts(spark):
    customer, _ = _fixture(spark)
    row = dq.pk_check(customer, ["id"], "pk", "customer").collect()[0]
    assert (row.total, row.valid, row.invalid) == (3, 3, 0)


def test_pk_check_detects_dups_and_nulls(spark):
    df = spark.createDataFrame([(1,), (1,), (2,), (None,)], "id int")
    row = dq.pk_check(df, ["id"], "pk", "t").collect()[0]
    # two dup rows + one null row invalid
    assert (row.total, row.valid, row.invalid) == (4, 1, 3)


def test_fk_check_orphans(spark):
    customer, order = _fixture(spark)
    row = dq.fk_check(order, ["cid"], customer, ["id"], "fk", "order").collect()[0]
    assert (row.total, row.valid, row.invalid) == (5, 4, 1)  # cid=9 orphan


def test_custom_check(spark):
    _, order = _fixture(spark)
    row = dq.custom_check(order, "cid <= 3", "c", "order").collect()[0]
    assert (row.total, row.valid, row.invalid) == (5, 4, 1)


def test_dq_records(spark):
    _, order = _fixture(spark)
    bad = dq.dq_records(order, "cid <= 3", valid=False).collect()
    assert [r.oid for r in bad] == [5]


def test_dq_records_limit_zero(spark):
    """Regression: LIMIT 0 must return zero rows, not everything."""
    _, order = _fixture(spark)
    assert dq.dq_records(order, "cid <= 3", valid=True, limit=0).count() == 0
