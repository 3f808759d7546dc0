"""MERGE INTO over file datasources: upsert/delete/insert semantics
(the reference gets MERGE only via Iceberg — etl_in_iceberg_lakehouse.md
scenarios 1-2; ours works on parquet via full-outer-join rewrite)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from lightning_metastore_spark.context import LightningContext  # noqa: E402


@pytest.fixture()
def ctx(spark, tmp_path):
    c = LightningContext(spark, warehouse=str(tmp_path / "model"))
    sink = tmp_path / "data"
    sink.mkdir()
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["id", "name", "amount"],
    ).write.parquet(str(sink / "accounts.parquet"))
    c.sql("CREATE NAMESPACE lightning.datasource.file")
    c.sql(f"REGISTER PARQUET DATASOURCE db OPTIONS(path '{sink}') "
          f"NAMESPACE lightning.datasource.file")
    return c


def _rows(ctx):
    return {r.id: (r.name, r.amount) for r in
            ctx.sql("SELECT * FROM lightning.datasource.file.db.accounts").collect()}


def test_merge_upsert(ctx, spark):
    spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)], ["id", "name", "amount"]
    ).createOrReplaceTempView("updates")
    out = ctx.sql("""
        MERGE INTO lightning.datasource.file.db.accounts AS t
        USING (SELECT * FROM updates) AS s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET name = s.name, amount = s.amount
        WHEN NOT MATCHED THEN INSERT *
    """).collect()
    assert out[0].n_rows == 4
    assert _rows(ctx) == {1: ("a", 10.0), 2: ("b2", 99.0),
                          3: ("c", 30.0), 4: ("d", 40.0)}


def test_merge_delete(ctx, spark):
    spark.createDataFrame([(1,), (3,)], ["id"]).createOrReplaceTempView("dels")
    ctx.sql("""
        MERGE INTO lightning.datasource.file.db.accounts AS t
        USING (SELECT * FROM dels) AS s
        ON t.id = s.id
        WHEN MATCHED THEN DELETE
    """)
    assert _rows(ctx) == {2: ("b", 20.0)}


def test_merge_update_expression(ctx, spark):
    spark.createDataFrame([(1, 5.0)], ["id", "bump"]).createOrReplaceTempView("bumps")
    ctx.sql("""
        MERGE INTO lightning.datasource.file.db.accounts AS t
        USING (SELECT * FROM bumps) AS s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET amount = t.amount + s.bump
    """)
    assert _rows(ctx)[1] == ("a", 15.0)
    assert _rows(ctx)[2] == ("b", 20.0)  # untouched


def test_merge_insert_values(ctx, spark):
    spark.createDataFrame([(9, "z")], ["id", "label"]).createOrReplaceTempView("news")
    ctx.sql("""
        MERGE INTO lightning.datasource.file.db.accounts AS t
        USING (SELECT * FROM news) AS s
        ON t.id = s.id
        WHEN NOT MATCHED THEN INSERT (id, name, amount) VALUES (s.id, s.label, 0.0)
    """)
    assert _rows(ctx)[9] == ("z", 0.0)
    assert len(_rows(ctx)) == 4


def test_merge_against_lightning_source(ctx, spark, tmp_path):
    """USING another lightning table (cross-source upsert)."""
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame([(3, "c9", 33.0)], ["id", "name", "amount"]) \
        .write.parquet(str(src / "delta_feed.parquet"))
    ctx.sql(f"REGISTER PARQUET DATASOURCE feed OPTIONS(path '{src}') "
            f"NAMESPACE lightning.datasource.file")
    ctx.sql("""
        MERGE INTO lightning.datasource.file.db.accounts AS t
        USING lightning.datasource.file.feed.delta_feed AS s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET name = s.name, amount = s.amount
    """)
    assert _rows(ctx)[3] == ("c9", 33.0)
