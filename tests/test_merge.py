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


def test_merge_duplicate_source_match_raises(ctx, spark):
    """Standard MERGE cardinality rule: >1 source row matching one target
    row is an error (Delta/ANSI behavior), not a silent duplication —
    and the violation is detected BEFORE the destructive overwrite."""
    from lightning_metastore_spark.parser.dispatcher import CommandParseError
    spark.createDataFrame(
        [(2, "x", 1.0), (2, "y", 2.0)], ["id", "name", "amount"]
    ).createOrReplaceTempView("dup_src")
    with pytest.raises(CommandParseError, match="multiple"):
        ctx.sql("""
            MERGE INTO lightning.datasource.file.db.accounts AS t
            USING (SELECT * FROM dup_src) AS s
            ON t.id = s.id
            WHEN MATCHED THEN UPDATE SET name = s.name, amount = s.amount
        """)
    assert _rows(ctx) == {1: ("a", 10.0), 2: ("b", 20.0), 3: ("c", 30.0)}


def test_merge_duplicate_match_delete_raises(ctx, spark):
    """DELETE path too: dup matches would silently over-delete."""
    from lightning_metastore_spark.parser.dispatcher import CommandParseError
    spark.createDataFrame([(1,), (1,)], ["id"]).createOrReplaceTempView("dup_dels")
    with pytest.raises(CommandParseError, match="multiple"):
        ctx.sql("""
            MERGE INTO lightning.datasource.file.db.accounts AS t
            USING (SELECT * FROM dup_dels) AS s
            ON t.id = s.id
            WHEN MATCHED THEN DELETE
        """)
    assert _rows(ctx) == {1: ("a", 10.0), 2: ("b", 20.0), 3: ("c", 30.0)}


def test_merge_update_plus_delete_rejected(ctx, spark):
    """Unconditional UPDATE + DELETE both claim every matched row — the
    grammar has no AND-conditions to disambiguate, so refuse."""
    from lightning_metastore_spark.parser.dispatcher import CommandParseError
    spark.createDataFrame(
        [(1, "q", 1.0)], ["id", "name", "amount"]).createOrReplaceTempView("one_row")
    with pytest.raises(CommandParseError, match="ambiguous"):
        ctx.sql("""
            MERGE INTO lightning.datasource.file.db.accounts AS t
            USING (SELECT * FROM one_row) AS s
            ON t.id = s.id
            WHEN MATCHED THEN UPDATE SET name = s.name
            WHEN MATCHED THEN DELETE
        """)


def test_insert_overwrite_self_read(ctx):
    """INSERT OVERWRITE t SELECT ... FROM t must materialize the SELECT
    before truncating the target (lineage break), or the read and the
    overwrite race on the same files."""
    ctx.sql("""INSERT OVERWRITE lightning.datasource.file.db.accounts
        SELECT id, name, amount * 2 AS amount
        FROM lightning.datasource.file.db.accounts WHERE id <= 2""")
    assert _rows(ctx) == {1: ("a", 20.0), 2: ("b", 40.0)}


@pytest.fixture()
def derby_ctx(spark, tmp_path):
    """MERGE target inside embedded Derby: the staged-transactional
    JDBC overwrite path (the reference supports MERGE only through
    Iceberg — this extends it to warehouse RDBMS targets)."""
    db = str(tmp_path / "mergedb")
    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(
        f"jdbc:derby:{db};create=true")
    st = conn.createStatement()
    st.execute("CREATE TABLE accounts "
               "(id INT PRIMARY KEY, name VARCHAR(20), amount DOUBLE)")
    for i, n, a in [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)]:
        st.execute(f"INSERT INTO accounts VALUES ({i}, '{n}', {a})")
    st.close()
    conn.close()
    c = LightningContext(spark, warehouse=str(tmp_path / "model"))
    c.sql("CREATE NAMESPACE lightning.datasource.rdbms")
    c.sql(f"REGISTER JDBC DATASOURCE mdb OPTIONS(url 'jdbc:derby:{db}', "
          f"driver 'org.apache.derby.iapi.jdbc.AutoloadedDriver') "
          f"NAMESPACE lightning.datasource.rdbms")
    return c


def _derby_rows(ctx):
    return {r.ID: (r.NAME, r.AMOUNT) for r in ctx.sql(
        "SELECT * FROM lightning.datasource.rdbms.mdb.accounts").collect()}


def test_merge_upsert_jdbc_target(derby_ctx, spark):
    spark.createDataFrame(
        [(2, "b2", 99.0), (4, "d", 40.0)], ["id", "name", "amount"]
    ).createOrReplaceTempView("jdbc_updates")
    out = derby_ctx.sql("""
        MERGE INTO lightning.datasource.rdbms.mdb.accounts AS t
        USING (SELECT * FROM jdbc_updates) AS s
        ON t.ID = s.id
        WHEN MATCHED THEN UPDATE SET NAME = s.name, AMOUNT = s.amount
        WHEN NOT MATCHED THEN INSERT *
    """).collect()
    assert out[0].n_rows == 4
    assert _derby_rows(derby_ctx) == {1: ("a", 10.0), 2: ("b2", 99.0),
                                      3: ("c", 30.0), 4: ("d", 40.0)}
    # the swap preserved the REAL table (transactional DELETE+INSERT,
    # not Spark's drop-and-recreate): the PK constraint must still hold
    jvm = spark.sparkContext._jvm
    conn = jvm.java.sql.DriverManager.getConnection(
        derby_ctx.metastore.load_datasource(["rdbms"], "mdb").options["url"])
    st = conn.createStatement()
    import py4j.protocol
    with pytest.raises(py4j.protocol.Py4JJavaError):
        st.execute("INSERT INTO accounts VALUES (1, 'dup', 0.0)")
    st.close()
    conn.close()


def test_merge_delete_jdbc_target(derby_ctx, spark):
    spark.createDataFrame([(1,), (3,)], ["id"]).createOrReplaceTempView(
        "jdbc_dels")
    derby_ctx.sql("""
        MERGE INTO lightning.datasource.rdbms.mdb.accounts AS t
        USING (SELECT * FROM jdbc_dels) AS s
        ON t.ID = s.id
        WHEN MATCHED THEN DELETE
    """)
    assert _derby_rows(derby_ctx) == {2: ("b", 20.0)}


def test_merge_jdbc_no_staging_litter(derby_ctx, spark):
    """After a successful merge the staging table is dropped."""
    spark.createDataFrame([(2, "x", 1.0)], ["id", "name", "amount"]
                          ).createOrReplaceTempView("jdbc_one")
    derby_ctx.sql("""
        MERGE INTO lightning.datasource.rdbms.mdb.accounts AS t
        USING (SELECT * FROM jdbc_one) AS s
        ON t.ID = s.id
        WHEN MATCHED THEN UPDATE SET NAME = s.name, AMOUNT = s.amount
    """)
    from lightning_metastore_spark.catalog.units import load_catalog_unit
    unit = load_catalog_unit(
        derby_ctx.metastore.load_datasource(["rdbms"], "mdb"))
    tables = unit.list_tables(spark, [])
    assert not [t for t in tables if "_stg_" in t.lower()], tables


def test_merge_conditional_clauses_file_table(ctx, spark):
    """r16: ordered conditional clauses on the plain file-table path —
    WHEN MATCHED AND c THEN UPDATE / WHEN MATCHED THEN DELETE picks
    the FIRST holding clause per row; NOT MATCHED AND c gates
    inserts."""
    spark.createDataFrame(
        [(1, "u1", 5.0), (2, "u2", 500.0), (9, "new", 1.0),
         (10, "skip", -1.0)],
        ["id", "name", "amount"]).createOrReplaceTempView("cond_src")
    ctx.sql("""
        MERGE INTO lightning.datasource.file.db.accounts AS t
        USING (SELECT * FROM cond_src) AS s
        ON t.id = s.id
        WHEN MATCHED AND s.amount > 100 THEN DELETE
        WHEN MATCHED THEN UPDATE SET name = s.name
        WHEN NOT MATCHED AND s.amount > 0 THEN INSERT *
    """)
    rows = _rows(ctx)
    assert 2 not in rows                       # deleted (500 > 100)
    assert rows[1][0] == "u1"                  # updated
    assert rows[9] == ("new", 1.0)             # inserted (amount > 0)
    assert 10 not in rows                      # insert gated out


def test_merge_conditional_clauses_unreachable(ctx, spark):
    """An unconditional clause before another clause of the same
    group is rejected at parse time."""
    from lightning_metastore_spark.parser.dispatcher import (
        CommandParseError,
        parse_command,
    )

    with pytest.raises(CommandParseError, match="unreachable"):
        parse_command("""
            MERGE INTO lightning.datasource.file.db.accounts AS t
            USING (SELECT 1 AS id) AS s
            ON t.id = s.id
            WHEN MATCHED THEN UPDATE SET name = 'x'
            WHEN MATCHED AND s.id = 1 THEN DELETE
        """)
    with pytest.raises(CommandParseError, match="unreachable"):
        parse_command("""
            MERGE INTO lightning.datasource.file.db.accounts AS t
            USING (SELECT 1 AS id) AS s
            ON t.id = s.id
            WHEN NOT MATCHED THEN INSERT *
            WHEN NOT MATCHED AND s.id = 1 THEN INSERT *
        """)


def test_merge_not_matched_by_source(ctx, spark):
    """r16: WHEN NOT MATCHED BY SOURCE claims TARGET rows with no
    source match — the one-statement sync shape (delete absentees,
    update the rest), delta-spark's extension."""
    spark.createDataFrame(
        [(1, "sync1", 11.0)],
        ["id", "name", "amount"]).createOrReplaceTempView("sync_src")
    ctx.sql("""
        MERGE INTO lightning.datasource.file.db.accounts AS t
        USING (SELECT * FROM sync_src) AS s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET name = s.name, amount = s.amount
        WHEN NOT MATCHED BY SOURCE AND t.amount < 25 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET name = 'stale'
    """)
    rows = _rows(ctx)
    # target started as {1:(a,10),2:(b,20),3:(c,30)}
    assert rows[1] == ("sync1", 11.0)     # matched -> updated
    assert 2 not in rows                  # absent + amount<25 -> gone
    assert rows[3][0] == "stale"          # absent, kept, flagged


def test_merge_insert_only_file_table_no_duplicates(ctx, spark):
    """r16 verdict #1 twin on the full-outer-join fallback path: an
    insert-only MERGE must not duplicate matched target rows, and a
    duplicate-key source is LEGAL with no matched clause (delta-spark
    parity) — each pass-through target row survives exactly once."""
    spark.createDataFrame(
        [(2, "dup1", 1.0), (2, "dup2", 2.0), (7, "g", 70.0)],
        ["id", "name", "amount"]).createOrReplaceTempView("ins_src")
    out = ctx.sql("""
        MERGE INTO lightning.datasource.file.db.accounts AS t
        USING (SELECT * FROM ins_src) AS s
        ON t.id = s.id
        WHEN NOT MATCHED THEN INSERT *
    """).collect()
    assert out[0].n_rows == 4
    assert _rows(ctx) == {1: ("a", 10.0), 2: ("b", 20.0),
                          3: ("c", 30.0), 7: ("g", 70.0)}


def test_merge_conditional_unclaimed_file_table(ctx, spark):
    """A matched row claimed by no (conditional) clause must pass
    through once and must NOT be re-inserted — fallback-path twin of
    the lakehouse pinned tests."""
    spark.createDataFrame(
        [(2, "b9", 99.0), (8, "h", 80.0)], ["id", "name", "amount"]
    ).createOrReplaceTempView("cond_src")
    out = ctx.sql("""
        MERGE INTO lightning.datasource.file.db.accounts AS t
        USING (SELECT * FROM cond_src) AS s
        ON t.id = s.id
        WHEN MATCHED AND s.amount > 1000 THEN UPDATE SET amount = s.amount
        WHEN NOT MATCHED THEN INSERT *
    """).collect()
    assert out[0].n_rows == 4
    assert _rows(ctx) == {1: ("a", 10.0), 2: ("b", 20.0),
                          3: ("c", 30.0), 8: ("h", 80.0)}
