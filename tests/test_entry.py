"""Driver-contract smoke tests: entry() runs, queries()/oracle_sql() are
consistent, and a correctness spot-check vs DuckDB at sf0.001."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as ep  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402


def test_entry_runs(spark):
    df = ep.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["n_name", "revenue"]


def test_registry_consistency():
    qs = ep.queries()
    oracles = ep.oracle_sql()
    assert len(qs) >= 25
    # the driver checks exactly the first 50 registry entries — every
    # entry must fit under that cap so none escapes the hard gate
    assert len(qs) <= 50
    # every oracle key must be a declared query
    assert set(oracles) <= set(qs)
    # every slot carries a full DuckDB oracle since r6 (approximate
    # operators are hash-gated through deterministic verdict columns)
    rows_only = set(qs) - set(oracles)
    assert rows_only == set()


def test_spot_correctness_vs_duckdb(spark):
    """Run three representative queries against the DuckDB oracle —
    the full sweep lives in tools/check_correctness.py."""
    import duckdb

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer", "documents", "embeddings"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    qs, oracles = ep.queries(), ep.oracle_sql()
    for name in ("q1_pricing_summary", "dedup_neardup_suite", "dq_suite"):
        sdf = qs[name](spark, SF_DIR)
        srows = sorted([tuple(map(str, r)) for r in sdf.collect()])
        orows = sorted([tuple(map(str, r)) for r in con.sql(oracles[name]).fetchall()])
        assert len(srows) == len(orows), name
        assert srows == orows, name
