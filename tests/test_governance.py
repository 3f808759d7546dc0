"""AccessControl enforcement + annotation-DQ with ${var} CTEs — the
reference parses both hints but never enforces/executes them
(optimizer rules commented out); ours work."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from lightning_metastore_spark.context import LightningContext  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402


def _setup(spark, tmp_path, user=None):
    ctx = LightningContext(spark, warehouse=str(tmp_path / "model"),
                           current_user=user)
    ctx.sql("CREATE NAMESPACE IF NOT EXISTS lightning.datasource.file")
    ctx.sql(f"REGISTER OR REPLACE PARQUET DATASOURCE tpch OPTIONS(path '{SF_DIR}') "
            f"NAMESPACE lightning.datasource.file")
    ctx.sql("CREATE NAMESPACE IF NOT EXISTS lightning.metastore.gov")
    ctx.sql("""COMPILE USL govmart DEPLOY NAMESPACE lightning.metastore.gov DDL
        @AccessControl(accessType=deny, users=mallory)
        @AccessControl(accessType=regex, users=analyst, columns=c_name)
        @DataQuality(name=bal_vs_avg, expression=c_acctbal > ${avg_bal} - 100000,
                     avg_bal=SELECT avg(c_acctbal) FROM lightning.datasource.file.tpch.customer)
        create table custview (c_custkey BIGINT primary key, c_name String,
                               c_acctbal double)""")
    ctx.sql("""ACTIVATE USL TABLE lightning.metastore.gov.govmart.custview AS
        SELECT c_custkey, c_name, c_acctbal
        FROM lightning.datasource.file.tpch.customer""")
    return ctx


def test_no_user_no_enforcement(spark, tmp_path):
    ctx = _setup(spark, tmp_path, user=None)
    rows = ctx.sql("SELECT * FROM lightning.metastore.gov.govmart.custview "
                   "LIMIT 5").collect()
    assert all(r.c_name is not None and r.c_name != "***" for r in rows)


def test_deny_user_blocked(spark, tmp_path):
    ctx = _setup(spark, tmp_path, user="mallory")
    with pytest.raises(Exception, match="access denied"):
        ctx.sql("SELECT * FROM lightning.metastore.gov.govmart.custview").collect()


def test_regex_masking_for_analyst(spark, tmp_path):
    ctx = _setup(spark, tmp_path, user="analyst")
    rows = ctx.sql("SELECT * FROM lightning.metastore.gov.govmart.custview "
                   "LIMIT 5").collect()
    assert all(r.c_name == "***" for r in rows)
    assert all(r.c_acctbal is not None for r in rows)  # other cols intact


def test_other_user_unaffected(spark, tmp_path):
    ctx = _setup(spark, tmp_path, user="bob")
    rows = ctx.sql("SELECT * FROM lightning.metastore.gov.govmart.custview "
                   "LIMIT 3").collect()
    assert all(r.c_name != "***" for r in rows)


def test_annotation_dq_with_cte_var(spark, tmp_path):
    ctx = _setup(spark, tmp_path)
    results = ctx.sql(
        "RUN DQ bal_vs_avg TABLE lightning.metastore.gov.govmart.custview"
    ).collect()
    assert len(results) == 1
    r = results[0]
    assert r.dq_name == "bal_vs_avg" and r.check_type == "Custom Data Quality"
    assert r.total == 150 and r.valid == 150 and r.invalid == 0
