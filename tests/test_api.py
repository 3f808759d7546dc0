"""REST API tests (EP3): POST /api/q streaming JSON + DQ record
endpoints, driven over real HTTP."""

from __future__ import annotations

import json
import sys
import urllib.request

import pytest

sys.path.insert(0, "/root/repo")

from lightning_metastore_spark.api import LightningAPIServer  # noqa: E402
from lightning_metastore_spark.context import LightningContext  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402


@pytest.fixture()
def server(spark, tmp_path):
    ctx = LightningContext(spark, warehouse=str(tmp_path / "model"))
    ctx.sql("CREATE NAMESPACE lightning.datasource.file")
    ctx.sql(f"REGISTER PARQUET DATASOURCE tpch OPTIONS(path '{SF_DIR}') "
            f"NAMESPACE lightning.datasource.file")
    srv = LightningAPIServer(ctx).start()
    yield srv
    srv.stop()


def _post_q(srv, query):
    req = urllib.request.Request(
        f"http://{srv.host}:{srv.port}/api/q",
        data=json.dumps({"query": query}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req) as resp:
        return resp.status, json.loads(resp.read())


def test_api_query(server):
    status, rows = _post_q(server, """
        SELECT o_orderpriority, count(*) AS n
        FROM lightning.datasource.file.tpch.orders
        GROUP BY 1 ORDER BY 1""")
    assert status == 200 and len(rows) == 5
    assert rows[0]["o_orderpriority"] == "1-URGENT" and rows[0]["n"] > 0


def test_api_encodes_timestamps_and_binaries(server):
    status, rows = _post_q(server, """
        SELECT o_orderdate, CAST('ab' AS BINARY) AS b
        FROM lightning.datasource.file.tpch.orders LIMIT 1""")
    assert status == 200
    assert rows[0]["o_orderdate"].startswith(("199", "200"))
    assert rows[0]["b"] == "YWI="  # base64


def test_api_ddl_roundtrip(server):
    status, _ = _post_q(
        server, "SHOW NAMESPACES OR TABLES IN lightning.datasource.file")
    assert status == 200


def test_api_edq_full_export(server):
    """/api/edq streams the full (unlimited) DQ record set."""
    _post_q(server, "CREATE NAMESPACE lightning.metastore.apicrm")
    _post_q(server, "COMPILE USL m DEPLOY NAMESPACE lightning.metastore.apicrm "
                    "DDL create table o (o_orderkey BIGINT primary key, "
                    "o_totalprice double)")
    _post_q(server, "ACTIVATE USL TABLE lightning.metastore.apicrm.m.o AS "
                    "SELECT o_orderkey, o_totalprice FROM "
                    "lightning.datasource.file.tpch.orders")
    _post_q(server, "REGISTER DQ cheap TABLE lightning.metastore.apicrm.m.o "
                    "AS o_totalprice < 5000")
    url = (f"http://{server.host}:{server.port}/api/edq"
           f"?name=cheap&table=lightning.metastore.apicrm.m.o&validity=valid")
    with urllib.request.urlopen(url) as resp:
        rows = json.loads(resp.read())
    assert len(rows) > 0
    assert all(r["o_totalprice"] < 5000 for r in rows)


def test_api_errors(server):
    req = urllib.request.Request(
        f"http://{server.host}:{server.port}/api/q",
        data=json.dumps({"query": "SELECT * FROM missing_table"}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e2:
        urllib.request.urlopen(
            f"http://{server.host}:{server.port}/api/nope")
    assert e2.value.code == 404


def test_api_runtime_error_clean_400(server):
    """A query that passes analysis but fails at execution must yield a
    clean 400: the server pulls the first row BEFORE sending the status
    line, so lazy-evaluation failures don't corrupt a 200 reply."""
    req = urllib.request.Request(
        f"http://{server.host}:{server.port}/api/q",
        data=json.dumps({"query": """
            SELECT assert_true(o_orderkey < 0) AS x
            FROM lightning.datasource.file.tpch.orders"""}).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
