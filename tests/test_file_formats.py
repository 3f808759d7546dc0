"""File-format coverage (RegisterFileDataSourceTestSuite analogue):
the taxis fixture (FIXTURES.md §4) registered and queried per format."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from lightning_metastore_spark.context import LightningContext  # noqa: E402

TAXIS = [(1, 1000371, 1.8, 15.32, "N"), (2, 1000372, 2.5, 22.15, "N"),
         (2, 1000373, 0.9, 9.01, "N"), (1, 1000374, 8.4, 42.13, "Y")]
COLS = ["vendor_id", "trip_id", "trip_distance", "fare_amount",
        "store_and_fwd_flag"]


def _taxis(spark):
    return spark.createDataFrame(TAXIS, COLS)


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv", "avro"])
def test_register_and_query_format(spark, tmp_path, fmt):
    src = tmp_path / "src"
    src.mkdir()
    writer = _taxis(spark).coalesce(1).write
    if fmt == "csv":
        writer = writer.option("header", "true")
    try:
        writer.format(fmt).save(str(src / f"taxis.{fmt}"))
    except Exception as e:
        if fmt == "avro" and "AVRO" in str(e).upper():
            # no spark-avro on this session: the pure-Python fallback
            # writes the fixture and the catalog read below exercises
            # the no-jar read path (sources/avro_table.py)
            from lightning_metastore_spark.sources.avro_table import write_avro
            write_avro(_taxis(spark).coalesce(1),
                       str(src / "taxis.avro"), mode="error")
        else:
            raise
    ctx = LightningContext(spark, warehouse=str(tmp_path / "model"))
    ctx.sql("CREATE NAMESPACE lightning.datasource.file")
    ctx.sql(f"REGISTER {fmt.upper()} DATASOURCE src OPTIONS(path '{src}') "
            f"NAMESPACE lightning.datasource.file")
    rows = ctx.sql("""
        SELECT vendor_id, count(*) AS n,
               CAST(SUM(CAST(ROUND(fare_amount * 100) AS BIGINT)) AS DOUBLE) / 100
                 AS total_fare
        FROM lightning.datasource.file.src.taxis
        GROUP BY vendor_id ORDER BY vendor_id
    """).collect()
    assert [(r.vendor_id, r.n) for r in rows] == [(1, 2), (2, 2)]
    assert abs(rows[0].total_fare - 57.45) < 1e-9
