"""End-to-end ts-encoding contract (VERDICT r6 #7): the driver has
shipped events.parquet under different physical timestamp encodings
across builds — TIMESTAMP(NANOS)/TIMESTAMP(MICROS), adjusted-to-UTC
(LTZ) or not (reads as NTZ without the infer conf). BOTH readers
(session.load_tables and streaming.read_event_stream) must normalize
every encoding to identical session-TZ micro-precision timestamps.
"""

from __future__ import annotations

import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, "/root/repo")

from lightning_metastore_spark.session import load_tables  # noqa: E402
from lightning_metastore_spark.streaming import events as sev  # noqa: E402

# base instant 2024-03-01T00:00:00.123456Z plus i seconds; nanos add
# sub-micro digits that every reader must truncate identically
_BASE_US = 1_709_251_200_123_456
N_ROWS = 5

ENCODINGS = {
    "nanos_utc": pa.timestamp("ns", tz="UTC"),
    "nanos_naive": pa.timestamp("ns"),
    "micros_utc": pa.timestamp("us", tz="UTC"),      # reads as LTZ
    "micros_naive": pa.timestamp("us"),              # reads as NTZ
}


def _write_events(path, arrow_type):
    unit = arrow_type.unit
    mult = 1_000 if unit == "ns" else 1
    extra = 789 if unit == "ns" else 0  # sub-micro digits to truncate
    ts = pa.array([(_BASE_US + i * 1_000_000) * mult + extra
                   for i in range(N_ROWS)], type=arrow_type)
    table = pa.table({
        "event_id": pa.array(range(N_ROWS), type=pa.int64()),
        "ts": ts,
        "user_id": pa.array([i % 2 for i in range(N_ROWS)], type=pa.int64()),
        "event_type": pa.array(["click"] * N_ROWS),
        "value": pa.array([float(i) for i in range(N_ROWS)]),
        "props": pa.array(["{}"] * N_ROWS),
    })
    pq.write_table(table, path)


_EXPECTED = [(_BASE_US + i * 1_000_000) for i in range(N_ROWS)]


@pytest.mark.parametrize("enc", sorted(ENCODINGS))
def test_load_tables_normalizes_encoding(spark, tmp_path, enc):
    d = tmp_path / enc
    d.mkdir()
    _write_events(str(d / "events.parquet"), ENCODINGS[enc])
    df = load_tables(spark, str(d), ("events",))["events"]
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [r.us for r in
           df.selectExpr("unix_micros(ts) AS us").orderBy("us").collect()]
    assert got == _EXPECTED, enc


@pytest.mark.parametrize("enc", sorted(ENCODINGS))
def test_read_event_stream_normalizes_encoding(spark, tmp_path, enc):
    d = tmp_path / f"stream_{enc}"
    d.mkdir()
    _write_events(str(d / "part-0.parquet"), ENCODINGS[enc])
    stream = sev.read_event_stream(spark, str(d))
    assert dict(stream.dtypes)["ts"] == "timestamp"
    sev.run_to_memory(
        stream.selectExpr("unix_micros(ts) AS us"),
        f"ts_enc_{enc}", output_mode="append")
    got = sorted(r.us for r in
                 spark.sql(f"SELECT us FROM ts_enc_{enc}").collect())
    assert got == _EXPECTED, enc
