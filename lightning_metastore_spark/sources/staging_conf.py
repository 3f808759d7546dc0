"""Reentrant guard for the parquet staging-write session conf.

Both offline lakehouse writers must stage timestamps as int64 micros
(`spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS`): Spark's
INT96 default writes no usable parquet min/max, which would silently
disable timestamp file skipping, and the Iceberg spec bans INT96
outright. The session conf is the only switch Spark exposes (the
DataFrameWriter option of the same name is ignored — verified on
Spark 4.1), so a plain set+restore races when independent writes are
overlapped from driver threads (guide §2.6): one thread's restore can
flip the conf back to INT96 while another thread's staging write is
still running. This guard makes the set/restore REENTRANT — the conf
is set on the first enter and restored to the pre-existing value only
when the last concurrent writer exits — so concurrent staging writes
are safe. All writers set the SAME value, so nesting order is
irrelevant.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

_TS_KEY = "spark.sql.parquet.outputTimestampType"
_lock = threading.Lock()
_depth = 0
_saved: str | None = None


@contextmanager
def staging_ts_micros(spark):
    """Hold `spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS`
    for the duration; safe under concurrent use from driver threads."""
    global _depth, _saved
    with _lock:
        if _depth == 0:
            _saved = spark.conf.get(_TS_KEY, None)
            spark.conf.set(_TS_KEY, "TIMESTAMP_MICROS")
        _depth += 1
    try:
        yield
    finally:
        with _lock:
            _depth -= 1
            if _depth == 0:
                if _saved is None:
                    spark.conf.unset(_TS_KEY)
                else:
                    spark.conf.set(_TS_KEY, _saved)
