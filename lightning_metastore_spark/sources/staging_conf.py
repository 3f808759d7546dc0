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

The depth counter and saved value are tracked PER SparkSession: the
conf being guarded is session-scoped, so a module-global counter would
let a second session piggyback on the first session's depth and never
have its own conf set (silently staging INT96), and the final restore
could land on the wrong session. Entries are keyed by the session
object itself and removed on last-exit, so a stopped session's entry
does not outlive its last writer.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

_TS_KEY = "spark.sql.parquet.outputTimestampType"
_lock = threading.Lock()
# SparkSession -> [depth, saved_value]; guarded by _lock
_state: dict = {}


@contextmanager
def staging_ts_micros(spark):
    """Hold `spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS`
    for the duration; safe under concurrent use from driver threads,
    independently per SparkSession."""
    with _lock:
        st = _state.get(spark)
        if st is None:
            st = [0, spark.conf.get(_TS_KEY, None)]
            _state[spark] = st
            spark.conf.set(_TS_KEY, "TIMESTAMP_MICROS")
        st[0] += 1
    try:
        yield
    finally:
        with _lock:
            st[0] -= 1
            if st[0] == 0:
                _state.pop(spark, None)
                if st[1] is None:
                    spark.conf.unset(_TS_KEY)
                else:
                    spark.conf.set(_TS_KEY, st[1])
