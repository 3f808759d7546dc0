"""Single-slot persist registry for library operators.

A library operator that persists an intermediate relation cannot
unpersist it before returning (the caller consumes the result lazily),
but persisting unconditionally leaks one CacheManager entry per CALL —
fatal for long-running servers (RUN PIPELINE / REST). The compromise:
each (operator, slot) keeps exactly ONE persisted relation; the next
call through the same slot releases the previous one. A caller still
holding the prior result just recomputes — correctness is unaffected,
and cache growth is bounded by the number of operator slots, not the
number of calls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SLOTS: dict[tuple[str, str], DataFrame] = {}


def persist_slot(tag: str, df: DataFrame) -> DataFrame:
    """Persist ``df``, releasing whatever this slot persisted before
    (scoped per Spark application — a new app never unpersists through
    a dead session's handle)."""
    app_id = df.sparkSession.sparkContext.applicationId
    key = (app_id, tag)
    for k in [k for k in _SLOTS if k[0] != app_id]:
        del _SLOTS[k]
    prev = _SLOTS.get(key)
    if prev is not None:
        try:
            prev.unpersist(blocking=False)
        except Exception:
            pass
    out = df.persist()
    _SLOTS[key] = out
    return out
