"""Skew-mitigation utilities for hot-key joins and aggregations.

AQE's skew-join splitting (enabled in session.get_spark) handles most
cases at runtime; these helpers cover the cases AQE can't: broadcast-
ineligible dimension joins against power-law keys, and two-phase
aggregation when a handful of group keys dominate.

- ``salted_join``: replicate the small side ``salt`` times, spray the
  large side's rows of each key across salt buckets, join on
  (keys + salt). Hot keys fan out over ``salt`` tasks instead of one.
- ``two_phase_agg``: partial aggregate on (keys + salt) first, then
  final aggregate on keys — the hot key's rows combine in ``salt``
  parallel partials before the single final group.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(large: DataFrame, small: DataFrame, keys: Sequence[str],
                salt: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join where ``large`` has skewed key frequencies and
    ``small`` is too big to broadcast. Replication cost: |small| * salt
    shuffle rows — pick salt ~ (hot-key rows / target task rows).

    Only inner/left(+semi) joins are sound: right/full outer would emit
    the small side's salt replicas as separate null-padded rows."""
    if how.replace("_", "").lower() not in ("inner", "left", "leftouter",
                                            "leftsemi"):
        raise ValueError(
            f"salted_join supports inner/left/left_semi joins, got {how!r}")
    salted_large = large.withColumn(
        SALT_COL, F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int"))
    salted_small = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    out = salted_large.join(salted_small, [*keys, SALT_COL], how)
    return out.drop(SALT_COL)


def two_phase_agg(df: DataFrame, keys: Sequence[str],
                  aggs: dict[str, str], salt: int = 16) -> DataFrame:
    """Skew-safe aggregation for algebraic functions (sum/count/min/max):
    aggregate on (keys, salt) then reduce partials on keys.

    ``aggs``: output column -> 'fn(input)' with fn in sum|count|min|max.
    (Spark's hash agg already does map-side partials; this adds an
    extra REDUCE level so a single hot key's partials also parallelize
    across the first shuffle.)
    """
    _MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first: list[Column] = []
    second: list[Column] = []
    for out, spec in aggs.items():
        fn, _, arg = spec.partition("(")
        fn = fn.strip().lower()
        arg = arg.rstrip(")").strip()
        if fn not in _MERGE:
            raise ValueError(f"two_phase_agg supports sum/count/min/max, got {fn}")
        partial = (F.count(F.lit(1)) if fn == "count" and arg in ("*", "1")
                   else getattr(F, fn)(arg))
        first.append(partial.alias(f"__p_{out}"))
        second.append(_MERGE[fn](f"__p_{out}").alias(out))
    salted = df.withColumn(
        SALT_COL, F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int"))
    return (salted.groupBy(*keys, SALT_COL).agg(*first)
            .groupBy(*keys).agg(*second))
