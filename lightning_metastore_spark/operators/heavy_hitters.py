"""Heavy hitters (frequent items) with bounded memory and EXACT output.

Finding all items with frequency >= s*N by plain groupBy-count needs
memory proportional to the DISTINCT item count — unbounded for token
streams. This module uses the classic two-step sketch-then-verify
discipline (the same shape as the LSH -> exact-verify dedup paths):

1. CANDIDATES: a Space-Saving summary of ``ceil(1/s)`` counters runs
   inside every partition (Metwally et al., public algorithm). By
   pigeonhole, any item with global frequency >= s*N has local
   frequency >= s*n_p in at least one partition, and Space-Saving with
   1/s counters never evicts an item whose local share exceeds s — so
   the union of partial summaries contains EVERY truly frequent item.
   Memory per task: 1/s counters, independent of cardinality.
2. VERIFY: the candidate set (<= partitions/s rows, tiny) broadcasts
   back; one filtered aggregation computes candidates' EXACT counts,
   and the s*N threshold keeps only the true heavy hitters.

The output is therefore exact and deterministic — the sketch only
bounds memory, it never decides the answer — which is what lets the
gate hash-verify against a plain SQL frequency oracle.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(items: DataFrame, s: float = 0.02,
                  item_col: str = "item") -> DataFrame:
    """All items with frequency >= ``s`` * N, with exact counts:
    ``(rank, item, cnt, frac)`` ranked by (count DESC, item ASC).

    ``items`` is a one-column-of-interest relation (explode tokens /
    urls / domains upstream). 100 TB shape: one map-only sketch pass
    (1/s counters per task), a tiny DISTINCT on candidates, one
    broadcast-filtered exact aggregation, one TakeOrdered on the
    result (bounded by 1/s rows).
    """
    if not 0.0 < s < 1.0:
        raise ValueError("heavy_hitters: s must be in (0, 1)")
    capacity = int(1.0 / s) + 1

    from lightning_metastore_spark.operators._cache import persist_slot

    # the item stream (typically an exploded tokenization) feeds the
    # sketch pass, the total count AND the exact verify — persist it
    # once (single-slot) so the upstream fan-out runs a single time
    items = persist_slot("heavy_hitters.items", items)

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: dict = {}
        for pdf in batches:
            for v in pdf[item_col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < capacity:
                    counters[v] = 1
                else:
                    # space-saving eviction: replace the minimum,
                    # inheriting its count (overestimates, never loses
                    # a locally-frequent item)
                    mk = min(counters, key=lambda k: (counters[k], str(k)))
                    counters[v] = counters.pop(mk) + 1
        yield pd.DataFrame({item_col: list(counters.keys())})

    cands = (items.mapInPandas(
        sketch, schema=f"{item_col} {items.schema[item_col].dataType.simpleString()}")
        .distinct())
    total = items.count()
    threshold = s * total
    exact = (items.join(F.broadcast(cands), item_col)
             .groupBy(item_col)
             .agg(F.count(F.lit(1)).alias("cnt"))
             .filter(F.col("cnt") >= threshold))
    from pyspark.sql.window import Window as W

    top = exact.orderBy(F.desc("cnt"), F.asc(item_col)).limit(capacity)
    w = W.orderBy(F.desc("cnt"), F.asc(item_col))
    return (top.withColumn("rank", F.row_number().over(w))
            .select("rank", item_col, F.col("cnt").cast("long").alias("cnt"),
                    F.round(F.col("cnt") / F.lit(float(total)), 9)
                    .alias("frac")))
