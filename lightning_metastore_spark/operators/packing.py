"""Sequence packing for training-data pipelines.

Pre-training dataloaders concatenate the token stream in a fixed
document order and cut it into fixed-capacity windows ("concat and
chunk"). The batch-side job is to compute, for every document, its
global token offset and which chunks it lands in — a global prefix sum
over a total order.

Scale design (100 TB): a naive ``SUM() OVER (ORDER BY id)`` window has
no PARTITION BY, so Spark plans it as a SINGLE partition — the whole
corpus through one task. This module implements the classic two-phase
distributed prefix sum instead: documents are range-bucketed by a
monotone block key, per-block token sums are aggregated (a
blocks-sized relation), the tiny block-sum list is prefix-summed on
the driver and broadcast back, and the final cumulative offset is an
intra-block window (partitioned — parallel) plus the block's base
offset. Identical results to the single-partition window at any block
count.

Reference parity note: the reference has no packing operators
(SURVEY.md §2.7); part of the driver-mandated LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def packed_offsets(docs: DataFrame, capacity: int = 2048,
                   n_blocks: int = 64, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Per-document packing offsets under concat-and-chunk:
    (doc_id, n_tokens, start_offset, end_offset, first_chunk,
    last_chunk, n_chunks).

    The token stream is ordered by ``id_col``; ``capacity`` is the chunk
    (context-window) length. ``first_chunk``/``last_chunk`` are the
    chunk indexes containing the document's first and last token —
    documents straddle chunk boundaries, n_chunks = how many windows the
    document touches (input for straddle-loss accounting).

    Two shuffles: the per-block aggregate and the intra-block window.
    The block key is the count of range boundaries below the id, with
    boundaries from ``approxQuantile`` — monotone in id (so blocks tile
    the global order; ANY monotone blocking yields identical offsets)
    and BALANCED under any id distribution, including sparse
    snowflake-style id spaces where the earlier
    floor(id * n_blocks / max_id) arithmetic collapsed most rows into
    few blocks and re-serialized the prefix sum. Per-block sums
    (``<= n_blocks`` rows) prefix-sum on the driver.
    """
    tc = docs.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(F.coalesce(F.col(text_col), F.lit("")),
                                    F.lit(r"(\S+)"), 1))
        .alias("n_tokens"))
    # four consumers follow (max-id probe, quantile sketch, block sums,
    # final window); materialize the 16-byte-per-doc relation once so
    # the corpus is scanned+tokenized once, not four times
    tc = tc.localCheckpoint(eager=True)

    max_id = tc.agg(F.max(id_col)).first()[0]
    if max_id is None:
        return tc.select(
            F.col(id_col), F.col("n_tokens").cast("long"),
            F.lit(0).cast("long").alias("start_offset"),
            F.lit(0).cast("long").alias("end_offset"),
            F.lit(0).cast("long").alias("first_chunk"),
            F.lit(0).cast("long").alias("last_chunk"),
            F.lit(0).cast("long").alias("n_chunks"))
    probs = [i / n_blocks for i in range(1, n_blocks)]
    bounds = sorted(set(
        tc.approxQuantile(id_col, probs, 1.0 / (4 * n_blocks)))) \
        if probs else []
    blk = F.lit(0)
    for b in bounds:
        blk = blk + F.when(F.col(id_col) > F.lit(b), 1).otherwise(0)
    tcb = tc.select("*", blk.cast("long").alias("blk"))

    block_sums = (tcb.groupBy("blk").agg(F.sum("n_tokens").alias("s"))
                  .orderBy("blk").collect())
    base, offsets = 0, {}
    for r in block_sums:
        offsets[r["blk"]] = base
        base += r["s"]
    base_df = tcb.sparkSession.createDataFrame(
        [(int(b), int(o)) for b, o in offsets.items()], "blk long, base long")

    w = W.partitionBy("blk").orderBy(id_col).rowsBetween(
        W.unboundedPreceding, W.currentRow)
    cum = (tcb.join(F.broadcast(base_df), "blk")
           .withColumn("end_offset", F.sum("n_tokens").over(w) + F.col("base")))
    start = F.col("end_offset") - F.col("n_tokens")
    first_chunk = F.floor(start / capacity)
    last_chunk = F.floor((F.col("end_offset") - 1) / capacity)
    return cum.select(
        F.col(id_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        start.cast("long").alias("start_offset"),
        F.col("end_offset").cast("long").alias("end_offset"),
        first_chunk.cast("long").alias("first_chunk"),
        F.greatest(last_chunk, first_chunk).cast("long").alias("last_chunk"),
        (F.greatest(last_chunk, first_chunk) - first_chunk + 1)
        .cast("long").alias("n_chunks"))


def greedy_pack_bins(docs: DataFrame, capacity: int = 2048,
                     n_shards: int = 32, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Padding-minimizing sequence packing: first-fit-decreasing (FFD)
    bin packing of whole documents into fixed-``capacity`` bins — the
    alternative to concat-and-chunk (``packed_offsets``) when documents
    must NOT straddle context windows (no cross-doc attention, no
    truncated tails). Returns one row per document:
    ``(doc_id, n_tokens, bin_id, bin_fill, bin_n_docs)``.

    Distribution: exact FFD is inherently sequential (every placement
    depends on all previous bins), so the corpus is hash-sharded into
    ``n_shards`` independent groups and FFD runs per shard inside one
    Arrow-batched ``applyInPandas`` — the standard production
    compromise (pack per data shard; padding overhead stays within the
    FFD 11/9*OPT+1 bound PER SHARD, and shards are statistically
    similar under hash assignment). bin_id is globally unique
    (shard * 2^40 + local bin). Docs longer than ``capacity`` get a
    dedicated single-doc bin, truncation left to the caller.

    100 TB shape: one map pass for lengths + ONE shuffle on the shard
    key; each shard's state is its open-bin fill list (tiny). Shards
    scale horizontally — n_shards should track cluster parallelism,
    not corpus size; rows per shard are bounded by executor memory per
    task (stream-friendly: only lengths + ids cross into Python).
    Deterministic: placement order is (n_tokens DESC, doc_id) within a
    shard; shard assignment is a hash of the id.
    """
    import pandas as pd

    tc = docs.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(F.coalesce(F.col(text_col), F.lit("")),
                                    F.lit(r"(\S+)"), 1))
        .alias("n_tokens"),
        F.pmod(F.hash(F.col(id_col)), F.lit(n_shards)).alias("shard"))

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["n_tokens", id_col],
                              ascending=[False, True], kind="mergesort")
        shard = int(pdf["shard"].iloc[0])
        fills: list[int] = []      # open-bin fill levels, index = local bin
        bin_of, n_of = [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            placed = None
            if n < capacity:       # oversized docs never share a bin
                for i, f in enumerate(fills):
                    if f + n <= capacity:
                        placed = i
                        break
            if placed is None:
                placed = len(fills)
                fills.append(0)
            fills[placed] += n
            bin_of.append(placed)
        counts: dict[int, int] = {}
        for b in bin_of:
            counts[b] = counts.get(b, 0) + 1
        return pd.DataFrame({
            id_col: pdf[id_col].to_numpy(),
            "n_tokens": pdf["n_tokens"].to_numpy(),
            "bin_id": [shard * (1 << 40) + b for b in bin_of],
            "bin_fill": [fills[b] for b in bin_of],
            "bin_n_docs": [counts[b] for b in bin_of],
        })

    return (tc.groupBy("shard")
            .applyInPandas(pack_shard,
                           f"{id_col} long, n_tokens long, bin_id long, "
                           "bin_fill long, bin_n_docs long"))
