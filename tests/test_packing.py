"""Sequence-packing operator tests."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from lightning_metastore_spark.operators.packing import packed_offsets  # noqa: E402


def test_packed_offsets_micro(spark):
    # token counts: 3, 4, 2, 5 -> cum 3, 7, 9, 14; capacity 4
    df = spark.createDataFrame([
        (10, "a b c"),
        (20, "d e f g"),
        (30, "h i"),
        (40, "j k l m n"),
    ], ["doc_id", "text"])
    out = {r.doc_id: r for r in packed_offsets(df, capacity=4).collect()}
    assert (out[10].start_offset, out[10].end_offset) == (0, 3)
    assert (out[10].first_chunk, out[10].last_chunk, out[10].n_chunks) == (0, 0, 1)
    # doc 20 spans tokens 3..6 -> chunks 0 and 1
    assert (out[20].first_chunk, out[20].last_chunk, out[20].n_chunks) == (0, 1, 2)
    assert (out[30].start_offset, out[30].end_offset) == (7, 9)
    # doc 40 spans tokens 9..13 -> chunks 2 and 3
    assert (out[40].first_chunk, out[40].last_chunk, out[40].n_chunks) == (2, 3, 2)


def test_packed_offsets_matches_single_partition_window(spark):
    """The two-phase prefix sum must equal the naive global window for
    every block count (blocks only change parallelism, never results)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = packed_offsets(docs, capacity=512, n_blocks=1).orderBy("doc_id").collect()
    b = packed_offsets(docs, capacity=512, n_blocks=64).orderBy("doc_id").collect()
    assert a == b
    total = sum(r.n_tokens for r in a)
    assert a[-1].end_offset == total


def test_packed_offsets_empty_input(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert packed_offsets(df).count() == 0


def test_packed_offsets_sparse_ids_stay_balanced(spark):
    """Snowflake-style sparse ids (drawn from a 2^40 space, heavily
    clumped) must still spread across blocks — id-arithmetic blocking
    collapsed them into a few blocks, re-serializing the prefix sum —
    and offsets must equal the naive single-partition window."""
    import random

    rng = random.Random(7)
    # two dense clumps + a long sparse tail, worst case for id*n/max
    ids = sorted(set(
        [rng.randrange(2**39, 2**39 + 50_000) for _ in range(400)]
        + [rng.randrange(2**40 - 50_000, 2**40) for _ in range(400)]
        + [rng.randrange(0, 2**40) for _ in range(200)]))
    docs = spark.createDataFrame(
        [(i, "tok " * rng.randrange(1, 30)) for i in ids],
        "doc_id long, text string")
    n_blocks = 16
    out = packed_offsets(docs, capacity=256, n_blocks=n_blocks)
    naive = packed_offsets(docs, capacity=256, n_blocks=1)
    assert out.orderBy("doc_id").collect() == naive.orderBy("doc_id").collect()
    # block occupancy: recompute the block key the operator uses
    tc = docs.selectExpr("doc_id")
    probs = [i / n_blocks for i in range(1, n_blocks)]
    bounds = sorted(set(tc.approxQuantile("doc_id", probs,
                                          1.0 / (4 * n_blocks))))
    occupied = {sum(1 for b in bounds if i > b) for i in ids}
    assert len(occupied) >= n_blocks // 2


def test_greedy_pack_bins_invariants(spark):
    """FFD packing: every doc placed once, shared bins never exceed
    capacity, oversized docs sit alone, per-shard bin count respects
    the FFD 11/9*OPT+1 bound, and bin_fill/bin_n_docs are consistent."""
    from lightning_metastore_spark.operators.packing import greedy_pack_bins
    import random

    rng = random.Random(11)
    rows = [(i, "t " * rng.randint(0, 300)) for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cap = 256
    out = greedy_pack_bins(docs, capacity=cap, n_shards=4).collect()
    assert sorted(r.doc_id for r in out) == list(range(400))

    by_bin = {}
    for r in out:
        by_bin.setdefault(r.bin_id, []).append(r)
    for rs in by_bin.values():
        fill = sum(r.n_tokens for r in rs)
        assert all(r.bin_fill == fill for r in rs)
        assert all(r.bin_n_docs == len(rs) for r in rs)
        if len(rs) > 1:
            assert fill <= cap
        else:
            assert fill <= cap or rs[0].n_tokens >= cap  # oversized alone

    # FFD quality per shard: bins <= 11/9 * ceil(total/cap) + 1
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.bin_id >> 40, []).append(r)
    for rs in by_shard.values():
        small = [r for r in rs if r.n_tokens < cap]
        bins = {r.bin_id for r in small}
        lb = -(-sum(r.n_tokens for r in small) // cap)
        assert len(bins) <= 11 * lb / 9 + 1


def test_greedy_pack_bins_partitioning_invariant(spark):
    """Output is identical no matter how the input is partitioned —
    shard assignment is a pure id hash, placement order is sorted."""
    from lightning_metastore_spark.operators.packing import greedy_pack_bins

    rows = [(i, "w " * (i % 97)) for i in range(200)]
    docs1 = spark.createDataFrame(rows, "doc_id long, text string")
    docs2 = docs1.repartition(13)
    a = sorted(map(tuple, greedy_pack_bins(docs1, 128, 3).collect()))
    b = sorted(map(tuple, greedy_pack_bins(docs2, 128, 3).collect()))
    assert a == b
