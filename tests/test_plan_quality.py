"""Physical-plan quality guards: the optimizations we rely on at 100 TB
must be visible in the plan — filter pushdown into parquet scans,
broadcast joins for dims, partial aggregation, top-k without full sort.
A regression here is a performance bug even when results stay correct."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from lightning_metastore_spark.plans.queries import (  # noqa: E402
    q1_pricing_summary,
    q3_shipping_priority,
    q5_local_supplier_revenue,
    q7_volume_shipping,
    q10_returned_items,
)

from tests.conftest import SF_DIR  # noqa: E402


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _hint_lines(df) -> list[str]:
    """Join-hint lines surviving into the optimized logical plan —
    each is a forced strategy that OVERRIDES AQE's size check."""
    return [ln.strip() for ln in
            df._jdf.queryExecution().optimizedPlan().toString().splitlines()
            if "Hint=(strategy=broadcast" in ln]


def test_q1_filter_pushdown_and_partial_agg(spark):
    plan = _plan(q1_pricing_summary(spark, SF_DIR))
    assert "PushedFilters" in plan and "l_shipdate" in plan
    assert "partial_sum" in plan  # map-side combine before the shuffle
    # projection pruned to the 7 needed columns, not the full table
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]


def test_q3_aqe_decides_customer_join_and_topk(spark):
    """Broadcast policy: customer scales with the facts (2.5 TB at the
    100 TB target — past the 8 GB BroadcastExchange hard limit), so q3
    must NOT force-broadcast it: zero hints survive to the optimized
    plan, and AQE's size check (not a pin) picks broadcast at this
    scale. A forced hint here is a job-killing regression at scale."""
    df = q3_shipping_priority(spark, SF_DIR)
    assert _hint_lines(df) == []           # nothing forced
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan     # size-based choice at gate sf
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # pushed to scan
    assert "TakeOrderedAndProject" in plan  # top-k, no global sort


def test_q5_hints_only_on_fixed_dims(spark):
    """Only the fixed-cardinality dims (region=5, nation=25 rows) may
    carry explicit broadcast hints; supplier/customer joins must be
    AQE-decided (they still broadcast at this scale by size)."""
    df = q5_local_supplier_revenue(spark, SF_DIR)
    hints = _hint_lines(df)
    assert len(hints) == 2
    assert any("r_regionkey" in h for h in hints)   # region into nation
    assert any("n_nationkey" in h for h in hints)   # nation into supplier
    assert not any("c_custkey" in h or "s_suppkey" in h for h in hints)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 3     # size-based at gate sf
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_q7_q10_no_forced_fact_proportional_broadcasts(spark):
    """q7: hints only on the two 25-row nation dims; q10: only on
    nation. customer/supplier joins are AQE-decided everywhere."""
    q7 = q7_volume_shipping(spark, SF_DIR)
    h7 = _hint_lines(q7)
    assert len(h7) == 2 and all("s_nk" in h or "c_nk" in h for h in h7)
    q10 = q10_returned_items(spark, SF_DIR)
    h10 = _hint_lines(q10)
    assert len(h10) == 1 and "n_nationkey" in h10[0]


def test_q10_returnflag_pushdown(spark):
    plan = _plan(q10_returned_items(spark, SF_DIR))
    assert "EqualTo(l_returnflag,R)" in plan
    assert "TakeOrderedAndProject" in plan


def test_resolver_preserves_pushdown(spark, tmp_path):
    """Filters must push through the resolver's temp views into the
    underlying parquet scan (the whole point of rewriting instead of
    materializing)."""
    from lightning_metastore_spark.context import LightningContext

    ctx = LightningContext(spark, warehouse=str(tmp_path / "model"))
    ctx.sql("CREATE NAMESPACE IF NOT EXISTS lightning.datasource.file")
    ctx.sql(f"REGISTER OR REPLACE PARQUET DATASOURCE t OPTIONS(path '{SF_DIR}') "
            f"NAMESPACE lightning.datasource.file")
    df = ctx.sql("""
        SELECT o_orderkey FROM lightning.datasource.file.t.orders
        WHERE o_orderpriority = '1-URGENT'""")
    plan = _plan(df)
    assert "EqualTo(o_orderpriority,1-URGENT)" in plan
    assert "ReadSchema: struct<o_orderkey:bigint" in plan  # column pruning


def test_contamination_benchmark_is_broadcast(spark):
    """The benchmark n-gram set must reach the membership join as a
    broadcast — at 100 TB the corpus side must never shuffle for it."""
    from pyspark.sql import functions as F
    from lightning_metastore_spark.operators.contamination import (
        contamination_overlap)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(contamination_overlap(
        docs.filter(F.col("doc_id") % 25 != 0),
        docs.filter(F.col("doc_id") % 25 == 0)))
    assert "BroadcastHashJoin" in plan


def test_quantize_scales_are_broadcast(spark):
    """Per-dimension scales (width-sized) broadcast onto the exploded
    value stream; the only shuffles are the dim agg and the per-vector
    agg."""
    from lightning_metastore_spark.operators.quantization import (
        scalar_quantize_stats)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = _plan(scalar_quantize_stats(emb))
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan  # map-side combine on the vec agg


def test_neardup_verify_counts_broadcast(spark):
    """The dedup verify paths must join per-doc shingle counts onto the
    (possibly multi-million-row) candidate stream via BROADCAST when the
    caller passes the gate-scale counts relation — shuffling candidates
    twice just to learn set sizes was ~30% of simhash verify time."""
    from pyspark.sql import functions as F
    from lightning_metastore_spark.operators import dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sh = dedup.shingles(docs)
    counts = dedup._shingle_counts(sh, "doc_id")
    plan = _plan(dedup.minhash_lsh_pairs(
        docs, threshold=0.5, sh=sh, counts=F.broadcast(counts)))
    assert "BroadcastHashJoin" in plan


def test_incremental_dedup_batch_broadcasts(spark):
    """Incremental batch-vs-corpus dedup: the batch bucket list must
    broadcast against the corpus bucket index — the corpus side never
    shuffles for candidate generation."""
    from pyspark.sql import functions as F
    from lightning_metastore_spark.operators import dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    is_batch = F.col("doc_id") % 10 == 0
    sh = dedup.shingles(docs)
    sig = dedup.minhash_signatures(sh)
    plan = _plan(dedup.incremental_minhash_pairs(
        docs.filter(is_batch), sh.filter(~is_batch), sig.filter(~is_batch)))
    assert "BroadcastHashJoin" in plan


def test_classifier_weights_broadcast(spark):
    """Model inference must be map-only + broadcast join + one partial-
    aggregated doc agg — the weight table (the model) never shuffles
    the token stream."""
    from lightning_metastore_spark.functions.text import classifier_score

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = _plan(classifier_score(docs))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_" in plan  # map-side combine on the doc agg


def test_packing_window_is_partitioned(spark):
    """The prefix-sum window must be partitioned on the block key — a
    single-partition global window would serialize the corpus."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from lightning_metastore_spark.operators.packing import packed_offsets

    plan = _plan(packed_offsets(docs, n_blocks=8))
    # the Window's exchange must hash-partition on the block key; a
    # global window would show Exchange SinglePartition instead
    assert "Window" in plan
    assert "hashpartitioning(blk" in plan
    assert "SinglePartition" not in plan


def test_semantic_dedup_is_bucket_keyed(spark):
    """SemDeDup's candidate generation must be bucket-KEYED (one
    Arrow-batched GEMM per bucket group — never a cartesian/nested-loop
    all-pairs join), with the hyperplane bucketing fully map-only
    (inlined sign literals, no join/shuffle before the bucket group)."""
    from lightning_metastore_spark.operators.dedup import semantic_dedup

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plan = _plan(semantic_dedup(emb))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FlatMapGroupsInPandas" in plan  # per-bucket GEMM
    assert "hashpartitioning(bucket" in plan  # pair fan-out keyed on bucket


def test_pagerank_has_no_cartesian_and_partial_agg(spark):
    """The power iteration must stay a keyed join + partial-aggregated
    sum: the only nested-loop joins allowed are the 1-row broadcast of
    the scalar N (BroadcastNestedLoopJoin over a single-row aggregate),
    never a CartesianProduct over data."""
    from lightning_metastore_spark.operators.graph import pagerank

    edges = spark.range(200).selectExpr("id AS src", "(id + 1) % 200 AS dst")
    plan = _plan(pagerank(edges, n_iter=2))
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan          # map-side combine of contribs
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row N broadcast


def test_funnel_joins_stay_on_user_key(spark):
    """Every data join in the funnel chains on user_id — no other join
    key and no cartesian join over per-user data (only the single-row
    stage-total broadcasts are nested-loop)."""
    import datetime as dt

    from lightning_metastore_spark.operators.temporal import funnel_counts

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i % 50, t0 + dt.timedelta(minutes=i), e)
            for i, e in enumerate(["view", "click", "purchase"] * 100)]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    plan = _plan(funnel_counts(df, ("view", "click", "purchase")))
    assert "CartesianProduct" not in plan
    joins = [ln for ln in plan.splitlines()
             if "SortMergeJoin" in ln or "BroadcastHashJoin" in ln
             or "ShuffledHashJoin" in ln]
    assert joins, "expected keyed joins in the funnel plan"
    assert all("u#" in ln or "u " in ln for ln in joins), joins


def test_phrase_search_filters_before_join(spark):
    """The posting-list isin filter must apply BEFORE the position
    join — the join inputs are term-filtered streams, never the full
    token explosion of both sides."""
    from lightning_metastore_spark.functions.text import phrase_search

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta " * 5) for i in range(50)],
        ["doc_id", "text"])
    plan = _plan(phrase_search(docs, "alpha beta"))
    assert "CartesianProduct" not in plan
    # each join input carries the term equality filter below the join
    assert plan.count("= alpha") >= 1 and plan.count("= beta") >= 1


def test_cdc_dup_stats_shuffles_hashes_not_text(spark):
    """The CDC dup profile's exchanges carry chunk hashes and counts —
    the normalized document text must never reach a shuffle."""
    from lightning_metastore_spark.operators.dedup import cdc_dup_stats

    docs = spark.createDataFrame(
        [(i, "some text body here repeated words " * 3) for i in range(20)],
        ["doc_id", "text"])
    plan = _plan(cdc_dup_stats(docs))
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "_text" not in ln, ln


def test_dup_spans_shuffles_hash_not_span_text(spark):
    """corpus_dup_spans' occurrence agg and rejoin key on xxhash64 of
    the span (8-byte key) — the raw k-token span STRING must never be
    a shuffle key (same hash-not-text discipline as cdc_dup_stats)."""
    from lightning_metastore_spark.operators.dedup import corpus_dup_spans

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta " * 4)
         for i in range(20)],
        ["doc_id", "text"])
    plan = _plan(corpus_dup_spans(docs, k=5))
    assert "xxhash64" in plan
    exchanges = [ln for ln in plan.splitlines()
                 if "Exchange hashpartitioning" in ln]
    assert exchanges
    # shuffle keys are the hash column (gh) or doc_id — never the
    # span text column g
    for ln in exchanges:
        assert "g#" not in ln, ln


def test_remove_dup_spans_shuffles_hash_not_span_text(spark):
    """The removal operator inherits the scorer's hash-not-text
    discipline: every exchange keys on the xxhash64 column or the doc
    id — never the span text."""
    from lightning_metastore_spark.operators.dedup import remove_dup_spans

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma delta epsilon zeta " * 4)
         for i in range(20)],
        ["doc_id", "text"])
    plan = _plan(remove_dup_spans(docs, k=5))
    assert "xxhash64" in plan
    for ln in plan.splitlines():
        if "Exchange hashpartitioning" in ln:
            assert "g#" not in ln, ln


def test_bloom_contamination_is_joinless(spark):
    """The Bloom membership test must be map-only + one per-doc agg:
    the corpus never joins (or shuffles) against the benchmark — that
    is the operator's entire reason to exist."""
    from lightning_metastore_spark.operators.contamination import (
        bloom_contamination, build_ngram_bloom)

    bench = spark.createDataFrame(
        [(1, "some benchmark text here now")], ["doc_id", "text"])
    docs = spark.createDataFrame(
        [(i, f"training doc {i} words go here") for i in range(20)],
        ["doc_id", "text"])
    bloom = build_ngram_bloom(bench, n=3, n_bits=1 << 12)
    plan = _plan(bloom_contamination(docs, bloom))
    for node in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                 "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert node not in plan, node
    # exactly two exchanges: the shingle distinct (the operator's
    # documented per-doc-distinct semantics) and the per-doc agg —
    # nothing benchmark-sized ever shuffles
    assert plan.count("Exchange hashpartitioning") == 2


def test_sessionize_single_user_shuffle(spark):
    """Batch sessionization is ONE shuffle on the user key: the window
    chain and the session aggregation reuse the same partitioning."""
    import datetime as dt

    from lightning_metastore_spark.operators.temporal import sessionize

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i % 7, t0 + dt.timedelta(minutes=i * 3)) for i in range(100)],
        ["user_id", "ts"])
    plan = _plan(sessionize(df))
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln]
    assert len(exchanges) == 1, exchanges
    assert "user_id" in exchanges[0]


def test_span_admission_broadcasts_batch_not_corpus(spark):
    """Incremental span admission must broadcast the BATCH's distinct
    hashes into the index join (O(batch) regardless of corpus size) —
    no sort-merge/shuffled join against the index and no cartesian."""
    from lightning_metastore_spark.operators.dedup import (
        span_batch_against_index, span_index)

    corpus = spark.createDataFrame(
        [(i, f"corpus doc {i} alpha beta gamma delta") for i in range(50)],
        ["doc_id", "text"])
    batch = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"])
    idx = span_index(corpus, k=4)
    plan = _plan(span_batch_against_index(batch, idx, k=4))
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # the index side is probed by a broadcast of batch hashes — the
    # index never sort-merge-joins (which would shuffle it)
    assert "SortMergeJoin" not in plan


def test_budget_select_window_is_partitioned(spark):
    """budget_select's cumulative window must be partitioned on the
    block key (a single-partition ORDER BY score window would push the
    whole corpus through one task — the exact shape the blocked prefix
    sum exists to avoid), and the token count must be map-only."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from lightning_metastore_spark.operators.sampling import budget_select

    plan = _plan(budget_select(docs, budget_tokens=10000,
                               score_col="n_chars", n_blocks=8))
    assert "Window" in plan
    assert "hashpartitioning(block" in plan
    assert "SinglePartition" not in plan


def test_temperature_resample_is_broadcast_only(spark):
    """The corpus scan must stay map-only: the per-group weight table
    and the scalar totals reach it as broadcasts — no shuffle of the
    docs for the join, no SortMergeJoin anywhere."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from lightning_metastore_spark.operators.sampling import (
        temperature_resample)

    plan = _plan(temperature_resample(docs, tau=0.5))
    assert plan.count("BroadcastExchange") >= 2   # weights + totals
    assert "SortMergeJoin" not in plan
    # the only lang-keyed exchange feeds the counts AGGREGATE and is
    # map-side combined first (group rows shuffle, never the corpus)
    assert "partial_count" in plan


def test_dsir_scoring_broadcasts_ratio_table(spark):
    """DSIR's scoring pass must broadcast the KB-sized log-ratio table
    onto the token stream (never shuffle the corpus on the bucket key)
    and select via TakeOrdered, not a global sort."""
    from lightning_metastore_spark.operators.sampling import dsir_select

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(100)
    target = docs.filter("doc_id % 10 = 0")
    plan = _plan(dsir_select(docs, target, n=10, n_buckets=64))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_lm_score_broadcasts_unigrams_joins_bigrams_on_key(spark,
                                                          tmp_path):
    """lm_score must broadcast only the vocabulary-sized unigram table;
    the corpus-sized bigram counts join on the bigram key (a shuffle
    join is CORRECT there — broadcasting it would die at web scale)."""
    from lightning_metastore_spark.operators.lm_filter import (
        score_with_bigram_lm, train_bigram_lm)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(80)
    p = str(tmp_path / "lm_plan")
    train_bigram_lm(docs.filter("doc_id % 3 = 0"), p)
    plan = _plan(score_with_bigram_lm(docs, p))
    assert "BroadcastHashJoin" in plan      # the two unigram sides
    assert "partial_" in plan               # map-side combine on doc agg


def test_lm_score_shares_one_unigram_broadcast(spark, tmp_path):
    """r11 watch item #1: the prev-side and next-side unigram joins
    must share ONE BroadcastExchange (the second side is a
    ReusedExchange), not broadcast the vocabulary twice. Pinned on the
    EXECUTED plan — AQE reuses the materialized broadcast stage."""
    from lightning_metastore_spark.operators.lm_filter import (
        score_with_bigram_lm, train_bigram_lm)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(80)
    p = str(tmp_path / "lm_reuse")
    train_bigram_lm(docs.filter("doc_id % 3 = 0"), p)
    df = score_with_bigram_lm(docs, p)
    df.collect()
    final = _plan(df).split("== Initial Plan ==")[0]
    assert "ReusedExchange" in final


def test_kn_score_broadcasts_only_vocab_sized_tables(spark, tmp_path):
    """KN scoring joins the top-order and middle-order count tables on
    their n-gram keys (shuffle-join is CORRECT there at web scale — no
    forced broadcast hints), while the two vocabulary-sized relations
    (continuation unigrams o1, bigram contexts ctx1) are hinted
    broadcast. Pin: exactly 2 broadcast hints survive to the optimized
    plan, and the doc aggregate keeps map-side combine."""
    from lightning_metastore_spark.operators.lm_filter import (
        score_with_kn_lm, train_kn_lm)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(80)
    p = str(tmp_path / "kn_plan")
    train_kn_lm(docs.filter("doc_id % 3 = 0"), p, order=3)
    df = score_with_kn_lm(docs, p)
    assert len(_hint_lines(df)) == 2
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "partial_" in plan


def test_html_extract_and_corpus_diff_shapes(spark):
    """html_extract stays a single map-only projection; corpus_diff's
    full-outer join must shuffle only the (id, fp, count) projection —
    the text column cannot appear in any Exchange."""
    from lightning_metastore_spark.functions.html import html_extract
    from lightning_metastore_spark.operators.pipeline import corpus_diff

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    plan = _plan(html_extract(docs))
    assert "Exchange" not in plan and "BatchEvalPython" not in plan

    dplan = _plan(corpus_diff(docs, docs))
    for ln in dplan.splitlines():
        if "Exchange" in ln:
            assert "text" not in ln, ln


def test_url_canonicalize_is_map_only(spark):
    """URL canonicalization composes with scans: no Exchange, no
    Python in the plan; url_dedup adds exactly the one canonical-key
    hash aggregation (partial+final => Exchanges only on the key)."""
    from lightning_metastore_spark.functions.html import (
        url_canonicalize, url_dedup)

    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .filter("doc_id < 50")          # limit() would inject its
            .withColumnRenamed("source", "url"))  # own SinglePartition
    plan = _plan(url_canonicalize(docs))
    assert "Exchange" not in plan and "BatchEvalPython" not in plan

    dplan = _plan(url_dedup(docs))
    assert "BatchEvalPython" not in dplan
    for ln in dplan.splitlines():
        if "Exchange" in ln:
            assert "canonical_url" in ln, ln


def test_perplexity_buckets_single_group_shuffle(spark):
    """The bucket window shuffles ONCE on the group key — no extra
    global sort, no Python."""
    from lightning_metastore_spark.operators.lm_filter import (
        perplexity_buckets)

    scored = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
              .filter("doc_id < 80")
              .selectExpr("doc_id", "lang",
                          "CAST(n_chars AS DOUBLE) AS avg_logprob"))
    plan = _plan(perplexity_buckets(scored))
    assert "BatchEvalPython" not in plan
    exchanges = [ln for ln in plan.splitlines() if "Exchange" in ln
                 and "Reused" not in ln]
    assert len(exchanges) == 1, exchanges
    assert "lang" in exchanges[0]


def test_table_stats_approx_has_no_expand(spark):
    """The documented claim: approx mode is one scan with mergeable
    HLL sketches (no Expand operator); exact mode pays the Expand.
    Probed on the pre-aggregation plan the operator builds."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    cols = ["lang", "source"]

    def agg_plan(exact):
        ndv = F.count_distinct if exact else F.approx_count_distinct
        aggs = [F.count(F.lit(1)).alias("n")]
        for c in cols:
            aggs.append(ndv(F.col(c)).alias(f"d_{c}"))
        return _plan(docs.agg(*aggs))

    assert "Expand" not in agg_plan(exact=False)
    assert "Expand" in agg_plan(exact=True)


def test_offline_delta_and_iceberg_preserve_pushdown(spark, tmp_path):
    """The offline lakehouse readers end in plain Spark parquet scans,
    so predicate pushdown and column pruning must reach the files —
    at 100 TB the log/manifest layer is planning metadata only."""
    from lightning_metastore_spark.sources.delta_reader import (
        read_delta,
        write_delta,
    )

    dpath = str(tmp_path / "dtab")
    write_delta(
        spark.range(100).selectExpr("id", "CAST(id AS STRING) AS s",
                                    "id * 2 AS v"),
        dpath, mode="error")
    plan = _plan(read_delta(spark, dpath)
                 .filter("id = 7").select("id", "v"))
    assert "EqualTo(id,7)" in plan                   # pushed to parquet
    assert "ReadSchema: struct<id:bigint,v:bigint>" in plan  # pruned
    # the position-delete anti-join path stays JVM-native: no Python
    # eval nodes anywhere in the offline read plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    # deletion vectors: the row path stays a broadcast LEFT ANTI join
    # on _metadata (decode happens in the small descriptor-side RDD,
    # never per data row) and pushdown still reaches the parquet scan
    import json as _json
    import os as _os
    import struct as _struct
    import uuid as _uuid
    import zlib as _zlib

    from lightning_metastore_spark.sources.delta_reader import (
        resolve_snapshot,
    )

    rel = resolve_snapshot(spark, dpath).files[0][0]
    data = (_struct.pack("<i", 1681511377) + _struct.pack("<q", 1)
            + _struct.pack("<I", 0)
            + _struct.pack("<I", 12346) + _struct.pack("<I", 1)
            + _struct.pack("<HH", 0, 0) + _struct.pack("<I", 16)
            + _struct.pack("<H", 0))  # row index 0 of the first file
    u = _uuid.uuid4()
    with open(_os.path.join(dpath, f"deletion_vector_{u}.bin"),
              "wb") as fh:
        fh.write(b"\x01" + _struct.pack(">i", len(data)) + data
                 + _struct.pack(">I", _zlib.crc32(data) & 0xFFFFFFFF))
    _Z85 = ("0123456789abcdefghijklmnopqrstuvwxyz"
            "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")
    enc = []
    b = u.bytes
    for i in range(0, 16, 4):
        v = int.from_bytes(b[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85[v % 85])
            v //= 85
        enc.extend(reversed(chunk))
    desc = {"storageType": "u", "pathOrInlineDv": "".join(enc),
            "offset": 1, "sizeInBytes": len(data), "cardinality": 1}
    with open(_os.path.join(dpath, "_delta_log",
                            f"{1:020d}.json"), "w") as fh:
        fh.write(_json.dumps({"add": {
            "path": rel, "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": False,
            "deletionVector": desc}}) + "\n")
    dv_df = read_delta(spark, dpath).filter("id > 50")
    dv_plan = _plan(dv_df)
    assert "LeftAnti" in dv_plan
    assert "BroadcastHashJoin" in dv_plan or "BroadcastNestedLoop" \
        not in dv_plan and "LeftAnti" in dv_plan
    assert "GreaterThan(id,50)" in dv_plan           # pushdown survives
    assert dv_df.count() == 49                       # deleted row is <= 50
    assert read_delta(spark, dpath).count() == 99    # one row deleted


def test_mine_hard_negatives_broadcasts_pairs_only(spark):
    """The supervision relation (pairs ⋈ both embedding sides) must
    reach the scoring join as a broadcast; the corpus side must carry
    no exchange before that join — at 100 TB only the k-bounded scored
    tuples may shuffle (for the ranking window)."""
    from pyspark.sql import functions as F2

    from lightning_metastore_spark.operators.retrieval import (
        mine_hard_negatives,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pairs = (emb.filter("vec_id % 50 = 0")
             .select(F2.col("vec_id").alias("query_id"),
                     (F2.col("vec_id") + 1).alias("positive_id")))
    plan = _plan(mine_hard_negatives(emb, pairs, k=3, margin=0.02))
    assert "BroadcastExchange" in plan
    # exactly one shuffle: the ranking window's hashpartitioning on
    # query_id — nothing repartitions the corpus scan itself
    import re
    shuffles = re.findall(r"Exchange hashpartitioning\(([^,]+)", plan)
    assert shuffles and all(s.startswith("query_id") for s in shuffles), \
        shuffles
