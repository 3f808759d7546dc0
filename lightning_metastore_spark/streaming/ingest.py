"""Streaming corpus ingestion with incremental near-dup rejection.

The production shape of training-data collection: documents arrive
continuously; each micro-batch must be admitted or rejected against
everything already in the corpus WITHOUT rescanning the corpus. The
corpus is represented by its persisted dedup artifacts — the shingle
relation and the MinHash signature index (operators/dedup.py) — stored
as parquet under ``index_dir``:

    index_dir/shingles/batch=<id>/    (doc_id, shingle)
    index_dir/signatures/batch=<id>/  (doc_id, mh_0..mh_63)
    index_dir/spans/batch=<id>/       (gh, occ) — 5-token-window index
    index_dir/urls/batch=<id>/        (doc_id, canonical_url) —
                                      crawl-frontier visited set (opt-in)

Each micro-batch is admitted through up to six steps, all DataFrame
programs:
  0. (opt-in) benchmark decontamination against a STATIC Bloom
     artifact (map-only vectorized bitmap probe — eval-set text never
     enters the corpus; zero false negatives), and/or a STATIC
     reference-LM quality floor (the CCNet keep rule — junk never
     enters either), and/or crawl-frontier URL rejection against the
     index's growing visited set (canonical form, smallest id wins —
     a re-crawled page never reaches the text rejectors),
  1. exact intra-batch dedup (normalized-text hash, keep min id),
  2. near-dup intra-batch dedup (MinHash LSH pairs -> connected
     components -> keep min id per cluster — proper clustering, so a
     chain a~b~c keeps exactly one doc, not zero),
  3. incremental batch-vs-corpus rejection
     (dedup.incremental_minhash_pairs — the batch bucket list
     broadcasts against the corpus bucket index; O(batch), never
     O(corpus)).
Novel docs land in ``out_dir/batch=<id>`` and their shingles +
signatures append to the index under ``batch=<id>`` subdirs — the
idempotent-batch-directory pattern (events.start_idempotent_parquet_
sink): a batch replayed after a failure OVERWRITES its own directories
instead of duplicating, so the sink plus the checkpoint's offset
tracking give end-to-end exactly-once for both the corpus output and
the index.

Later batches read the index fresh per batch, so they dedup against
everything admitted before them — including earlier batches of the
same stream.

Reference parity note: the reference has no streaming operators
(SURVEY.md §2.7); this composes the driver-mandated extension surface.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lightning_metastore_spark.operators import dedup

_NUM_HASHES = 64
_SEED = 42


_SPAN_K = 5


def _artifacts(docs: DataFrame, id_col: str, text_col: str,
               url_col: str | None = None):
    sh = dedup.shingles(docs, text_col=text_col, id_col=id_col)
    sig = dedup.minhash_signatures(sh, _NUM_HASHES, id_col, _SEED)
    spans = dedup.span_index(docs, k=_SPAN_K, text_col=text_col,
                             id_col=id_col)
    urls = _url_artifact(docs, id_col, url_col) if url_col else None
    return sh, sig, spans, urls


def _url_artifact(docs: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """(id, canonical_url) for the admitted docs that HAVE a URL — the
    crawl-frontier visited set (functions/html.url_canonical_expr)."""
    from lightning_metastore_spark.functions.html import (
        url_canonical_expr)

    return (docs.select(
        F.col(id_col),
        url_canonical_expr(F.col(url_col)).alias("canonical_url"))
        .filter(F.col("canonical_url").isNotNull()))


def build_dedup_index(docs: DataFrame, index_dir: str,
                      id_col: str = "doc_id",
                      text_col: str = "text",
                      url_col: str | None = None) -> None:
    """Bootstrap the corpus index from an existing (already deduped)
    corpus. Call once; the streaming sink extends it per batch."""
    sh, sig, spans, urls = _artifacts(docs, id_col, text_col, url_col)
    _write_artifacts(index_dir, "init", sh, sig, spans, urls)


def _write_artifacts(index_dir: str, batch: str, sh, sig, spans, urls):
    """Write the per-batch artifact set. The four writes touch disjoint
    directories and share no ordering constraint, so they run from a
    small driver thread pool (guide §2.6) — serially each is a small
    driver-committed job that leaves the cluster idle between commits."""
    from concurrent.futures import ThreadPoolExecutor

    jobs = [(sh, "shingles"), (sig, "signatures"), (spans, "spans")]
    if urls is not None:
        jobs.append((urls, "urls"))

    def _write(df_art):
        df, art = df_art
        df.write.mode("overwrite").parquet(
            os.path.join(index_dir, art, f"batch={batch}"))

    with ThreadPoolExecutor(max_workers=3) as ex:
        for _ in ex.map(_write, jobs):
            pass


def _before_batch(df: DataFrame, batch_id) -> DataFrame:
    """Restrict an index read to partitions a batch's ORIGINAL run could
    have seen: the bootstrap/compacted partitions plus numeric batch ids
    STRICTLY BELOW its own. Micro-batch ids are monotonically
    increasing, so in normal operation this filter is a no-op; on a
    replay it restores the original index view exactly — the right
    contract for the span rejector, whose known-span FRACTION (unlike
    the near-dup relation) could otherwise drift upward as later
    batches commit spans that overlap without being near-dups."""
    if batch_id is None:
        return df
    b = F.col("batch").cast("string")
    return df.filter((~b.rlike("^[0-9]+$"))
                     | (b.cast("long") < F.lit(int(batch_id))))


def dedup_batch_against_index(spark: SparkSession, batch: DataFrame,
                              index_dir: str, threshold: float = 0.5,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              exclude_batch=None,
                              max_span_frac: float | None = None,
                              bloom_path: str | None = None,
                              bloom_threshold: float = 0.5,
                              ref_lm_path: str | None = None,
                              min_ref_logprob: float | None = None,
                              url_col: str | None = None,
                              use_gopher_rules: bool = False) -> DataFrame:
    """The per-batch admission decision (pure batch DataFrame program —
    also the test twin of the streaming sink): returns the NOVEL subset
    of ``batch`` after exact intra-batch, near-dup intra-batch,
    batch-vs-corpus near-dup rejection and (when ``max_span_frac`` is
    set) span-recycling rejection — a doc is ALSO rejected when more
    than that fraction of its 5-token windows already exist in the
    corpus span index (dedup.span_batch_against_index: a mostly-
    recycled page that is not NEAR-dup to any single corpus doc —
    e.g. stitched from many — still gets caught). The span probe is
    broadcast-only: O(batch) against the (gh, occ) index, the corpus
    itself untouched.

    ``exclude_batch``: index partition to IGNORE — a REPLAYED batch
    (foreachBatch is at-least-once) finds its own artifacts already in
    the index and would reject itself, replacing its output with an
    empty directory; excluding its own partition makes the replay
    reproduce the original decision exactly. The span index applies
    the STRONGER strictly-before-me visibility rule (``_before_batch``)
    because span fractions are frequency-like, not an equivalence-like
    relation — see _before_batch's docstring.

    ``bloom_path`` (opt-in): reject docs whose word-n-gram overlap with
    a saved benchmark Bloom artifact (operators/contamination.py —
    ``build_ngram_bloom`` + ``save_ngram_bloom``) reaches
    ``bloom_threshold`` — decontamination AT ingestion, so eval-set
    text never enters the corpus in the first place. Unlike the other
    three rejectors the artifact is STATIC (it does not grow with the
    corpus), so the decision is a pure function of the doc text and
    needs no batch-visibility rule: replays are trivially stable. Zero
    false negatives by construction (a truly contaminated doc can
    never be admitted); over-rejection is bounded by the filter's FP
    rate.

    ``ref_lm_path`` + ``min_ref_logprob`` (opt-in): the CCNet quality
    floor AT ingestion — reject docs scoring below the floor under a
    saved reference-LM artifact (operators/lm_filter — bigram or
    order-n Kneser-Ney, layout auto-detected), so junk
    never enters the corpus. Like the Bloom rejector the artifact is
    STATIC: the decision is a pure function of the doc text, needs no
    batch-visibility rule, and replays are trivially stable. Docs with
    no score (<2 tokens) are ADMITTED by this stage — absence of LM
    evidence is not junk evidence (the same neutral-default contract
    as curate_corpus's ref stage).

    ``url_col`` (opt-in): crawl-frontier URL rejection — the batch is
    deduped on the canonical URL form (functions/html, smallest id
    wins intra-batch) and docs whose canonical URL is already in the
    index's visited set are rejected BEFORE any text is shingled (a
    re-crawled page with edited chrome never reaches the text
    rejectors). URL-presence is an equivalence-like relation, so the
    ``exclude_batch`` visibility rule suffices (the span-style
    strictly-before rule is not needed); NULL-URL docs pass — no URL
    evidence is not duplicate evidence.

    ``use_gopher_rules`` (opt-in): the Gopher document quality rules
    (functions/text.gopher_quality_rules, published thresholds) as the
    CHEAPEST text rejector — pure whole-stage-codegen expressions with
    no artifact at all, sequenced right after URL rejection so
    rule-failing pages never reach the bitmap/LM/shingle passes.
    Stateless and static like the Bloom/LM rejectors: replays are
    trivially stable."""
    if (ref_lm_path is None) != (min_ref_logprob is None):
        raise ValueError("ref_lm_path and min_ref_logprob must be set "
                         "together (one without the other would "
                         "silently skip the reference-LM rejector)")

    # 0. crawl-frontier URL rejection FIRST: a one-column string
    # canonicalization — a re-crawled page never reaches the n-gram /
    # LM / shingle passes (the module contract)
    if url_col is not None:
        from lightning_metastore_spark.functions.html import (
            url_canonical_expr, url_survivors)

        # intra-batch: smallest id per canonical URL survives (the one
        # shared keep-rule implementation, functions/html)
        losers = (url_survivors(batch, url_col, id_col)
                  .filter(~F.col("url_survivor")).select(id_col))
        batch = batch.join(losers, id_col, "left_anti")
        # batch-vs-corpus: reject already-visited canonical URLs
        url_root = os.path.join(index_dir, "urls")
        if os.path.isdir(url_root):
            visited = spark.read.parquet(url_root)
            if exclude_batch is not None:
                visited = visited.filter(
                    F.col("batch") != F.lit(str(exclude_batch)))
            nn = (batch.select(
                      F.col(id_col),
                      url_canonical_expr(F.col(url_col)).alias("__cu"))
                  .filter(F.col("__cu").isNotNull()))
            hit = (nn.join(visited.select(
                       F.col("canonical_url").alias("__cu")), "__cu")
                   .select(id_col).distinct())
            batch = batch.join(hit, id_col, "left_anti")

    # 0a. Gopher quality rules: pure codegen expressions, zero state —
    # the cheapest text rejector runs before anything that builds
    # n-grams or probes an artifact
    if use_gopher_rules:
        from lightning_metastore_spark.functions.text import (
            gopher_quality_rules)

        bad = (gopher_quality_rules(batch, text_col, id_col)
               .filter(~F.col("gopher_keep")).select(id_col))
        batch = batch.join(bad, id_col, "left_anti")

    # 0b. benchmark decontamination: a map-only vectorized bitmap probe
    # — the cheapest rejector runs FIRST so the heavier LSH/CC steps
    # see a smaller batch
    if bloom_path is not None:
        from lightning_metastore_spark.operators.contamination import (
            bloom_contamination, load_ngram_bloom)

        bloom = load_ngram_bloom(spark, bloom_path)
        flags = bloom_contamination(batch, bloom,
                                    flag_threshold=bloom_threshold,
                                    text_col=text_col, id_col=id_col)
        batch = batch.join(
            flags.filter(~F.col("is_contaminated")).select(id_col), id_col)

    # 0c. reference-LM quality floor: one batch-sized bigram pass
    # against the static artifact — scored-below-floor docs leave
    # before the heavier LSH/CC steps (left-anti keeps no-score docs)
    if ref_lm_path is not None and min_ref_logprob is not None:
        from lightning_metastore_spark.operators.lm_filter import (
            score_with_reference_lm)

        junk = (score_with_reference_lm(batch, ref_lm_path,
                                        text_col=text_col, id_col=id_col)
                .filter(F.col("avg_logprob") < F.lit(float(min_ref_logprob)))
                .select(id_col))
        batch = batch.join(junk, id_col, "left_anti")

    # Materialize the surviving batch ONCE before the heavy LSH/CC
    # section: that section references the batch relation from many
    # subtrees (signature build, banding self-join, the CC size probe +
    # edge collect, both incremental join sides), and
    # connected_components runs driver actions mid-plan — without a
    # checkpoint every one of those re-plans and re-executes the whole
    # rejector chain above (guide §3.3: materialising an intermediate
    # truncates the plan). The batch is micro-batch-sized by contract,
    # so the materialization is trivially small; this is the sink's
    # per-batch steady-state overhead at scale, not just a local win.
    batch = batch.localCheckpoint(eager=True)

    # 1. exact intra-batch: keep the smallest id per normalized text
    exact = dedup.exact_dedup(batch, text_col, id_col)
    b = batch.join(exact.select(id_col), id_col)

    # 2. near-dup intra-batch: LSH pairs -> CC -> keep min id per cluster
    pairs = dedup.minhash_lsh_pairs(b, threshold, _NUM_HASHES,
                                    text_col=text_col, id_col=id_col,
                                    seed=_SEED)
    clusters = dedup.connected_components(pairs, b, id_col=id_col)
    keep = (clusters.groupBy("cluster_id")
            .agg(F.min(id_col).alias(id_col)).select(id_col))
    b = b.join(keep, id_col)

    # 3. batch-vs-corpus: reject anything near-dup to an indexed doc
    # (partition discovery exposes the batch=<id> dirs as a `batch` col)
    corpus_sh = spark.read.parquet(os.path.join(index_dir, "shingles"))
    corpus_sig = spark.read.parquet(os.path.join(index_dir, "signatures"))
    if exclude_batch is not None:
        corpus_sh = corpus_sh.filter(
            F.col("batch") != F.lit(str(exclude_batch)))
        corpus_sig = corpus_sig.filter(
            F.col("batch") != F.lit(str(exclude_batch)))
    hits = dedup.incremental_minhash_pairs(
        b, corpus_sh.select(id_col, "shingle"),
        corpus_sig.select(id_col, *[f"mh_{i}" for i in range(_NUM_HASHES)]),
        threshold, _NUM_HASHES, id_col=id_col, text_col=text_col,
        seed=_SEED)
    b = b.join(hits.select(F.col("batch_id").alias(id_col)).distinct(),
               id_col, "left_anti")

    # 4. span recycling vs corpus: reject docs whose k-token windows are
    # mostly already-indexed (opt-in; see docstring)
    span_root = os.path.join(index_dir, "spans")
    if max_span_frac is not None and os.path.isdir(span_root):
        span_idx = _before_batch(spark.read.parquet(span_root),
                                 exclude_batch)
        admit = dedup.span_batch_against_index(
            b, span_idx.groupBy("gh").agg(F.sum("occ").alias("occ")),
            k=_SPAN_K, max_dup_frac=max_span_frac,
            text_col=text_col, id_col=id_col)
        b = b.join(admit.filter(F.col("admit")).select(id_col), id_col)
    return b


def compact_dedup_index(spark: SparkSession, index_dir: str) -> None:
    """Offline index maintenance: merge the accumulated ``batch=<id>``
    dirs (the streaming sink adds one per micro-batch — the classic
    streaming small-file problem) into a single compacted partition per
    artifact. Run while the stream is STOPPED; restarting from the same
    checkpoint is safe — committed batches never replay, and integer
    micro-batch ids never collide with the ``compacted`` partition
    name. At 100 TB this is the standard offline compaction job any
    streaming table sink schedules; here the swap is a local
    write-aside + rename."""
    import shutil

    for art in ("shingles", "signatures", "spans", "urls"):
        root = os.path.join(index_dir, art)
        if not os.path.isdir(root):   # index bootstrapped pre-spans
            continue
        df = spark.read.parquet(root).drop("batch")
        if art == "spans":
            # occurrence counts are additive across batch partitions —
            # compaction must re-aggregate, not merely concatenate
            df = df.groupBy("gh").agg(F.sum("occ").alias("occ"))
        tmp = os.path.join(index_dir, f"_{art}_compacting")
        # materialize the merged artifact BEFORE touching the source dirs
        df.write.mode("overwrite").parquet(
            os.path.join(tmp, "batch=compacted"))
        shutil.rmtree(root)
        os.rename(tmp, root)


def ingest_micro_batch(spark: SparkSession, batch_df: DataFrame,
                       batch_id: int, index_dir: str, out_dir: str,
                       threshold: float = 0.5, id_col: str = "doc_id",
                       text_col: str = "text",
                       max_span_frac: float | None = None,
                       bloom_path: str | None = None,
                       bloom_threshold: float = 0.5,
                       ref_lm_path: str | None = None,
                       min_ref_logprob: float | None = None,
                       url_col: str | None = None,
                       use_gopher_rules: bool = False) -> None:
    """The sink's per-batch body (module-level so tests can drive the
    REAL production path with explicit batch ids and replay order):
    admit the batch against the index excluding its own partition,
    then idempotently overwrite its output + artifact directories.

    Replay stability under interleaving: a batch replayed AFTER later
    batches committed sees MORE index than its original run — but only
    docs the later batches ADMITTED are indexed, and anything in a
    later batch that near-duped this batch's admitted docs was itself
    rejected (never indexed). So the extra partitions cannot reject
    this batch's admitted docs, and the replay reproduces the original
    decisions exactly (test_ingest pins this)."""
    novel = dedup_batch_against_index(
        spark, batch_df, index_dir, threshold, id_col, text_col,
        exclude_batch=batch_id, max_span_frac=max_span_frac,
        bloom_path=bloom_path, bloom_threshold=bloom_threshold,
        ref_lm_path=ref_lm_path, min_ref_logprob=min_ref_logprob,
        url_col=url_col, use_gopher_rules=use_gopher_rules)
    # cut the triple-branch plan once: novel feeds docs-out AND every
    # artifact write; each write would otherwise recompute the
    # whole dedup pipeline (4x the batch cost)
    novel = novel.localCheckpoint(eager=True)
    novel.write.mode("overwrite").parquet(
        os.path.join(out_dir, f"batch={batch_id}"))
    sh, sig, spans, urls = _artifacts(novel, id_col, text_col, url_col)
    _write_artifacts(index_dir, str(batch_id), sh, sig, spans, urls)


def start_dedup_ingest_sink(stream_docs: DataFrame, index_dir: str,
                            out_dir: str, checkpoint: str,
                            threshold: float = 0.5,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            max_span_frac: float | None = None,
                            bloom_path: str | None = None,
                            bloom_threshold: float = 0.5,
                            ref_lm_path: str | None = None,
                            min_ref_logprob: float | None = None,
                            url_col: str | None = None,
                            use_gopher_rules: bool = False):
    """Start the ingestion sink over a streaming docs DataFrame.
    Returns the StreamingQuery handle; the caller owns stop().

    ``build_dedup_index`` must have run for ``index_dir`` first (the
    index read requires at least the bootstrap batch).
    ``max_span_frac`` (optional) additionally rejects docs whose
    k-token windows are more than that fraction already-indexed — the
    exact-substring recycling rejector. ``bloom_path`` (optional)
    rejects benchmark-contaminated docs against a saved Bloom artifact
    — the fourth, static rejector. ``ref_lm_path`` +
    ``min_ref_logprob`` (optional) reject below-floor docs under a
    saved reference-LM artifact — the fifth, also static rejector.
    ``use_gopher_rules`` (optional) rejects pages failing the Gopher
    document quality rules — the sixth rejector, stateless codegen
    (see dedup_batch_against_index)."""
    spark = stream_docs.sparkSession

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        ingest_micro_batch(spark, batch_df, batch_id, index_dir, out_dir,
                           threshold, id_col, text_col, max_span_frac,
                           bloom_path, bloom_threshold,
                           ref_lm_path, min_ref_logprob, url_col,
                           use_gopher_rules)

    return (stream_docs.writeStream
            .foreachBatch(_ingest)
            .option("checkpointLocation", checkpoint)
            .start())
