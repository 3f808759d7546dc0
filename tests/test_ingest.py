"""Streaming incremental-dedup ingestion tests (streaming/ingest.py):
micro-batches admitted against the persisted corpus index, exactly-once
output + index extension, replay safety."""

from __future__ import annotations

import os
import time
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from lightning_metastore_spark.streaming import ingest  # noqa: E402


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _write_file(path, rows):
    """One parquet FILE (not a Spark output dir) — the streaming file
    source lists non-recursively."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows])}), path)


BASE = ("the quick brown fox jumps over the lazy dog and then "
        "runs far away into the deep dark woods tonight again")
OTHER = ("completely different content about distributed query engines "
         "processing petabytes of shuffled columnar data every day")
THIRD = ("a third unrelated document mentioning streaming watermarks "
         "state stores and exactly once sinks for event pipelines")


def test_dedup_batch_against_index_decisions(spark, tmp_path):
    idx = str(tmp_path / "idx")
    corpus = _mkdocs(spark, [(1, BASE), (2, OTHER)])
    ingest.build_dedup_index(corpus, idx)
    batch = _mkdocs(spark, [
        (10, BASE + " extra"),         # near-dup of corpus doc 1 -> reject
        (11, THIRD),                   # novel -> admit
        (12, THIRD),                   # exact dup of 11 -> reject
        (13, THIRD + " slightly"),     # near-dup of 11 -> reject
        (14, "tiny odd standalone text nothing shared here at all"),
    ])
    novel = ingest.dedup_batch_against_index(spark, batch, idx)
    assert sorted(r.doc_id for r in novel.collect()) == [11, 14]


def test_streaming_ingest_extends_index(spark, tmp_path):
    """Batches admitted earlier must reject near-dups arriving later."""
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    ingest.build_dedup_index(_mkdocs(spark, [(1, BASE)]), idx)

    # file-source stream, one file per micro-batch
    _write_file(src + "/f1.parquet", [(10, OTHER)])
    _write_file(src + "/f2.parquet",
                [(20, OTHER + " tail"),      # near-dup of batch-1's 10
                 (21, THIRD)])
    # the file source orders micro-batches by modification time and
    # back-to-back pyarrow writes can tie at coarse mtime granularity
    # (observed flake: f2 admitted first) — force a strict order
    now = time.time()
    os.utime(src + "/f1.parquet", (now - 10, now - 10))
    os.utime(src + "/f2.parquet", (now, now))
    stream = (spark.readStream.schema("doc_id long, text string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = ingest.start_dedup_ingest_sink(stream, idx, out, ckpt)
    q.processAllAvailable()
    q.stop()

    admitted = sorted(r.doc_id for r in
                      spark.read.parquet(out).select("doc_id").collect())
    assert admitted == [10, 21]
    # the index grew: admitted docs' signatures are present
    sig_ids = {r.doc_id for r in spark.read.parquet(
        os.path.join(idx, "signatures")).select("doc_id").collect()}
    assert sig_ids == {1, 10, 21}


def test_streaming_ingest_restart_no_duplicates(spark, tmp_path):
    """Restarting on the same checkpoint must not re-admit or duplicate
    (idempotent batch dirs + committed offsets)."""
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    ingest.build_dedup_index(_mkdocs(spark, [(1, BASE)]), idx)
    _write_file(src + "/f1.parquet", [(10, OTHER)])

    def drain():
        stream = (spark.readStream.schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", "1").parquet(src))
        q = ingest.start_dedup_ingest_sink(stream, idx, out, ckpt)
        q.processAllAvailable()
        q.stop()

    drain()
    first = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    drain()  # no new files: offsets committed, nothing re-runs
    assert sorted(r.doc_id for r in
                  spark.read.parquet(out).collect()) == first == [10]


def test_compact_dedup_index_preserves_decisions(spark, tmp_path):
    """Compaction merges batch dirs into one partition without changing
    any admission decision."""
    idx = str(tmp_path / "idx")
    ingest.build_dedup_index(_mkdocs(spark, [(1, BASE)]), idx)
    # simulate two admitted batches
    for bid, rows in ((0, [(10, OTHER)]), (1, [(20, THIRD)])):
        sh, sig, spans, _urls = ingest._artifacts(
            _mkdocs(spark, rows), "doc_id", "text")
        sh.write.parquet(os.path.join(idx, "shingles", f"batch={bid}"))
        sig.write.parquet(os.path.join(idx, "signatures", f"batch={bid}"))
    probe = _mkdocs(spark, [
        (90, OTHER + " tail"),  # near-dup of indexed 10 -> reject
        (91, "fresh wholly novel words never indexed anywhere before")])
    before = sorted(r.doc_id for r in ingest.dedup_batch_against_index(
        spark, probe, idx).collect())
    ingest.compact_dedup_index(spark, idx)
    dirs = os.listdir(os.path.join(idx, "shingles"))
    assert dirs == ["batch=compacted"]
    after = sorted(r.doc_id for r in ingest.dedup_batch_against_index(
        spark, probe, idx).collect())
    assert before == after == [91]
    sig_ids = {r.doc_id for r in spark.read.parquet(
        os.path.join(idx, "signatures")).select("doc_id").collect()}
    assert sig_ids == {1, 10, 20}


def test_replayed_batch_reproduces_decision(spark, tmp_path):
    """The replay contract: with its own artifacts already indexed, a
    batch re-run with exclude_batch reproduces the original admission
    instead of rejecting itself."""
    idx = str(tmp_path / "idx")
    ingest.build_dedup_index(_mkdocs(spark, [(1, BASE)]), idx)
    batch = _mkdocs(spark, [(10, OTHER)])
    novel = ingest.dedup_batch_against_index(spark, batch, idx,
                                             exclude_batch=7)
    # simulate the sink having written batch 7's artifacts already
    sh, sig, _spans, _urls = ingest._artifacts(batch, "doc_id", "text")
    sh.write.mode("overwrite").parquet(
        os.path.join(idx, "shingles", "batch=7"))
    sig.write.mode("overwrite").parquet(
        os.path.join(idx, "signatures", "batch=7"))
    replay = ingest.dedup_batch_against_index(spark, batch, idx,
                                              exclude_batch=7)
    assert (sorted(r.doc_id for r in replay.collect())
            == sorted(r.doc_id for r in novel.collect()) == [10])
    # second defense: even WITHOUT the exclusion, the operator's equal-id
    # guard keeps a same-id replay from rejecting itself...
    assert sorted(r.doc_id for r in ingest.dedup_batch_against_index(
        spark, batch, idx).collect()) == [10]
    # ...but a near-dup variant under a NEW id IS rejected against the
    # indexed artifacts (which is exactly what makes exclusion necessary
    # if upstream ever re-keys a replayed batch)
    rekeyed = _mkdocs(spark, [(99, OTHER)])
    assert ingest.dedup_batch_against_index(
        spark, rekeyed, idx).count() == 0


def test_interleaved_replay_reproduces_decisions(spark, tmp_path):
    """At-least-once with REORDERING: batch 5 commits, batch 6 commits
    (rejecting a near-dup of batch 5's admission), then batch 5
    REPLAYS. The replay sees batch 6's artifacts — strictly more index
    than its original run — yet must reproduce the original admission:
    later batches only index docs they ADMITTED, and anything near-dup
    to batch 5's output was rejected by batch 6, so the extra
    partitions cannot flip batch 5's decisions. Drives the real sink
    body (ingest_micro_batch), not a simulation."""
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    ingest.build_dedup_index(_mkdocs(spark, [(1, BASE)]), idx)

    b5 = _mkdocs(spark, [(10, OTHER),            # novel -> admit
                         (11, BASE + " extra")])  # corpus near-dup -> reject
    b6 = _mkdocs(spark, [(20, OTHER + " ish"),   # near-dup of 10 -> reject
                         (21, THIRD)])           # novel -> admit

    ingest.ingest_micro_batch(spark, b5, 5, idx, out)
    ingest.ingest_micro_batch(spark, b6, 6, idx, out)

    def out_ids(bid):
        return sorted(r.doc_id for r in
                      spark.read.parquet(f"{out}/batch={bid}").collect())

    def index_state():
        sh = spark.read.parquet(os.path.join(idx, "shingles"))
        return sorted(map(tuple, sh.select("batch", "doc_id")
                          .distinct().collect()))

    assert out_ids(5) == [10] and out_ids(6) == [21]
    before = index_state()

    # the replay: batch 5 re-runs AFTER batch 6 committed
    ingest.ingest_micro_batch(spark, b5, 5, idx, out)
    assert out_ids(5) == [10], "replay flipped batch 5's admission"
    assert out_ids(6) == [21]
    assert index_state() == before, "replay mutated the index state"

    # and a batch 7 arriving after the replay still dedups against both
    b7 = _mkdocs(spark, [(30, THIRD + " more"),  # near-dup of 21 -> reject
                         (31, "entirely fresh text about nothing seen")])
    ingest.ingest_micro_batch(spark, b7, 7, idx, out)
    assert out_ids(7) == [31]


def test_span_rejector_catches_stitched_doc_across_restart(spark, tmp_path):
    """The third incremental rejector: a doc STITCHED from halves of two
    already-admitted docs is near-dup to NEITHER (Jaccard < threshold —
    the LSH path admits it) but recycles > max_span_frac of its 5-token
    windows, so the span index rejects it. The rejection must hold
    across a checkpoint RESTART (span partitions persist and later
    batches read them), and a REPLAY of an earlier batch after later
    commits must reproduce its original decisions (the strictly-
    before-me span visibility rule)."""
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    ingest.build_dedup_index(_mkdocs(spark, [(1, BASE)]), idx)

    stitched = " ".join(OTHER.split()[:8] + BASE.split()[:10])
    # premise check: WITHOUT the span rejector the stitched doc is
    # admitted (not near-dup to any single corpus/indexed doc) ...
    pre_idx = str(tmp_path / "pre_idx")
    ingest.build_dedup_index(_mkdocs(spark, [(1, BASE), (2, OTHER)]),
                             pre_idx)
    probe = _mkdocs(spark, [(90, stitched)])
    assert ingest.dedup_batch_against_index(
        spark, probe, pre_idx).count() == 1
    # ... and WITH it the doc is rejected
    assert ingest.dedup_batch_against_index(
        spark, probe, pre_idx, max_span_frac=0.5).count() == 0

    def drain():
        stream = (spark.readStream.schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", "1").parquet(src))
        q = ingest.start_dedup_ingest_sink(stream, idx, out, ckpt,
                                           max_span_frac=0.5)
        q.processAllAvailable()
        q.stop()

    _write_file(src + "/f1.parquet", [(10, OTHER)])
    now = time.time()
    os.utime(src + "/f1.parquet", (now - 20, now - 20))
    drain()     # batch 0: admits 10; its spans land at spans/batch=0

    _write_file(src + "/f2.parquet", [(20, stitched), (21, THIRD)])
    os.utime(src + "/f2.parquet", (now - 10, now - 10))
    drain()     # RESTART from checkpoint; batch 1 sees batch 0's spans
    admitted = sorted(r.doc_id for r in
                      spark.read.parquet(out).select("doc_id").collect())
    assert admitted == [10, 21], admitted

    # replay batch 1 after the fact (at-least-once): decisions stable
    ingest.ingest_micro_batch(
        spark, _mkdocs(spark, [(20, stitched), (21, THIRD)]), 1, idx, out,
        max_span_frac=0.5)
    assert sorted(r.doc_id for r in spark.read.parquet(out)
                  .select("doc_id").collect()) == [10, 21]

    # a third batch recycling THIRD + BASE halves is rejected too, and
    # compaction (occ re-aggregation) preserves the decision
    stitched2 = " ".join(THIRD.split()[:8] + BASE.split()[10:])
    probe2 = _mkdocs(spark, [(30, stitched2)])
    before = ingest.dedup_batch_against_index(
        spark, probe2, idx, max_span_frac=0.5).count()
    ingest.compact_dedup_index(spark, idx)
    after = ingest.dedup_batch_against_index(
        spark, probe2, idx, max_span_frac=0.5).count()
    assert before == after == 0


def test_bloom_rejector_decontaminates_at_ingest(spark, tmp_path):
    """The fourth, STATIC rejector: a doc carrying benchmark text is
    rejected by the Bloom artifact even though it is novel to the
    corpus index (no near-dup, no recycled spans); clean docs pass.
    Streaming restart and an at-least-once replay reproduce the same
    decisions (the artifact never changes, so replays are trivially
    stable)."""
    from lightning_metastore_spark.operators.contamination import (
        build_ngram_bloom, save_ngram_bloom)

    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    ingest.build_dedup_index(_mkdocs(spark, [(1, BASE)]), idx)

    bench_text = ("held out benchmark question about the capital of "
                  "france answered in one sentence exactly")
    bloom_path = str(tmp_path / "bloom")
    save_ngram_bloom(
        spark,
        build_ngram_bloom(_mkdocs(spark, [(900, bench_text)]), n=3,
                          n_bits=1 << 16, k=4),
        bloom_path)
    contaminated = "a new crawl page repeating " + bench_text

    # premise: WITHOUT the bloom option the contaminated doc is novel
    # (admitted); WITH it, rejected
    probe = _mkdocs(spark, [(50, contaminated)])
    assert ingest.dedup_batch_against_index(spark, probe, idx).count() == 1
    assert ingest.dedup_batch_against_index(
        spark, probe, idx, bloom_path=bloom_path).count() == 0

    def drain():
        stream = (spark.readStream.schema("doc_id long, text string")
                  .option("maxFilesPerTrigger", "1").parquet(src))
        q = ingest.start_dedup_ingest_sink(stream, idx, out, ckpt,
                                           bloom_path=bloom_path)
        q.processAllAvailable()
        q.stop()

    _write_file(src + "/f1.parquet", [(10, OTHER), (11, contaminated)])
    now = time.time()
    os.utime(src + "/f1.parquet", (now - 20, now - 20))
    drain()     # batch 0: admits only the clean doc

    _write_file(src + "/f2.parquet", [(20, contaminated), (21, THIRD)])
    os.utime(src + "/f2.parquet", (now - 10, now - 10))
    drain()     # RESTART from checkpoint; bloom still rejects
    admitted = sorted(r.doc_id for r in
                      spark.read.parquet(out).select("doc_id").collect())
    assert admitted == [10, 21], admitted

    # at-least-once replay of batch 1: decisions reproduce exactly
    ingest.ingest_micro_batch(
        spark, _mkdocs(spark, [(20, contaminated), (21, THIRD)]), 1,
        idx, out, bloom_path=bloom_path)
    assert sorted(r.doc_id for r in spark.read.parquet(out)
                  .select("doc_id").collect()) == [10, 21]

    # the rejector composes with the others: an exact dup of an
    # admitted doc AND a contaminated doc in one batch -> both rejected
    both = _mkdocs(spark, [(30, OTHER), (31, contaminated)])
    assert ingest.dedup_batch_against_index(
        spark, both, idx, bloom_path=bloom_path).count() == 0


def test_ref_lm_floor_rejects_junk_at_ingest(spark, tmp_path):
    """The fifth, STATIC rejector: a junk doc scoring below the
    reference-LM floor is rejected even though it is novel to the
    index; reference-like prose passes; a <2-token doc has no score
    and is NOT rejected by this stage; the decision is a pure function
    of the text, so a replayed micro-batch reproduces it exactly and
    it composes with the dedup rejectors."""
    from lightning_metastore_spark.operators.lm_filter import (
        score_with_bigram_lm, train_bigram_lm)

    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    ingest.build_dedup_index(_mkdocs(spark, [(1, BASE)]), idx)

    ref = _mkdocs(spark, [(i, OTHER) for i in range(3)]
                  + [(9, THIRD)])
    lm_path = str(tmp_path / "ref_lm")
    train_bigram_lm(ref, lm_path)

    junk = "zxq vbnm qwerty asdf zxcv plok mnbv wert yuio hjkl"
    prose = THIRD + " with a fresh continuation sentence attached"
    floor = -4.0
    # premise: the junk text really scores below the floor, prose above
    scores = {r.doc_id: r.avg_logprob for r in score_with_bigram_lm(
        _mkdocs(spark, [(50, junk), (51, prose)]), lm_path).collect()}
    assert scores[50] < floor < scores[51], scores

    batch = _mkdocs(spark, [(50, junk), (51, prose), (52, "one")])
    # without the floor: everything is novel -> all admitted
    assert ingest.dedup_batch_against_index(
        spark, batch, idx).count() == 3
    got = sorted(r.doc_id for r in ingest.dedup_batch_against_index(
        spark, batch, idx, ref_lm_path=lm_path,
        min_ref_logprob=floor).collect())
    assert got == [51, 52], got

    # replay stability through the real micro-batch body
    ingest.ingest_micro_batch(spark, batch, 7, idx, out,
                              ref_lm_path=lm_path, min_ref_logprob=floor)
    first = sorted(r.doc_id for r in spark.read.parquet(out).collect())
    ingest.ingest_micro_batch(spark, batch, 7, idx, out,
                              ref_lm_path=lm_path, min_ref_logprob=floor)
    assert sorted(r.doc_id for r in
                  spark.read.parquet(out).collect()) == first == [51, 52]

    # composes: junk + a near-dup of an admitted doc in one batch
    both = _mkdocs(spark, [(60, junk), (61, prose + " minor edit")])
    assert ingest.dedup_batch_against_index(
        spark, both, idx, ref_lm_path=lm_path,
        min_ref_logprob=floor).count() == 0


def test_ref_lm_rejector_accepts_kn_artifact(spark, tmp_path):
    """Batch curation and streaming ingest share one reference-LM
    loader: pointing ref_lm_path at an order-n Kneser-Ney artifact
    (instead of the bigram one) changes NOTHING about the rejector
    wiring — junk is still floored out, prose admitted."""
    from lightning_metastore_spark.operators.lm_filter import (
        score_with_kn_lm, train_kn_lm)

    idx = str(tmp_path / "idx_kn")
    ingest.build_dedup_index(_mkdocs(spark, [(1, BASE)]), idx)
    ref = _mkdocs(spark, [(i, OTHER) for i in range(3)] + [(9, THIRD)])
    lm_path = str(tmp_path / "kn_lm")
    train_kn_lm(ref, lm_path, order=3)

    junk = "zxq vbnm qwerty asdf zxcv plok mnbv wert yuio hjkl"
    prose = THIRD + " with a fresh continuation sentence attached"
    scores = {r.doc_id: r.avg_logprob for r in score_with_kn_lm(
        _mkdocs(spark, [(50, junk), (51, prose)]), lm_path).collect()}
    floor = (scores[50] + scores[51]) / 2.0
    assert scores[50] < floor < scores[51], scores

    batch = _mkdocs(spark, [(50, junk), (51, prose)])
    got = sorted(r.doc_id for r in ingest.dedup_batch_against_index(
        spark, batch, idx, ref_lm_path=lm_path,
        min_ref_logprob=floor).collect())
    assert got == [51], got


def test_url_frontier_rejector(spark, tmp_path):
    """The crawl-frontier rejector: a re-crawled page (same canonical
    URL, edited text — NOT a near-dup) is rejected against the
    index's visited set; intra-batch URL dups keep the smallest id;
    NULL-URL docs pass this stage; decisions survive restart AND an
    at-least-once replay through the real micro-batch body; the
    visited set grows with admitted batches and compaction preserves
    decisions."""
    def mk(rows):
        return spark.createDataFrame(
            rows, "doc_id long, text string, url string")

    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    ingest.build_dedup_index(
        mk([(1, BASE, "https://Site.COM:443/a?utm_x=1")]), idx,
        url_col="url")

    # same canonical URL as the bootstrap doc, totally different text
    recrawl = mk([(10, OTHER, "https://site.com/a")])
    assert ingest.dedup_batch_against_index(
        spark, recrawl, idx).count() == 1          # without: novel
    assert ingest.dedup_batch_against_index(
        spark, recrawl, idx, url_col="url").count() == 0

    batch = mk([
        (20, OTHER, "http://b.org/x?b=2&a=1"),     # novel URL -> admit
        (21, THIRD, "http://b.org/x?a=1&b=2#f"),   # same canonical -> lose
        (22, THIRD + " two", None),                # NULL URL -> pass
    ])
    got = sorted(r.doc_id for r in ingest.dedup_batch_against_index(
        spark, batch, idx, url_col="url").collect())
    assert got == [20, 22], got

    # the real micro-batch body: admitted urls extend the visited set
    ingest.ingest_micro_batch(spark, batch, 0, idx, out, url_col="url")
    later = mk([(30, "entirely new prose about something else here",
                 "HTTP://B.ORG:80/x?a=1&b=2")])
    assert ingest.dedup_batch_against_index(
        spark, later, idx, url_col="url").count() == 0

    # replay of batch 0 reproduces its decisions exactly
    ingest.ingest_micro_batch(spark, batch, 0, idx, out, url_col="url")
    assert sorted(r.doc_id for r in
                  spark.read.parquet(out).collect()) == [20, 22]

    # compaction keeps the visited set effective
    ingest.compact_dedup_index(spark, idx)
    assert ingest.dedup_batch_against_index(
        spark, later, idx, url_col="url").count() == 0
    assert ingest.dedup_batch_against_index(
        spark, recrawl, idx, url_col="url").count() == 0


def test_gopher_rejector_at_ingest(spark, tmp_path):
    """The sixth (stateless) rejector: pages failing the Gopher
    document quality rules are rejected before any artifact probe;
    passing pages flow through; composes with the URL rejector in the
    documented order (URL losers never reach the gopher stage)."""
    long_good = ("the steady rhythm of these long sentences keeps the "
                 "word count well above fifty and that gives the rule "
                 "set something real to measure with plenty of common "
                 "stop words spread through the text so the presence "
                 "test passes while every other ratio stays in range "
                 "and the final line carries the count past the floor")
    idx = str(tmp_path / "idx")
    ingest.build_dedup_index(
        spark.createDataFrame([(1, "bootstrap document body " * 20)],
                              "doc_id long, text string"), idx)
    batch = spark.createDataFrame(
        [(10, long_good), (11, "far too short to pass gopher")],
        "doc_id long, text string")
    assert sorted(r.doc_id for r in ingest.dedup_batch_against_index(
        spark, batch, idx).collect()) == [10, 11]     # without: both
    got = [r.doc_id for r in ingest.dedup_batch_against_index(
        spark, batch, idx, use_gopher_rules=True).collect()]
    assert got == [10]
    # composed with the URL rejector: the URL loser (same canonical
    # URL, larger id) is gone even though its text passes gopher
    batch2 = spark.createDataFrame(
        [(20, long_good, "http://a.com/x"),
         (21, long_good + " extra tail words", "http://a.com/x?#frag"),
         (22, "short junk", "http://b.com/y")],
        "doc_id long, text string, url string")
    got2 = [r.doc_id for r in ingest.dedup_batch_against_index(
        spark, batch2, idx, url_col="url",
        use_gopher_rules=True).collect()]
    assert got2 == [20]
