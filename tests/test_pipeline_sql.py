"""RUN PIPELINE SQL surface == Python API, for the full round-9 op
registry (graph, tokenizer train/apply, temporal, profile, sampling/
packing, embedding, layout families). One module-scoped fixture writes
small parquet tables and registers them as a lightning datasource; each
case runs the op through the SQL dialect and asserts row equality with
the Python API on the same data, plus one HTTP round trip through the
REST server."""

from __future__ import annotations

import json
import sys
import urllib.request

import pytest

sys.path.insert(0, "/root/repo")

from lightning_metastore_spark.context import LightningContext  # noqa: E402

from tests.conftest import SF_DIR  # noqa: E402

NS = "lightning.datasource.file.pipe"
DOCS, EVENTS, EMB, EDGES = (f"{NS}.docs", f"{NS}.events",
                            f"{NS}.emb", f"{NS}.edges")
RANKA, RANKB = f"{NS}.ranka", f"{NS}.rankb"
DOCS2 = f"{NS}.docs2"
DOCSL = f"{NS}.docsl"


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    """Small tables + a registered datasource + a LightningContext,
    shared across all cases in this module (read-only use)."""
    root = tmp_path_factory.mktemp("pipe_sql")
    ds = root / "ds"
    ds.mkdir()
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .orderBy("doc_id").limit(40))
    docs.write.parquet(str(ds / "docs"))
    events = (spark.read.parquet(f"{SF_DIR}/events.parquet")
              .filter("user_id < 20"))
    events.write.parquet(str(ds / "events"))
    emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
           .orderBy("vec_id").limit(40))
    emb.write.parquet(str(ds / "emb"))
    edges = spark.range(30).selectExpr(
        "id AS src", "(id + 1) % 30 AS dst").union(
        spark.range(30).selectExpr("id AS src", "(id + 2) % 30 AS dst"))
    edges.write.parquet(str(ds / "edges"))
    # two overlapping candidate lists for the fusion ops
    ranka = spark.createDataFrame(
        [(i, float((i * 37) % 11)) for i in range(20)],
        "doc_id long, score double")
    rankb = spark.createDataFrame(
        [(i, float((i * 17) % 7)) for i in range(5, 25)],
        "doc_id long, score double")
    ranka.write.parquet(str(ds / "ranka"))
    rankb.write.parquet(str(ds / "rankb"))
    # a second corpus snapshot for the diff op: some ids dropped, some
    # texts edited, one id added
    docs2 = docs.selectExpr(
        "doc_id",
        "CASE WHEN doc_id % 3 = 0 THEN concat(text, ' v2') "
        "ELSE text END AS text").filter("doc_id % 5 <> 0").union(
        spark.createDataFrame([(100000, "brand new doc")],
                              "doc_id long, text string"))
    docs2.write.parquet(str(ds / "docs2"))
    # a labeled snapshot for classifier training
    docs.selectExpr("doc_id", "text",
                    "CAST(doc_id % 2 AS INT) AS label") \
        .write.parquet(str(ds / "docsl"))

    ctx = LightningContext(spark, warehouse=str(root / "model"))
    ctx.sql("CREATE NAMESPACE lightning.datasource.file")
    ctx.sql(f"REGISTER PARQUET DATASOURCE pipe OPTIONS(path '{ds}') "
            "NAMESPACE lightning.datasource.file")

    class Env:
        pass

    e = Env()
    e.ctx = ctx
    e.root = root
    e.docs = spark.read.parquet(str(ds / "docs"))
    e.events = spark.read.parquet(str(ds / "events"))
    e.emb = spark.read.parquet(str(ds / "emb"))
    e.edges = spark.read.parquet(str(ds / "edges"))
    e.ranka = spark.read.parquet(str(ds / "ranka"))
    e.rankb = spark.read.parquet(str(ds / "rankb"))
    e.docs2 = spark.read.parquet(str(ds / "docs2"))
    e.docsl = spark.read.parquet(str(ds / "docsl"))
    return e


def _rows(df):
    return sorted(map(repr, df.collect()))


# (case id, SQL after "RUN PIPELINE ", python callable over env)
def _cases():
    from lightning_metastore_spark.functions import text as tf
    from lightning_metastore_spark.operators import (
        chunking, cleaning, dedup, graph, packing, quantization, retrieval,
        sampling, skyline, temporal)
    from lightning_metastore_spark.operators.heavy_hitters import (
        heavy_hitters)

    return [
        ("simhash_pairs",
         f"simhash_pairs ON {DOCS} OPTIONS(hamming_max '3')",
         lambda e: dedup.simhash_pairs(e.docs, hamming_max=3)),
        ("dup_spans",
         f"dup_spans ON {DOCS} OPTIONS(k '4')",
         lambda e: dedup.corpus_dup_spans(e.docs, k=4)),
        ("remove_dup_spans",
         f"remove_dup_spans ON {DOCS} OPTIONS(k '4')",
         lambda e: dedup.remove_dup_spans(e.docs, k=4)),
        ("semdedup",
         f"semdedup ON {EMB} OPTIONS(threshold '0.4')",
         lambda e: dedup.semantic_dedup(e.emb, threshold=0.4)),
        ("dedup_lines",
         f"dedup_lines ON {DOCS}",
         lambda e: cleaning.dedup_lines_within_doc(e.docs)),
        ("c4_clean",
         f"c4_clean ON {DOCS} OPTIONS(min_line_words '3')",
         lambda e: cleaning.c4_line_clean(e.docs, min_line_words=3)),
        ("normalize_text",
         f"normalize_text ON {DOCS} OPTIONS(form 'NFKC')",
         lambda e: cleaning.normalize_text(e.docs, form="NFKC")),
        ("pagerank",
         f"pagerank ON {EDGES} OPTIONS(n_iter '3', damping '0.85')",
         lambda e: graph.pagerank(e.edges, n_iter=3, damping=0.85)),
        ("triangles",
         f"triangles ON {EDGES}",
         lambda e: graph.triangle_counts(e.edges)),
        ("communities",
         f"communities ON {EDGES} OPTIONS(n_iter '3', symmetrize 'true')",
         lambda e: graph.label_propagation(e.edges, n_iter=3,
                                           symmetrize=True)),
        ("funnel",
         f"funnel ON {EVENTS} OPTIONS(stages 'view,click,purchase')",
         lambda e: temporal.funnel_counts(
             e.events, ("view", "click", "purchase"))),
        ("sessionize",
         f"sessionize ON {EVENTS} OPTIONS(gap_minutes '30')",
         lambda e: temporal.sessionize(e.events, gap_minutes=30)),
        ("active_users",
         f"active_users ON {EVENTS} OPTIONS(window_days '3')",
         lambda e: temporal.rolling_active_users(e.events, window_days=3)),
        ("retention",
         f"retention ON {EVENTS} OPTIONS(max_offset_days '5')",
         lambda e: temporal.retention_cohorts(e.events, max_offset_days=5)),
        ("rollup",
         f"rollup ON {EVENTS} OPTIONS(resolutions 'hour,day')",
         lambda e: temporal.hypertable_rollup(
             e.events, resolutions=("hour", "day"))),
        ("gap_fill",
         f"gap_fill ON {EVENTS}",
         lambda e: temporal.gap_filled_hourly(e.events)),
        ("rolling_zscore",
         f"rolling_zscore ON {EVENTS} "
         "OPTIONS(trailing '6', min_periods '3')",
         lambda e: temporal.rolling_zscore(e.events, trailing=6,
                                           min_periods=3)),
        ("lttb",
         f"lttb ON {EVENTS} OPTIONS(n_out '4')",
         lambda e: temporal.lttb_downsample(e.events, n_out=4)),
        ("heavy_hitters",
         f"heavy_hitters ON {EVENTS} "
         "OPTIONS(s '0.05', item_col 'event_type')",
         lambda e: heavy_hitters(e.events, s=0.05,
                                 item_col="event_type")),
        ("skyline",
         f"skyline ON {DOCS} "
         "OPTIONS(minimize 'n_chars', maximize 'doc_id')",
         lambda e: skyline.skyline(e.docs, minimize=["n_chars"],
                                   maximize=["doc_id"])),
        ("tfidf",
         f"tfidf ON {DOCS} OPTIONS(k '3')",
         lambda e: tf.tfidf_top_terms(e.docs, k=3)),
        ("fingerprint",
         f"fingerprint ON {DOCS}",
         lambda e: tf.fingerprint(e.docs)),
        ("token_stats",
         f"token_stats ON {DOCS} OPTIONS(vocab_size '64')",
         lambda e: tf.encode_token_stats(e.docs, vocab_size=64)),
        ("phrase_search",
         f"phrase_search ON {DOCS} OPTIONS(phrase 'table scan')",
         lambda e: tf.phrase_search(e.docs, "table scan")),
        ("bm25",
         f"bm25 ON {DOCS} OPTIONS(query_terms 'query,join')",
         lambda e: tf.bm25_scores(e.docs, query_terms=("query", "join"))),
        ("unigram_logprob",
         f"unigram_logprob ON {DOCS}",
         lambda e: tf.unigram_logprob(e.docs)),
        ("bigram_logprob",
         f"bigram_logprob ON {DOCS} OPTIONS(lam '0.6')",
         lambda e: tf.bigram_logprob(e.docs, lam=0.6)),
        ("classifier_score",
         f"classifier_score ON {DOCS}",
         lambda e: tf.classifier_score(e.docs)),
        ("stratified_sample",
         f"stratified_sample ON {DOCS} "
         "OPTIONS(n_per_group '3', group_col 'lang')",
         lambda e: sampling.stratified_fixed_n(e.docs, 3,
                                               group_col="lang")),
        ("weighted_sample",
         f"weighted_sample ON {DOCS} "
         "OPTIONS(n '10', weight_col 'n_chars')",
         lambda e: sampling.weighted_sample_n(e.docs, 10,
                                              weight_col="n_chars")),
        ("pack",
         f"pack ON {DOCS} OPTIONS(capacity '512', n_blocks '4')",
         lambda e: packing.packed_offsets(e.docs, capacity=512,
                                          n_blocks=4)),
        ("chunk",
         f"chunk ON {DOCS} OPTIONS(chunk_size '16', overlap '4')",
         lambda e: chunking.chunk_documents(e.docs, chunk_size=16,
                                            overlap=4)),
        ("pack_bins",
         f"pack_bins ON {DOCS} OPTIONS(capacity '512', n_shards '3')",
         lambda e: packing.greedy_pack_bins(e.docs, capacity=512,
                                            n_shards=3)),
        ("quantile_normalize",
         f"quantile_normalize ON {DOCS} "
         "OPTIONS(value_col 'n_chars', group_col 'lang')",
         lambda e: sampling.quantile_normalize(e.docs, "n_chars",
                                               "lang")),
        ("mixture_resample",
         f"mixture_resample ON {DOCS} "
         "OPTIONS(weights 'en:0.5,es:0.3,zh:0.2', target_frac '0.5')",
         lambda e: sampling.mixture_resample(
             e.docs, {"en": 0.5, "es": 0.3, "zh": 0.2},
             target_frac=0.5)),
        ("pca_project",
         f"pca_project ON {EMB} OPTIONS(k '2', n_iter '4')",
         lambda e: __import__(
             "lightning_metastore_spark.operators.quantization",
             fromlist=["apply_pca"]).apply_pca(
                 e.emb, *__import__(
                     "lightning_metastore_spark.operators.quantization",
                     fromlist=["power_iteration_pca"])
                 .power_iteration_pca(e.emb, k=2, n_iter=4))),
        ("quantize",
         f"quantize ON {EMB}",
         lambda e: quantization.scalar_quantize_stats(e.emb)),
        ("random_project",
         f"random_project ON {EMB} OPTIONS(k '4')",
         lambda e: quantization.random_project(e.emb, k=4)),
        ("norm_outliers",
         f"norm_outliers ON {EMB} OPTIONS(k '2.0', exact 'true')",
         lambda e: quantization.norm_outliers(e.emb, k=2.0, exact=True)),
        ("gopher_rules",
         f"gopher_rules ON {DOCS} OPTIONS(min_words '10')",
         lambda e: tf.gopher_quality_rules(e.docs, min_words=10)),
        ("temperature_resample",
         f"temperature_resample ON {DOCS} "
         "OPTIONS(tau '0.5', target_frac '0.5', group_col 'lang')",
         lambda e: sampling.temperature_resample(e.docs, tau=0.5,
                                                 target_frac=0.5)),
        ("budget_select",
         f"budget_select ON {DOCS} "
         "OPTIONS(budget_tokens '1500', score_col 'n_chars')",
         lambda e: sampling.budget_select(e.docs, 1500,
                                          score_col="n_chars")),
        ("epoch_schedule",
         f"epoch_schedule ON {DOCS} "
         "OPTIONS(tau '0.5', target_frac '1.5', group_col 'lang')",
         lambda e: sampling.epoch_schedule(e.docs, tau=0.5,
                                           target_frac=1.5)),
        ("rrf_fuse",
         f"rrf_fuse ON {RANKA} OPTIONS(other '{RANKB}', k0 '60')",
         lambda e: retrieval.rrf_fuse([e.ranka, e.rankb], k0=60)),
        ("hybrid_search",
         f"hybrid_search ON {DOCS} OPTIONS(emb '{EMB}', "
         "query_terms 'spark,merge', query_vec_id '3', k '5')",
         lambda e: retrieval.hybrid_search(e.docs, e.emb,
                                           ("spark", "merge"), 3, k=5)),
        ("dsir_select",
         f"dsir_select ON {DOCS} OPTIONS(target '{DOCS2}', n '10', "
         "n_buckets '128')",
         lambda e: sampling.dsir_select(e.docs, e.docs2, n=10,
                                        n_buckets=128)),
        ("html_extract",
         f"html_extract ON {DOCS}",
         lambda e: __import__(
             "lightning_metastore_spark.functions.html",
             fromlist=["html_extract"]).html_extract(e.docs)),
        ("corpus_diff",
         f"corpus_diff ON {DOCS2} OPTIONS(old '{DOCS}')",
         lambda e: __import__(
             "lightning_metastore_spark.operators.pipeline",
             fromlist=["corpus_diff"]).corpus_diff(e.docs, e.docs2)),
        ("corpus_drift",
         f"corpus_drift ON {DOCS2} OPTIONS(old '{DOCS}', top_k '5')",
         lambda e: __import__(
             "lightning_metastore_spark.operators.pipeline",
             fromlist=["corpus_drift"]).corpus_drift(e.docs, e.docs2,
                                                     top_k=5)),
        ("url_canonicalize",
         f"url_canonicalize ON {DOCS} OPTIONS(url_col 'source')",
         lambda e: __import__(
             "lightning_metastore_spark.functions.html",
             fromlist=["url_canonicalize"]).url_canonicalize(
                 e.docs, url_col="source")),
        ("url_dedup",
         f"url_dedup ON {DOCS} OPTIONS(url_col 'source')",
         lambda e: __import__(
             "lightning_metastore_spark.functions.html",
             fromlist=["url_dedup"]).url_dedup(e.docs,
                                               url_col="source")),
        ("dedup_keep",
         f"dedup_keep ON {DOCS} "
         "OPTIONS(method 'minhash', threshold '0.5')",
         lambda e: dedup.dedup_keep(e.docs, method="minhash",
                                    threshold=0.5)),
        ("perplexity_buckets",
         f"perplexity_buckets ON {DOCS} "
         "OPTIONS(score_col 'n_chars', group_col 'lang')",
         lambda e: __import__(
             "lightning_metastore_spark.operators.lm_filter",
             fromlist=["perplexity_buckets"]).perplexity_buckets(
                 e.docs, score_col="n_chars", group_col="lang")),
        ("table_stats",
         f"table_stats ON {DOCS} OPTIONS(exact 'true')",
         lambda e: __import__(
             "lightning_metastore_spark.operators.layout",
             fromlist=["table_stats"]).table_stats(e.docs, exact=True)),
        ("bucket_resample",
         f"bucket_resample ON {DOCS} "
         "OPTIONS(rates 'en:1.0,de:0.4', bucket_col 'lang')",
         lambda e: sampling.bucket_resample(
             e.docs, {"en": 1.0, "de": 0.4}, bucket_col="lang")),
        ("ccnet_sample",
         f"ccnet_sample ON {DOCS} "
         "OPTIONS(score_col 'n_chars', group_col 'lang', "
         "middle '0.6', tail '0.2')",
         lambda e: sampling.bucket_resample(
             __import__(
                 "lightning_metastore_spark.operators.lm_filter",
                 fromlist=["perplexity_buckets"]).perplexity_buckets(
                     e.docs, score_col="n_chars", group_col="lang"),
             {"head": 1.0, "middle": 0.6, "tail": 0.2})),
    ]


@pytest.mark.parametrize("case", _cases(), ids=lambda c: c[0])
def test_run_pipeline_equals_python_api(env, case):
    _, sql, pyfn = case
    got = _rows(env.ctx.sql(f"RUN PIPELINE {sql}"))
    want = _rows(pyfn(env))
    assert got == want and len(got) > 0


def test_list_pipeline_ops_covers_all_families(env):
    rows = env.ctx.sql("LIST PIPELINE OPS").collect()
    ops = {r.op for r in rows}
    assert len(ops) >= 30
    assert {"pagerank", "triangles", "communities",       # graph
            "bpe_train", "bpe_apply", "unigram_train",    # tokenizer
            "funnel", "retention", "active_users",        # temporal
            "heavy_hitters", "skyline", "zipf",           # profile
            "compact", "zorder", "shard_export"} <= ops   # layout


def test_tokenizer_train_apply_roundtrip_sql(env):
    """bpe_train/unigram_train persist artifacts via OPTIONS(save);
    *_apply loads them with OPTIONS(load) and matches the Python API."""
    from lightning_metastore_spark.operators import bpe, unigram_lm

    bp = str(env.root / "bpe_artifact")
    out = env.ctx.sql(f"RUN PIPELINE bpe_train ON {DOCS} "
                      f"OPTIONS(n_merges '6', save '{bp}')")
    learned = [(r.left, r.right, r.pair_freq)
               for r in out.orderBy("rank").collect()]
    want = bpe.learn_bpe_merges(env.docs, n_merges=6)
    assert learned == [(l, r, c) for l, r, c in want] and learned

    applied = env.ctx.sql(f"RUN PIPELINE bpe_apply ON {DOCS} "
                          f"OPTIONS(load '{bp}')")
    assert _rows(applied) == _rows(bpe.apply_bpe_merges(env.docs, want))

    fert = env.ctx.sql(f"RUN PIPELINE bpe_fertility ON {DOCS} "
                       f"OPTIONS(load '{bp}', group_col 'lang')")
    assert _rows(fert) == _rows(
        bpe.tokenizer_fertility(env.docs, want, group_col="lang"))

    up = str(env.root / "uni_artifact")
    outu = env.ctx.sql(f"RUN PIPELINE unigram_train ON {DOCS} "
                       f"OPTIONS(vocab_size '32', em_iters '1', "
                       f"save '{up}')")
    pieces = unigram_lm.train_unigram_lm(env.docs, vocab_size=32,
                                         em_iters=1)
    assert sorted((r.piece, round(r.logprob, 9))
                  for r in outu.collect()) == \
        sorted((p, round(s, 9)) for p, s in pieces)

    appliedu = env.ctx.sql(f"RUN PIPELINE unigram_apply ON {DOCS} "
                           f"OPTIONS(load '{up}')")
    assert _rows(appliedu) == _rows(
        unigram_lm.apply_unigram_lm(env.docs, pieces))

    # full id encoding from the saved BPE artifact
    enc = env.ctx.sql(f"RUN PIPELINE bpe_encode ON {DOCS} "
                      f"OPTIONS(load '{bp}')")
    assert _rows(enc) == _rows(bpe.encode_bpe_ids(env.docs, want))


def test_bloom_build_decontaminate_roundtrip_sql(env):
    """bloom_build persists a Bloom artifact from the benchmark table;
    bloom_decontaminate flags the corpus against it — matching the
    Python API."""
    from lightning_metastore_spark.operators import contamination as cont

    bp = str(env.root / "bloom_sql_artifact")
    row = env.ctx.sql(f"RUN PIPELINE bloom_build ON {DOCS} "
                      f"OPTIONS(n '3', save '{bp}')").collect()[0]
    assert row.n_grams > 0 and 0 <= row.fp_rate < 1

    got = env.ctx.sql(f"RUN PIPELINE bloom_decontaminate ON {DOCS} "
                      f"OPTIONS(load '{bp}', flag_threshold '0.9')")
    bloom = cont.load_ngram_bloom(env.docs.sparkSession, bp)
    want = cont.bloom_contamination(env.docs, bloom, flag_threshold=0.9)
    assert _rows(got) == _rows(want)
    # a corpus decontaminated against its own grams is fully flagged
    assert all(r.is_contaminated for r in got.collect())


def test_layout_ops_write_and_report(env, spark):
    """compact/zorder/range_cluster/shard_export write real parquet to
    OPTIONS(path) and return a summary row; row counts are preserved."""
    n_docs = env.docs.count()

    zp = str(env.root / "zorder_out")
    row = env.ctx.sql(
        f"RUN PIPELINE zorder ON {DOCS} "
        f"OPTIONS(path '{zp}', cols 'n_chars,doc_id', n_files '2')"
    ).collect()[0]
    assert row.n_files == 2
    assert spark.read.parquet(zp).count() == n_docs

    rp = str(env.root / "range_out")
    env.ctx.sql(f"RUN PIPELINE range_cluster ON {DOCS} "
                f"OPTIONS(path '{rp}', cols 'doc_id', n_files '2')")
    assert spark.read.parquet(rp).count() == n_docs

    sp = str(env.root / "shards_out")
    env.ctx.sql(f"RUN PIPELINE shard_export ON {DOCS} "
                f"OPTIONS(path '{sp}', n_shards '3')")
    assert spark.read.parquet(sp).count() == n_docs

    cp = str(env.root / "compact_out")
    stats = env.ctx.sql(
        f"RUN PIPELINE compact ON {DOCS} "
        f"OPTIONS(path '{zp}', out_path '{cp}', target_mb '64')"
    ).collect()[0]
    assert stats.n_input_files == 2 and stats.n_output_files >= 1
    assert spark.read.parquet(cp).count() == n_docs


def test_pipeline_internal_typeerror_not_masked(env):
    """A genuine TypeError raised INSIDE an operator must propagate,
    not be relabeled as a bad-option parse error (ADVICE r8)."""
    from lightning_metastore_spark.parser.dispatcher import (
        CommandParseError, RunPipeline)

    fn, coercions = RunPipeline._registry()["quality"]

    def exploding(df, **kw):
        raise TypeError("internal: not an options problem")

    # simulate via the command object with a patched registry entry
    cmd = RunPipeline(op="quality", table_path=DOCS.split(".")[1:])
    import unittest.mock as mock
    with mock.patch.object(
            RunPipeline, "_registry",
            staticmethod(lambda: {"quality": (exploding, coercions)})):
        with pytest.raises(TypeError, match="internal"):
            cmd.run(env.ctx)
    # while a typo'd option is still the friendly parse error
    with pytest.raises(CommandParseError, match="declared options"):
        env.ctx.sql(f"RUN PIPELINE quality ON {DOCS} "
                    "OPTIONS(nonsense_opt 'x')")


def test_http_round_trip_new_op(env):
    """One new-family op over real HTTP: funnel through /api/q equals
    the Python API."""
    from lightning_metastore_spark.api import LightningAPIServer
    from lightning_metastore_spark.operators import temporal

    srv = LightningAPIServer(env.ctx).start()
    try:
        req = urllib.request.Request(
            f"http://{srv.host}:{srv.port}/api/q",
            data=json.dumps({
                "query": f"RUN PIPELINE funnel ON {EVENTS} "
                         "OPTIONS(stages 'view,click,purchase')"}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req) as resp:
            status, rows = resp.status, json.loads(resp.read())
    finally:
        srv.stop()
    want = [r.asDict() for r in temporal.funnel_counts(
        env.events, ("view", "click", "purchase")).collect()]
    assert status == 200
    assert sorted(tuple(sorted(r.items())) for r in rows) == \
        sorted(tuple(sorted(w.items())) for w in want)


def test_curate_optional_stage_options_coerce(env):
    """The curate op's optional-stage OPTIONS arrive typed (floats, not
    strings) so threshold comparisons work through SQL."""
    from lightning_metastore_spark.operators.pipeline import (
        CurationConfig, curate_corpus)

    got = env.ctx.sql(
        f"RUN PIPELINE curate ON {DOCS} "
        "OPTIONS(min_quality '0.0', max_dup_span_frac '0.4', "
        "dup_span_k '5')")
    want = curate_corpus(env.docs, CurationConfig(
        min_quality=0.0, max_dup_span_frac=0.4, dup_span_k=5))
    assert _rows(got) == _rows(want)


def test_curate_ccnet_rates_option_sql(env):
    """The rate-map OPTION parses 'bucket:rate' pairs into the typed
    dict CurationConfig expects; the SQL path equals the Python API."""
    from lightning_metastore_spark.operators.lm_filter import train_kn_lm
    from lightning_metastore_spark.operators.pipeline import (
        CurationConfig, curate_corpus)

    p = str(env.root / "ccnet_sql_lm")
    train_kn_lm(env.docs2, p, order=2)
    got = env.ctx.sql(
        f"RUN PIPELINE curate ON {DOCS} "
        f"OPTIONS(min_quality '0.0', ref_lm_path '{p}', "
        "ccnet_bucket_rates 'head:1.0,middle:0.5,tail:0.1')")
    want = curate_corpus(env.docs, CurationConfig(
        min_quality=0.0, ref_lm_path=p,
        ccnet_bucket_rates={"head": 1.0, "middle": 0.5, "tail": 0.1}))
    assert _rows(got) == _rows(want)
    assert got.filter("drop_reason = 'ccnet_thinned'").count() > 0


def test_two_table_range_join_and_ann_sql(env, spark, tmp_path_factory):
    """The remaining two-table ops through SQL: range_join (self-range
    on events.value) and ann_topk (corpus vs a registered query
    table)."""
    from lightning_metastore_spark.operators.similarity import (
        brute_force_topk)
    from lightning_metastore_spark.operators.temporal import range_join

    got = env.ctx.sql(
        f"RUN PIPELINE range_join ON {EVENTS} "
        f"OPTIONS(right '{EVENTS}', left_val 'value', "
        "right_val 'value', lo '0.0', hi '5.0', by 'event_type')")
    want = range_join(env.events, env.events, "value", "value",
                      0.0, 5.0, by=("event_type",))
    assert _rows(got) == _rows(want) and got.count() > 0

    gota = env.ctx.sql(f"RUN PIPELINE ann_topk ON {EMB} "
                       f"OPTIONS(queries '{EMB}', k '3')")
    wanta = brute_force_topk(env.emb, env.emb, k=3)
    assert _rows(gota) == _rows(wanta)

    # hard-negative mining: pairs = the rank-1 neighbors, SINKed as a
    # table, then consumed via the pairs/pos_col options
    from lightning_metastore_spark.operators.retrieval import (
        mine_hard_negatives)
    out_dir = tmp_path_factory.mktemp("hn_pairs_ds")
    env.ctx.sql(f"REGISTER PARQUET DATASOURCE hnp "
                f"OPTIONS(path '{out_dir}') "
                "NAMESPACE lightning.datasource.file")
    env.ctx.sql(f"RUN PIPELINE ann_topk ON {EMB} "
                f"OPTIONS(queries '{EMB}', k '1') "
                "SINK lightning.datasource.file.hnp.pairs")
    goth = env.ctx.sql(
        f"RUN PIPELINE mine_hard_negatives ON {EMB} "
        "OPTIONS(pairs 'lightning.datasource.file.hnp.pairs', "
        "pos_col 'neighbor_id', k '3', margin '0.02')")
    pairs = brute_force_topk(env.emb, env.emb, k=1)
    wanth = mine_hard_negatives(env.emb, pairs, k=3, margin=0.02,
                                pos_col="neighbor_id")
    assert _rows(goth) == _rows(wanth) and goth.count() > 0


def test_span_index_build_and_admit_sql(env, spark, tmp_path_factory):
    """Incremental exact-substring dedup through SQL: span_index SINKs
    the artifact as a registered table; span_admit checks a batch
    against it via the TABLE option."""
    from lightning_metastore_spark.operators import dedup

    out_dir = tmp_path_factory.mktemp("span_idx_ds")
    env.ctx.sql(f"REGISTER PARQUET DATASOURCE spidx "
                f"OPTIONS(path '{out_dir}') "
                "NAMESPACE lightning.datasource.file")
    env.ctx.sql(f"RUN PIPELINE span_index ON {DOCS} OPTIONS(k '4') "
                "SINK lightning.datasource.file.spidx.idx")
    got = env.ctx.sql(
        f"RUN PIPELINE span_admit ON {DOCS} "
        "OPTIONS(index 'lightning.datasource.file.spidx.idx', "
        "k '4', max_dup_frac '0.5')")
    idx = dedup.span_index(env.docs, k=4)
    want = dedup.span_batch_against_index(env.docs, idx, k=4,
                                          max_dup_frac=0.5)
    assert _rows(got) == _rows(want)
    # a batch checked against its own corpus index is fully known
    assert all(r.known_frac == 1.0 for r in got.collect())


def test_ingest_admit_sql_equals_streaming_twin(env, spark,
                                                tmp_path_factory):
    """The full streaming admission decision (exact + LSH-CC + index
    rejection + span + bloom rejectors) as a SQL backfill op: RUN
    PIPELINE ingest_admit equals the Python dedup_batch_against_index
    on the same index/artifact, and the bloom option actually rejects."""
    from lightning_metastore_spark.operators.contamination import (
        build_ngram_bloom, save_ngram_bloom)
    from lightning_metastore_spark.streaming import ingest

    root = tmp_path_factory.mktemp("ingest_admit")
    idx = str(root / "idx")
    corpus = env.docs.filter("doc_id < 20")
    ingest.build_dedup_index(corpus, idx)
    bench = env.docs.filter("doc_id >= 35")
    bloom_path = str(root / "bloom")
    save_ngram_bloom(spark, build_ngram_bloom(bench, n=3, n_bits=1 << 16),
                     bloom_path)

    batch = env.docs.filter("doc_id >= 20")   # overlaps bench, not corpus
    got = env.ctx.sql(
        f"RUN PIPELINE ingest_admit ON {DOCS} "
        f"OPTIONS(index_dir '{idx}', threshold '0.5', "
        f"max_span_frac '0.9', bloom_path '{bloom_path}', "
        "bloom_threshold '0.5')")
    # the SQL op sees the whole DOCS table; mirror that on the Python side
    want = ingest.dedup_batch_against_index(
        spark, env.docs, idx, threshold=0.5, max_span_frac=0.9,
        bloom_path=bloom_path, bloom_threshold=0.5)
    assert _rows(got) == _rows(want) and got.count() > 0
    # bloom docs (the benchmark rows themselves) must be rejected
    admitted = {r.doc_id for r in got.collect()}
    assert not admitted & {r.doc_id for r in bench.collect()}
    # and docs already in the corpus index must be rejected too
    assert not admitted & {r.doc_id for r in corpus.collect()}

    # the fifth (reference-LM floor) rejector over SQL: same equality
    # contract; a permissive floor must not change the decision set
    from lightning_metastore_spark.operators.lm_filter import (
        train_bigram_lm)

    lm_path = str(root / "ref_lm")
    train_bigram_lm(corpus, lm_path)
    got2 = env.ctx.sql(
        f"RUN PIPELINE ingest_admit ON {DOCS} "
        f"OPTIONS(index_dir '{idx}', ref_lm_path '{lm_path}', "
        "min_ref_logprob '-50.0')")
    want2 = ingest.dedup_batch_against_index(
        spark, env.docs, idx, ref_lm_path=lm_path,
        min_ref_logprob=-50.0)
    assert _rows(got2) == _rows(want2) and got2.count() > 0

    # the sixth (crawl-frontier URL) rejector over SQL: source plays
    # the url column — colliding values dedup to the smallest id
    got3 = env.ctx.sql(
        f"RUN PIPELINE ingest_admit ON {DOCS} "
        f"OPTIONS(index_dir '{idx}', url_col 'source')")
    want3 = ingest.dedup_batch_against_index(
        spark, env.docs, idx, url_col="source")
    assert _rows(got3) == _rows(want3) and got3.count() > 0
    assert got3.count() < got2.count()   # url collisions rejected docs


def test_pq_train_encode_topk_roundtrip_sql(env, spark, tmp_path_factory):
    """Product quantization over SQL: train persists the codebook
    artifact, encode/topk reload it; both equal the Python API on the
    same data, and the ADC ranking excludes the query example."""
    from lightning_metastore_spark.operators import quantization

    path = str(tmp_path_factory.mktemp("pq_sql") / "books")
    stats = env.ctx.sql(
        f"RUN PIPELINE pq_train ON {EMB} "
        f"OPTIONS(save '{path}', m '8', k '8', iters '2')").collect()
    assert stats[0].m == 8 and stats[0].k == 8 and stats[0].dsub == 8

    B = quantization.load_pq_codebooks(spark, path)
    got = _rows(env.ctx.sql(
        f"RUN PIPELINE pq_encode ON {EMB} OPTIONS(load '{path}')"))
    assert got == _rows(quantization.pq_encode(env.emb, B))

    topk = env.ctx.sql(
        f"RUN PIPELINE pq_topk ON {EMB} "
        f"OPTIONS(load '{path}', query_vec_id '3', topk '5')").collect()
    assert len(topk) == 5 and all(r.neighbor_id != 3 for r in topk)
    q = env.emb.filter("vec_id = 3").first()["embedding"]
    want = quantization.pq_topk(
        quantization.pq_encode(env.emb.filter("vec_id != 3"), B), B, q,
        topk=5).collect()
    assert sorted(map(repr, topk)) == sorted(map(repr, want))

    # IVF-PQ over SQL: coarse centroids as a registered table, full
    # probe coverage == plain pq_topk
    from lightning_metastore_spark.operators.similarity import (
        kmeans_centroids)

    cents = kmeans_centroids(env.emb, k=3)
    cents.write.mode("overwrite").parquet(str(env.root / "ds" / "cents"))
    ivf = env.ctx.sql(
        f"RUN PIPELINE ivf_pq_topk ON {EMB} "
        f"OPTIONS(load '{path}', centroids '{NS}.cents', "
        "query_vec_id '3', topk '5', nprobe '3')").collect()
    assert sorted(map(repr, ivf)) == sorted(map(repr, want))


def test_contamination_report_sql(env):
    """Span-level contamination attribution through SQL equals the
    Python API (two-table TABLE option, self-check: docs vs their own
    first rows as the 'benchmark')."""
    from lightning_metastore_spark.operators.contamination import (
        contamination_report)

    got = env.ctx.sql(
        f"RUN PIPELINE contamination_report ON {DOCS} "
        f"OPTIONS(bench '{DOCS}', n '4', max_grams '3')")
    want = contamination_report(env.docs, env.docs, n=4, max_grams=3)
    assert _rows(got) == _rows(want) and got.count() > 0


def test_corpus_report_sql(env):
    from lightning_metastore_spark.operators.pipeline import corpus_report

    got = env.ctx.sql(f"RUN PIPELINE corpus_report ON {DOCS} "
                      "OPTIONS(top_langs '3')")
    want = corpus_report(env.docs, top_langs=3)
    assert _rows(got) == _rows(want) and got.count() >= 9


def test_classifier_train_apply_roundtrip_sql(env):
    """classifier_train persists a weight artifact via OPTIONS(save);
    classifier_apply loads it and equals classifier_score with the
    trained table."""
    from lightning_metastore_spark.functions.text import classifier_score
    from lightning_metastore_spark.operators import classifier as clf

    p = str(env.root / "clf_artifact")
    out = env.ctx.sql(
        f"RUN PIPELINE classifier_train ON {DOCSL} "
        f"OPTIONS(label_col 'label', iters '2', lr '1.0', "
        f"n_buckets '64', save '{p}')")
    want = clf.train_logreg_classifier(env.docsl, "label", iters=2,
                                       lr=1.0, n_buckets=64)
    assert _rows(out) == _rows(want) and out.count() == 64

    applied = env.ctx.sql(
        f"RUN PIPELINE classifier_apply ON {DOCSL} "
        f"OPTIONS(load '{p}', n_buckets '64')")
    assert _rows(applied) == _rows(
        classifier_score(env.docsl, n_buckets=64, weights=want))
    assert applied.count() > 0


def test_lm_train_score_roundtrip_sql(env):
    """lm_train persists the reference-LM counts via OPTIONS(save);
    lm_score loads them and equals the Python API."""
    from lightning_metastore_spark.operators import lm_filter

    p = str(env.root / "lm_artifact")
    out = env.ctx.sql(f"RUN PIPELINE lm_train ON {DOCS2} "
                      f"OPTIONS(save '{p}')")
    row = out.first()
    assert row.path == p and row.n_total > 0 and row.vocab > 0

    scored = env.ctx.sql(f"RUN PIPELINE lm_score ON {DOCS} "
                         f"OPTIONS(load '{p}', lam '0.7')")
    assert _rows(scored) == _rows(
        lm_filter.score_with_bigram_lm(env.docs, p, lam=0.7))
    assert scored.count() > 0


def test_kn_lm_train_score_roundtrip_sql(env):
    """kn_lm_train persists the order-n Kneser-Ney artifact via
    OPTIONS(save); the SAME lm_score op auto-detects the layout and
    equals the Python API — one SQL surface for both LM families."""
    from lightning_metastore_spark.operators import lm_filter

    p = str(env.root / "kn_artifact")
    out = env.ctx.sql(f"RUN PIPELINE kn_lm_train ON {DOCS2} "
                      f"OPTIONS(save '{p}', order '3', min_count '1', "
                      f"discount '0.75')")
    row = out.first()
    assert row.path == p and row.order == 3
    assert row.vocab > 0 and row.u_types > 0 and row.t_total > 0

    scored = env.ctx.sql(f"RUN PIPELINE lm_score ON {DOCS} "
                         f"OPTIONS(load '{p}')")
    assert _rows(scored) == _rows(
        lm_filter.score_with_kn_lm(env.docs, p))
    assert scored.count() > 0


def test_multimodal_ops_sql(env, spark, tmp_path_factory):
    """The multimodal plumbing over SQL: as_binary adapts documents to
    (id, content) binary rows; video_frames fans out deterministic
    frames (the stub path on non-AVI payloads); image_dhash emits one
    64-bit perceptual hash per row — each equal to its Python twin."""
    from lightning_metastore_spark.sources import multimodal as mm

    out_dir = tmp_path_factory.mktemp("mm_bin_ds")
    env.ctx.sql(f"REGISTER PARQUET DATASOURCE mmb "
                f"OPTIONS(path '{out_dir}') "
                "NAMESPACE lightning.datasource.file")
    env.ctx.sql(f"RUN PIPELINE as_binary ON {DOCS} "
                "SINK lightning.datasource.file.mmb.bin")
    bint = "lightning.datasource.file.mmb.bin"
    want_bin = mm.documents_as_binary(env.docs)
    got_bin = env.ctx.sql(f"SELECT * FROM {bint}")
    assert _rows(got_bin) == _rows(want_bin)

    got_f = env.ctx.sql(f"RUN PIPELINE video_frames ON {bint} "
                        "OPTIONS(n_frames '2')")
    want_f = mm.sample_video_frames(want_bin, n_frames=2)
    assert _rows(got_f) == _rows(want_f) and got_f.count() > 0

    got_h = env.ctx.sql(f"RUN PIPELINE image_dhash ON {bint}")
    want_h = mm.image_dhash(want_bin)
    assert _rows(got_h) == _rows(want_h)
