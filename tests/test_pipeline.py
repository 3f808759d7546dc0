"""End-to-end corpus curation pipeline tests."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from lightning_metastore_spark.operators.pipeline import (  # noqa: E402
    CurationConfig,
    curate_corpus,
)

from tests.conftest import SF_DIR  # noqa: E402


def test_curate_corpus_on_driver_documents(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = curate_corpus(docs, CurationConfig(min_quality=0.0)).collect()
    assert len(out) == docs.count()  # filtered rows kept, flagged
    by_id = {r.doc_id: r for r in out}
    kept = [r for r in out if r.keep]
    dropped = [r for r in out if not r.keep]
    # near-dup pairs exist in this corpus -> some docs drop as near_duplicate
    assert any(r.drop_reason == "near_duplicate" for r in dropped)
    assert all(r.drop_reason is None for r in kept)
    # splits are deterministic and all three appear
    assert {r.split for r in out} == {"train", "val", "test"}
    # cluster survivors: exactly one kept doc per cluster among kept rows
    survivors_per_cluster = {}
    for r in kept:
        survivors_per_cluster.setdefault(r.cluster_id, 0)
        survivors_per_cluster[r.cluster_id] += 1
    assert all(v == 1 for v in survivors_per_cluster.values())
    # determinism: second run identical
    out2 = curate_corpus(docs, CurationConfig(min_quality=0.0)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_curate_corpus_single_materialization(spark):
    """The `cleaned` subtree is eagerly localCheckpointed: the returned
    plan must read it as a leaf (ExistingRDD), never re-embedding the
    boilerplate-removal pipeline (posexplode etc.) — that recomputation
    was ~5 redundant full passes before the checkpoint."""
    import io
    from contextlib import redirect_stdout

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    df = curate_corpus(docs, CurationConfig(min_quality=0.0))
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "ExistingRDD" in plan       # checkpoint leaf is what's scanned
    assert "posexplode" not in plan    # boilerplate subtree not replanned


def test_curate_corpus_micro_reasons(spark):
    docs = spark.createDataFrame([
        (1, "the quick brown fox jumps over a lazy dog " * 5),
        (2, "the quick brown fox jumps over a lazy dog " * 5),  # exact dup
        (3, "x"),                                               # low quality
    ], ["doc_id", "text"])
    out = {r.doc_id: r for r in
           curate_corpus(docs, CurationConfig(min_quality=0.45,
                                              boilerplate_max_df=10)).collect()}
    assert out[1].keep
    assert not out[2].keep and out[2].drop_reason == "exact_duplicate"
    assert not out[3].keep and out[3].drop_reason == "low_quality"


def test_curation_optional_repetition_and_contamination_stages(spark):
    from pyspark.sql import functions as F
    from lightning_metastore_spark.operators.pipeline import (
        CurationConfig, curate_corpus)

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    cfg = CurationConfig(min_quality=0.0, use_minhash=False,
                         max_dup_2gram_frac=0.5, max_contam_frac=0.9)
    out = curate_corpus(docs, cfg, benchmark=bench).collect()
    assert len(out) == docs.count()
    reasons = {r.drop_reason for r in out}
    # both new stages actually fire on this corpus at these thresholds
    assert "repetitive" in reasons or "contaminated" in reasons
    # keep is consistent with its reason
    assert all((r.drop_reason is None) == bool(r.keep) for r in out)
    # default config (stages off) is unchanged: no new reasons appear
    base = curate_corpus(docs, CurationConfig(min_quality=0.0,
                                              use_minhash=False)).collect()
    assert {r.drop_reason for r in base} <= {
        None, "exact_duplicate", "near_duplicate", "low_quality", "language"}


def test_curation_row_count_invariant_to_stages(spark):
    """A doc with degenerate text (no repetition-features row) must be
    flagged, not silently dropped, when the repetition stage is on:
    output row count is invariant to which stages are enabled."""
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over a lazy dog " * 5),
         (2, "word " * 80),        # repetitive
         (3, "")],                 # degenerate: no repetition row
        "doc_id long, text string")
    base = curate_corpus(docs, CurationConfig(
        min_quality=0.0, boilerplate_max_df=10)).collect()
    rep = curate_corpus(docs, CurationConfig(
        min_quality=0.0, boilerplate_max_df=10,
        max_dup_2gram_frac=0.5)).collect()
    assert len(base) == len(rep) == 3
    by_id = {r.doc_id: r for r in rep}
    assert not by_id[2].keep and by_id[2].drop_reason == "repetitive"
    assert 3 in by_id  # degenerate doc present, coalesced to non-repetitive


def test_curation_classifier_and_perplexity_stages(spark):
    """The model-score stages fire with aggressive thresholds, stay off
    by default, and never change the output row count."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    cfg = CurationConfig(min_quality=0.0, use_minhash=False,
                         min_classifier_score=0.55,   # aggressive floor
                         min_avg_logprob=-7.0)
    out = curate_corpus(docs, cfg).collect()
    assert len(out) == n
    reasons = {r.drop_reason for r in out}
    assert ("low_classifier_score" in reasons
            or "high_perplexity" in reasons)
    assert all((r.drop_reason is None) == bool(r.keep) for r in out)


def test_pipeline_api_facade(spark):
    """The one-namespace operator surface resolves and runs."""
    from lightning_metastore_spark import pipeline_api as P

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    assert P.exact_dedup(docs).count() > 0
    assert P.token_counts(docs).columns == ["doc_id", "n_chars", "n_tokens",
                                            "n_subwords"]
    public = [n for n in dir(P) if not n.startswith("_") and n != "annotations"]
    assert len(public) >= 28


def test_curation_dup_span_stage(spark):
    """Optional exact-substring stage: a doc sharing a long prefix with
    another (but not near-dup enough to cluster) is rejected with
    reason dup_spans; row count stays invariant and the default config
    is unaffected."""
    shared = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [(1, shared + " unique alpha tail content here now ok yes"),
         (2, shared + " different omega ending words go here today"),
         (3, "completely original text with no overlap anywhere at all"),
         (4, "")],
        "doc_id long, text string")
    cfg = CurationConfig(min_quality=0.0, boilerplate_max_df=10,
                         use_minhash=False, near_dup_threshold=0.95,
                         max_dup_span_frac=0.4, dup_span_k=5)
    out = {r.doc_id: r for r in curate_corpus(docs, cfg).collect()}
    assert len(out) == 4
    # docs 1 and 2 share a 10-token prefix -> 6 duplicated 5-windows of
    # ~14 total each -> frac > 0.4 -> rejected
    assert out[1].drop_reason == "dup_spans" and not out[1].keep
    assert out[2].drop_reason == "dup_spans"
    assert out[3].keep and out[3].drop_reason is None
    assert 4 in out  # degenerate doc coalesces to non-duplicated
    # stage off: same corpus, no dup_spans reason
    base = curate_corpus(docs, CurationConfig(
        min_quality=0.0, boilerplate_max_df=10, use_minhash=False,
        near_dup_threshold=0.95)).collect()
    assert "dup_spans" not in {r.drop_reason for r in base}


def test_curate_normalize_stage_collapses_unicode_variants(spark):
    """normalize_form='NFC': a decomposed-Unicode rendering of an
    existing doc becomes an exact duplicate (dropped with the dedup
    reason), the surviving text is the normalized form, and row count
    stays invariant to the stage being on."""
    from lightning_metastore_spark.operators.pipeline import (
        CurationConfig, curate_corpus)

    docs = spark.createDataFrame(
        [(1, "quality café document with several words here"),
         (2, "quality café document with several words here"),
         (3, "another quite different document about query engines")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in curate_corpus(
        docs, CurationConfig(min_quality=0.0,
                             allowed_langs=("en", "und"),
                             normalize_form="NFC")).collect()}
    assert len(out) == 3                       # row-count invariance
    assert out[1].keep and not out[2].keep     # NFC made 2 a dup of 1
    assert "café" in out[2].text          # text IS normalized
    # without normalization both survive (byte-different)
    raw = {r.doc_id: r for r in curate_corpus(
        docs, CurationConfig(min_quality=0.0,
                             allowed_langs=("en", "und"))).collect()}
    assert raw[1].keep and raw[2].keep


def test_corpus_report_matches_python_twin(spark):
    """The dataset-card summary equals a from-scratch Python model on a
    crafted corpus (size, token stats, exact-dup rate, quality mean,
    language shares), and runs on the driver documents table."""
    from lightning_metastore_spark.functions.text import (
        lang_id, quality_features)
    from lightning_metastore_spark.operators.pipeline import corpus_report

    rows = [
        (1, "the quick brown fox and the lazy dog run the field"),
        (2, "the quick brown fox and the lazy dog run the field"),  # dup
        (3, "der schnelle braune fuchs und der faule hund laufen"),
        (4, "one two three"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    rep = {r.metric: r for r in corpus_report(docs).collect()}

    toks = [len(t.split()) for _, t in rows]
    assert rep["n_docs"].value_num == 4.0
    assert rep["total_tokens"].value_num == float(sum(toks))
    assert rep["avg_tokens"].value_num == round(sum(toks) / 4, 6)
    assert rep["n_unique_texts"].value_num == 3.0
    assert rep["exact_dup_frac"].value_num == 0.25
    q = [r.quality_score for r in quality_features(docs).collect()]
    assert abs(rep["avg_quality_score"].value_num
               - round(sum(q) / len(q), 6)) < 1e-6
    langs = {}
    for r in lang_id(docs).collect():
        langs[r.pred_lang] = langs.get(r.pred_lang, 0) + 1
    for lg, n in langs.items():
        assert rep[f"lang:{lg}"].value_num == round(n / 4, 6)
        assert rep[f"lang:{lg}"].value_str == lg

    big = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = corpus_report(big).collect()
    assert {r.metric for r in out} >= {"n_docs", "p50_tokens",
                                       "p95_tokens", "exact_dup_frac"}
    assert {r.metric: r.value_num for r in out}["n_docs"] == 500.0


def test_corpus_diff_matches_python_twin(spark):
    """Row-level snapshot diff equals a dict-based Python model on a
    crafted pair, and the self-diff of a real table is all-unchanged."""
    import hashlib

    from lightning_metastore_spark.operators.pipeline import corpus_diff

    old_rows = {1: "a b c", 2: "x y", 3: "keep me", 5: None}
    new_rows = {2: "x y z w", 3: "keep me", 4: "brand new", 5: ""}
    old = spark.createDataFrame(sorted(old_rows.items()),
                                "doc_id long, text string")
    new = spark.createDataFrame(sorted(new_rows.items()),
                                "doc_id long, text string")
    got = {r.doc_id: r for r in corpus_diff(old, new).collect()}

    def fp(t):
        return hashlib.md5((t or "").encode()).hexdigest()

    def ntok(t):
        return len((t or "").split())

    for i in sorted(set(old_rows) | set(new_rows)):
        r = got[i]
        if i not in old_rows:
            exp = "added"
        elif i not in new_rows:
            exp = "removed"
        elif fp(old_rows[i]) == fp(new_rows[i]):
            exp = "unchanged"
        else:
            exp = "changed"
        assert r.status == exp, (i, r.status, exp)
        assert r.old_fp == (fp(old_rows[i]) if i in old_rows else None)
        assert r.new_fp == (fp(new_rows[i]) if i in new_rows else None)
        assert r.token_delta == (ntok(new_rows.get(i))
                                 - ntok(old_rows.get(i)))
    # NULL text fingerprints like empty text (doc 5: None -> "")
    assert got[5].status == "unchanged"

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet")
    self_diff = corpus_diff(docs, docs)
    assert self_diff.filter("status <> 'unchanged'").count() == 0
    assert self_diff.count() == docs.count()


def test_corpus_drift_matches_python_twin(spark):
    """Divergence metrics equal a pure-Python model with identical
    IEEE term order + decimal freezing; self-drift is exactly zero."""
    import math
    import re
    from decimal import ROUND_HALF_UP, Decimal

    from lightning_metastore_spark.operators.pipeline import corpus_drift

    old_rows = [(1, "the cat sat on the mat"), (2, "dogs chase the cat"),
                (3, "birds fly high")]
    new_rows = [(1, "the cat sat on the mat"), (2, "robots chase the cat"),
                (4, "robots compute fast robots")]
    old = spark.createDataFrame(old_rows, "doc_id long, text string")
    new = spark.createDataFrame(new_rows, "doc_id long, text string")
    got = {r.metric: r for r in corpus_drift(old, new, top_k=5).collect()}

    def cnt(rows):
        c = {}
        for _, t in rows:
            for w in re.split(r"\s+", t.lower()):
                c[w] = c.get(w, 0) + 1
        return c

    co, cn = cnt(old_rows), cnt(new_rows)
    vocab = sorted(set(co) | set(cn))
    v = len(vocab)
    do, dn = float(sum(co.values()) + v), float(sum(cn.values()) + v)

    def frz(x):
        return Decimal(repr(x)).quantize(Decimal("1e-15"),
                                         rounding=ROUND_HALF_UP)

    kl_pq = kl_qp = js_p = js_q = l1 = Decimal(0)
    deltas = {}
    for t in vocab:
        p = (co.get(t, 0) + 1.0) / do
        q = (cn.get(t, 0) + 1.0) / dn
        m = (p + q) / 2.0
        kl_pq += frz(p * math.log(p / q))
        kl_qp += frz(q * math.log(q / p))
        js_p += frz(p * math.log(p / m))
        js_q += frz(q * math.log(q / m))
        l1 += frz(abs(q - p))
        deltas[t] = round(q - p, 9)

    assert got["kl_old_new"].value_num == round(float(kl_pq), 9)
    assert got["kl_new_old"].value_num == round(float(kl_qp), 9)
    assert got["js_divergence"].value_num == round(
        0.5 * float(js_p) + 0.5 * float(js_q), 9)
    assert got["l1_distance"].value_num == round(float(l1), 9)
    assert got["vocab_old"].value_num == float(len(co))
    assert got["vocab_new"].value_num == float(len(cn))
    assert got["vocab_union"].value_num == float(v)
    top = sorted(deltas.items(),
                 key=lambda kv: (-abs(kv[1]), kv[0]))[:5]
    for tok, d in top:
        assert got[f"drift:{tok}"].value_num == d
        assert got[f"drift:{tok}"].value_str == tok
    assert got["js_divergence"].value_num > 0

    zero = {r.metric: r.value_num
            for r in corpus_drift(old, old, top_k=2).collect()}
    assert zero["js_divergence"] == 0.0 and zero["l1_distance"] == 0.0


def test_curate_corpus_html_and_ref_lm_stages(spark, tmp_path):
    """html_input extracts body text + rejects link-heavy chrome pages
    as 'link_heavy'; ref_lm_path rejects reference-unlike docs as
    'ref_perplexity'; row count stays invariant to enabled stages."""
    from lightning_metastore_spark.operators.lm_filter import (
        train_bigram_lm)

    body = ("<html><head><title>t</title></head><body><p>%s</p>"
            "<a href='/'>home</a></body></html>")
    nav = ("<html><body>" + "".join(
        f"<a href='/{i}'>section link number {i}</a>" for i in range(12))
        + "<p>ok</p></body></html>")
    rows = ([(i, body % f"the quick brown fox tells story number {i} "
              f"with plenty of distinct prose words {i * 17}")
             for i in range(8)]
            + [(100, nav)])
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    ref = spark.createDataFrame(
        [(i, f"the quick brown fox tells story number {i}")
         for i in range(5)], "doc_id long, text string")
    lm_path = str(tmp_path / "curate_ref_lm")
    train_bigram_lm(ref, lm_path)

    base = curate_corpus(docs, CurationConfig(
        min_quality=0.0, html_input=True))
    out = curate_corpus(docs, CurationConfig(
        min_quality=0.0, html_input=True, max_link_density=0.5,
        ref_lm_path=lm_path, min_ref_logprob=-4.0))
    got = {r.doc_id: r for r in out.collect()}
    assert out.count() == base.count() == len(rows)

    # the nav page is extracted (tags gone) and rejected for link mass
    assert got[100].drop_reason == "link_heavy"
    assert "<a" not in got[100].text and "ok" in got[100].text
    # prose pages: extracted body text, no html reason
    kept_reasons = {got[i].drop_reason for i in range(8)}
    assert "link_heavy" not in kept_reasons
    # a junk doc added to the same flow fails the reference floor
    docs2 = docs.union(spark.createDataFrame(
        [(200, body % ("zxq vbnm qwerty " * 8))],
        "doc_id long, text string"))
    out2 = {r.doc_id: r for r in curate_corpus(docs2, CurationConfig(
        min_quality=0.0, html_input=True,
        ref_lm_path=lm_path, min_ref_logprob=-4.0)).collect()}
    assert out2[200].drop_reason == "ref_perplexity"


def test_curate_corpus_accepts_kn_artifact_unchanged(spark, tmp_path):
    """The r11 verdict contract: swapping the reference-LM family
    (bigram -> order-n Kneser-Ney) is a RETRAIN, not a pipeline
    change — the same ref_lm_path option consumes the KN artifact,
    and the keep decision still floors on avg_logprob."""
    from lightning_metastore_spark.operators.lm_filter import (
        score_with_kn_lm, train_kn_lm)

    rows = ([(i, f"the quick brown fox tells story number {i} "
              f"with plenty of distinct prose words {i * 17}")
             for i in range(6)]
            + [(200, "zxq vbnm qwerty asdf zxcv plok mnbv wert")])
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ref = spark.createDataFrame(
        [(i, f"the quick brown fox tells story number {i}")
         for i in range(5)], "doc_id long, text string")
    lm_path = str(tmp_path / "curate_kn_lm")
    train_kn_lm(ref, lm_path, order=3)

    scores = {r.doc_id: r.avg_logprob
              for r in score_with_kn_lm(docs, lm_path).collect()}
    floor = (scores[200] + min(scores[i] for i in range(6))) / 2.0
    assert scores[200] < floor < min(scores[i] for i in range(6))

    out = {r.doc_id: r for r in curate_corpus(docs, CurationConfig(
        min_quality=0.0, ref_lm_path=lm_path,
        min_ref_logprob=floor)).collect()}
    assert len(out) == len(rows)
    assert out[200].drop_reason == "ref_perplexity"
    assert all(out[i].drop_reason != "ref_perplexity" for i in range(6))


def test_curate_corpus_ccnet_bucket_stage(spark, tmp_path):
    """The full CCNet terminal recipe as ONE curate config: reference-LM
    score -> per-pred_lang head/middle/tail buckets -> per-bucket
    deterministic thinning. The stage's keep decisions bit-match the
    composable ops run by hand; row count stays invariant; unscored
    docs survive; misconfiguration raises."""
    import pytest

    from lightning_metastore_spark.operators import sampling
    from lightning_metastore_spark.operators.lm_filter import (
        perplexity_buckets, score_with_reference_lm, train_kn_lm)

    rows = [(i, f"the quick brown fox tells story number {i} "
             f"with plenty of distinct prose words {i * 17}")
            for i in range(24)] + [(100, "one")]   # unscored short doc
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    ref = spark.createDataFrame(
        [(i, f"the quick brown fox tells story number {i}")
         for i in range(5)], "doc_id long, text string")
    lm_path = str(tmp_path / "ccnet_kn")
    train_kn_lm(ref, lm_path, order=2)

    rates = {"head": 1.0, "middle": 0.5, "tail": 0.0}
    cfg = CurationConfig(min_quality=0.0, ref_lm_path=lm_path,
                         use_minhash=False, near_dup_threshold=0.99,
                         ccnet_bucket_rates=rates)
    out = {r.doc_id: r for r in curate_corpus(docs, cfg).collect()}
    assert len(out) == len(rows)                 # row-count invariant
    assert out[100].drop_reason != "ccnet_thinned"   # unscored doc

    # replay by hand with the composable ops on the same cleaned text
    from pyspark.sql import functions as F

    from lightning_metastore_spark.functions.text import lang_id

    scored = (score_with_reference_lm(docs, lm_path)
              .select("doc_id", F.col("avg_logprob").alias("ref_logprob"))
              .join(lang_id(docs).select("doc_id", "pred_lang"), "doc_id"))
    b = perplexity_buckets(scored, score_col="ref_logprob",
                           group_col="pred_lang")
    want = {r.doc_id: bool(r.kept)
            for r in sampling.bucket_resample(b, rates).collect()}
    assert any(not k for k in want.values())     # tail really thins
    for d, kept in want.items():
        if not kept:
            assert out[d].drop_reason == "ccnet_thinned", d
            assert not out[d].keep
        else:
            assert out[d].drop_reason != "ccnet_thinned", d

    with pytest.raises(ValueError, match="ccnet_bucket_rates requires"):
        curate_corpus(docs, CurationConfig(ccnet_bucket_rates=rates))
    with pytest.raises(ValueError, match="silently skip"):
        curate_corpus(docs, CurationConfig(ref_lm_path=lm_path))
    with pytest.raises(ValueError, match="min_ref_logprob requires"):
        curate_corpus(docs, CurationConfig(min_ref_logprob=-3.0))


def test_curate_corpus_url_dedup_stage(spark):
    """url_col rejects all but the smallest id per canonical URL as
    'url_duplicate' BEFORE content stages; NULL URLs always survive;
    row count stays invariant to the stage being enabled."""
    rows = [
        (1, "completely distinct prose about rivers and boats number one",
         "http://a.com/x?utm_source=nl"),
        (2, "a second unrelated document discussing mountain weather",
         "HTTP://A.com:80/x"),                  # same canonical as 1
        (3, "third text on the economics of medieval spice trading",
         "http://a.com/x#top"),                 # same canonical as 1
        (4, "fourth piece describing deep sea exploration vessels",
         "http://a.com/y"),
        (5, "fifth entry about the history of mechanical clocks", None),
        (6, "sixth note cataloguing varieties of alpine wildflowers",
         None),                                  # NULL: no dedup vs 5
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                       "url string")
    base = curate_corpus(docs, CurationConfig(min_quality=0.0,
                                              allowed_langs=("und", "en")))
    out = curate_corpus(docs, CurationConfig(min_quality=0.0,
                                             allowed_langs=("und", "en"),
                                             url_col="url"))
    assert out.count() == base.count() == len(rows)
    got = {r.doc_id: r for r in out.collect()}
    assert got[2].drop_reason == "url_duplicate"
    assert got[3].drop_reason == "url_duplicate"
    assert not got[2].keep and not got[3].keep
    # group min, the distinct-url doc and both NULL-url docs survive
    for i in (1, 4, 5, 6):
        assert got[i].drop_reason != "url_duplicate", i
        assert got[i].keep, i


def test_curate_corpus_url_dedup_is_sequenced_before_content_dedup(spark):
    """The C4 SEQUENCING contract (not just an AND-ed flag): a
    url-duplicate doc must not knock out the sole other copy of its
    text in exact dedup — doc2 loses on URL to doc1, doc3 carries the
    same TEXT as doc2 under a distinct URL and must survive."""
    rows = [
        (1, "first text about rivers and navigable boats in europe",
         "http://a.com/x"),
        (2, "a shared body of text that appears under two urls",
         "HTTP://A.com:80/x"),          # url-dup of 1, text B
        (3, "a shared body of text that appears under two urls",
         "http://b.org/y"),             # text B again, distinct url
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                       "url string")
    got = {r.doc_id: r for r in curate_corpus(
        docs, CurationConfig(min_quality=0.0,
                             allowed_langs=("und", "en"),
                             url_col="url")).collect()}
    assert got[2].drop_reason == "url_duplicate"
    assert got[1].keep and got[3].keep, \
        {i: (r.keep, r.drop_reason) for i, r in got.items()}


def test_curate_corpus_rejects_inconsistent_optional_configs(spark):
    import pytest as _pytest

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        curate_corpus(docs, CurationConfig(max_link_density=0.5))
    with _pytest.raises(ValueError):
        curate_corpus(docs, CurationConfig(ref_lm_path="/tmp/nope"))
    with _pytest.raises(ValueError):
        curate_corpus(docs, CurationConfig(min_ref_logprob=-3.0))


def test_fineweb_style_recipe_one_config(spark):
    """The FineWeb-shaped recipe — C4 URL-level dedup + the Gopher
    quality rules + Gopher repetition + minhash near-dup — as ONE
    curate_corpus config, each reject attributed to its published
    rule."""
    long_good = ("the steady rhythm of these long sentences keeps the "
                 "word count well above fifty and that gives the rule "
                 "set something real to measure with plenty of common "
                 "stop words spread through the text so the presence "
                 "test passes while every other ratio stays in range "
                 "and the final line carries the count past the floor")
    docs = spark.createDataFrame(
        [(1, long_good, "http://a.com/x"),
         (2, long_good + " tiny tail change", "http://a.com/x?#frag"),
         (3, "way too short for the gopher rules", "http://b.com/y"),
         (4, " ".join(["the of and that"] * 40), "http://c.com/z"),
         (5, long_good.replace("steady", "gentle"), "http://d.com/w")],
        "doc_id long, text string, url string")
    cfg = CurationConfig(min_quality=0.0, boilerplate_max_df=10,
                         use_minhash=False, near_dup_threshold=0.5,
                         url_col="url", use_gopher_rules=True,
                         max_dup_2gram_frac=0.5)
    out = {r.doc_id: r for r in curate_corpus(docs, cfg).collect()}
    assert len(out) == 5                       # row-count invariant
    assert out[1].keep and out[1].drop_reason is None
    assert out[2].drop_reason == "url_duplicate"   # C4 rule, first
    assert out[3].drop_reason == "gopher_rules"    # Gopher quality
    assert out[4].drop_reason in ("repetitive", "gopher_rules")
    assert not out[5].keep                     # near-dup of doc 1
    assert out[5].drop_reason == "near_duplicate"
