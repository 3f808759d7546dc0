"""End-to-end training-data preparation: the session's operators
composed the way a real pipeline chains them — curation -> dedup ->
chunking -> tokenizer training/application -> packing -> deterministic
shard export. Asserts the invariants a downstream trainer depends on."""

from __future__ import annotations

import glob
import sys

sys.path.insert(0, "/root/repo")

from lightning_metastore_spark import pipeline_api as P  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_full_training_data_flow(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_in = docs.count()

    # 1. curate: quality/lang/dedup gates with auditable drop reasons
    curated = P.curate_corpus(docs).filter("keep").select("doc_id", "text")
    n_curated = curated.count()
    assert 0 < n_curated < n_in

    # 2. intra-doc cleanup composes (no-op on single-line docs)
    cleaned = P.dedup_lines_within_doc(curated).select("doc_id", "text")
    assert cleaned.count() == n_curated

    # 3. chunk for retrieval + exact chunk-level dedup via fingerprints
    chunks = P.chunk_documents(cleaned, chunk_size=32, overlap=8)
    n_chunks = chunks.count()
    uniq_chunks = chunks.dropDuplicates(["chunk_md5"])
    assert 0 < uniq_chunks.count() <= n_chunks

    # 4. train a BPE tokenizer on the curated corpus and apply it
    merges = P.learn_bpe_merges(cleaned, n_merges=6)
    assert merges
    seg = P.apply_bpe_merges(cleaned, merges)
    assert seg.count() == n_curated
    assert seg.filter("n_bpe_tokens <= 0").count() == 0

    # 5. packing: offsets cover the curated token stream exactly
    packed = P.packed_offsets(cleaned, capacity=256)
    rows = packed.collect()
    total = sum(r.n_tokens for r in rows)
    assert max(r.end_offset for r in rows) == total

    # 6. deterministic shard export of the curated set
    out = str(tmp_path / "shards")
    P.write_training_shards(cleaned, out, n_shards=4, seed="e2e")
    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) == 4
    exported = spark.read.parquet(out)
    assert exported.count() == n_curated
    assert sorted(r.doc_id for r in exported.select("doc_id").collect()) \
        == sorted(r.doc_id for r in cleaned.select("doc_id").collect())
