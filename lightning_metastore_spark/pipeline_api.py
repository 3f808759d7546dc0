"""The LLM-data-pipeline operator surface, re-exported as one namespace.

Everything a training-data pipeline needs, each a DataFrame-in /
DataFrame-out program documented (with its 100 TB shuffle shape) in its
home module:

    from lightning_metastore_spark import pipeline_api as P
    pairs    = P.minhash_lsh_pairs(docs, threshold=0.8)
    clusters = P.connected_components(pairs, docs)
    curated  = P.curate_corpus(docs)

Dedup:        exact_dedup, jaccard_pairs, minhash_lsh_pairs,
              simhash_pairs, embedding_neardup_pairs_blocked,
              connected_components, corpus_dup_spans, remove_dup_spans,
              incremental_minhash_pairs, minhash_signatures,
              minhash_band_buckets, semantic_dedup,
              semantic_dedup_kmeans, cdc_chunks + cdc_dup_stats
              (content-defined chunk dedup), span_index +
              span_batch_against_index (incremental exact-substring),
              dedup_keep (cluster -> canonical representative ->
              filtered corpus, min-id or best-score keep rule)
Similarity:   brute_force_topk, ivf_topk, kmeans_centroids,
              assign_cells, save_ivf_index / load_ivf_index
              (cell-partitioned serving artifact),
              refresh_topk (incremental, base never rescanned)
Text quality: token_counts, quality_features, lang_id, redact_pii,
              tfidf_top_terms, unigram_logprob, bigram_logprob,
              classifier_score (+ train_logreg_classifier — exact
              distributed GD training with save/load artifacts),
              fingerprint, repetition_features,
              gopher_quality_rules (the Gopher App. A1.1 document
              filter set at published thresholds),
              bm25_scores, phrase_search, zipf_fit,
              encoding_anomalies, entity_counts, domain_profile
Tokenizing:   build_vocab, encode_token_stats, chunk_documents,
              learn_bpe_merges (batch_m frequency-batched),
              apply_bpe_merges, bpe_vocab + encode_bpe_ids,
              train_unigram_lm, apply_unigram_lm,
              save/load artifacts for both tokenizers,
              tokenizer_fertility (per-language tokens/word +
              chars/token audit of a trained tokenizer)
Cleaning:     remove_boilerplate_lines, dedup_lines_within_doc,
              c4_line_clean (C4's line/page cleaning rules at the
              published thresholds — Raffel et al. 2020 §2.2),
              normalize_text (Unicode NFC/NFKC + control/whitespace
              canonicalization), html_extract + html_title (HTML ->
              text with link-density boilerplate features),
              url_canonicalize + url_dedup (crawl-frontier URL
              canonical form + smallest-id URL-level dedup)
Hygiene:      contamination_overlap + contamination_report (which
              grams hit — the audit view), build_ngram_bloom /
              bloom_contamination,
              train_bigram_lm + score_with_bigram_lm (CCNet-style
              reference-corpus perplexity filter, parquet artifacts),
              train_kn_lm + score_with_kn_lm (order-n Kneser-Ney,
              the KenLM family) + score_with_reference_lm (either
              artifact, layout auto-detected),
              perplexity_buckets (CCNet head/middle/tail per group)
Sampling:     mixture_resample, temperature_resample (XLM/mT5
              tau-smoothing), epoch_schedule (per-group epochs +
              residual for up-sampled mixtures), stratified_fixed_n,
              weighted_sample_n (A-ES, without replacement),
              quantile_normalize (per-group percentile rank),
              budget_select (token-budget prefix selection),
              dsir_select (DSIR importance resampling toward a
              target corpus, deterministic Gumbel-top-k),
              bucket_resample (per-bucket deterministic thinning —
              the CCNet head/middle/tail terminal step)
Retrieval:    rrf_fuse (Reciprocal Rank Fusion),
              hybrid_search (BM25 + dense cosine, brute or IVF),
              mine_hard_negatives (denoised DPR/RocketQA-style
              hard negatives for contrastive retriever training)
Skyline:      skyline, skyline_per_group (Pareto-optimal sets)
Frequency:    heavy_hitters (space-saving sketch -> exact verify)
Packing:      packed_offsets, greedy_pack_bins
Embeddings:   scalar_quantize_stats, random_project,
              norm_outliers (robust norm screen),
              power_iteration_pca + apply_pca (distributed top-k PCA),
              pq_train / pq_encode / pq_topk + save/load codebooks
              (FAISS-style product quantization: m-byte codes, ADC
              lookup-table serving), ivf_pq_topk (cell-pruned IVF-PQ)
Temporal:     asof_join, range_join, hypertable_rollup,
              gap_filled_hourly, lttb_downsample, rolling_zscore,
              funnel_counts, sessionize, rolling_active_users
              (DAU/WAU), retention_cohorts
Graph:        pagerank (power iteration over edge lists),
              triangle_counts (oriented-wedge join),
              label_propagation (LPA communities)
Multimodal:   image_dhash, dhash_neardup_pairs (perceptual image
              dedup), frame_audio + audio_features (speech windowing
              and batched-DSP front end);
              decode/feature/resize live in sources.multimodal
Layout:       write_range_clustered, write_zorder_clustered,
              file_column_ranges, write_training_shards,
              compact_parquet (small-file maintenance),
              table_stats (ANALYZE-style per-column catalog stats)
Composed:     curate_corpus, CurationConfig,
              corpus_report (dataset-card summary),
              corpus_diff (snapshot-to-snapshot versioning audit),
              corpus_drift (token-distribution JS/KL/L1 divergence
              between snapshots + most-drifted tokens)
Streaming:    lightning_metastore_spark.streaming.events (windowed
              aggregation, stateful sessionizer, stateful funnel,
              stateful rolling z-score, stateful heavy hitters,
              attribution join);
              lightning_metastore_spark.streaming.ingest (corpus
              ingestion with incremental dedup: build_dedup_index,
              dedup_batch_against_index, start_dedup_ingest_sink)
"""

from __future__ import annotations

from lightning_metastore_spark.functions.text import (  # noqa: F401
    bigram_logprob,
    domain_profile,
    encoding_anomalies,
    entity_counts,
    phrase_search,
    zipf_fit,
    bm25_scores,
    build_vocab,
    classifier_score,
    encode_token_stats,
    fingerprint,
    gopher_quality_rules,
    lang_id,
    quality_features,
    redact_pii,
    repetition_features,
    tfidf_top_terms,
    token_counts,
    unigram_logprob,
)
from lightning_metastore_spark.functions.html import (  # noqa: F401
    html_extract,
    html_title,
    url_canonicalize,
    url_dedup,
)
from lightning_metastore_spark.operators.classifier import (  # noqa: F401
    load_classifier_weights,
    save_classifier_weights,
    train_logreg_classifier,
)
from lightning_metastore_spark.operators.lm_filter import (  # noqa: F401
    perplexity_buckets,
    score_with_bigram_lm,
    score_with_kn_lm,
    score_with_reference_lm,
    train_bigram_lm,
    train_kn_lm,
)
from lightning_metastore_spark.operators.bpe import (  # noqa: F401
    apply_bpe_merges,
    bpe_vocab,
    encode_bpe_ids,
    learn_bpe_merges,
    load_bpe_merges,
    save_bpe_merges,
    tokenizer_fertility,
)
from lightning_metastore_spark.operators.chunking import (  # noqa: F401
    chunk_documents,
)
from lightning_metastore_spark.operators.cleaning import (  # noqa: F401
    c4_line_clean,
    dedup_lines_within_doc,
    normalize_text,
    remove_boilerplate_lines,
)
from lightning_metastore_spark.operators.contamination import (  # noqa: F401
    bloom_contamination,
    bloom_fp_rate,
    build_ngram_bloom,
    contamination_overlap,
    contamination_report,
    load_ngram_bloom,
    save_ngram_bloom,
)
from lightning_metastore_spark.operators.dedup import (  # noqa: F401
    cdc_chunks,
    cdc_dup_stats,
    connected_components,
    corpus_dup_spans,
    dedup_keep,
    remove_dup_spans,
    span_batch_against_index,
    span_index,
    embedding_neardup_pairs_blocked,
    exact_dedup,
    incremental_minhash_pairs,
    jaccard_pairs,
    minhash_band_buckets,
    minhash_lsh_pairs,
    minhash_signatures,
    semantic_dedup,
    semantic_dedup_kmeans,
    shingles,
    simhash_pairs,
)
from lightning_metastore_spark.operators.heavy_hitters import (  # noqa: F401
    heavy_hitters,
)
from lightning_metastore_spark.operators.layout import (  # noqa: F401
    compact_parquet,
    file_column_ranges,
    table_stats,
    write_range_clustered,
    write_training_shards,
    write_zorder_clustered,
)
from lightning_metastore_spark.operators.packing import (  # noqa: F401
    greedy_pack_bins,
    packed_offsets,
)
from lightning_metastore_spark.operators.pipeline import (  # noqa: F401
    CurationConfig,
    corpus_diff,
    corpus_drift,
    corpus_report,
    curate_corpus,
)
from lightning_metastore_spark.operators.quantization import (  # noqa: F401
    apply_pca,
    ivf_pq_topk,
    load_pq_codebooks,
    norm_outliers,
    power_iteration_pca,
    pq_encode,
    pq_topk,
    pq_train,
    random_project,
    save_pq_codebooks,
    scalar_quantize_stats,
)
from lightning_metastore_spark.operators.retrieval import (  # noqa: F401
    hybrid_search,
    mine_hard_negatives,
    rrf_fuse,
)
from lightning_metastore_spark.operators.sampling import (  # noqa: F401
    bucket_resample,
    budget_select,
    dsir_select,
    epoch_schedule,
    mixture_resample,
    quantile_normalize,
    stratified_fixed_n,
    temperature_resample,
    weighted_sample_n,
)
from lightning_metastore_spark.sources.multimodal import (  # noqa: F401
    audio_features,
    dhash_neardup_pairs,
    frame_audio,
    image_dhash,
)
from lightning_metastore_spark.operators.skyline import (  # noqa: F401
    skyline,
    skyline_per_group,
)
from lightning_metastore_spark.operators.similarity import (  # noqa: F401
    assign_cells,
    brute_force_topk,
    ivf_topk,
    kmeans_centroids,
    load_ivf_index,
    refresh_topk,
    save_ivf_index,
)
from lightning_metastore_spark.operators.graph import (  # noqa: F401
    label_propagation,
    pagerank,
    triangle_counts,
)
from lightning_metastore_spark.operators.unigram_lm import (  # noqa: F401
    apply_unigram_lm,
    train_unigram_lm,
)
from lightning_metastore_spark.operators.temporal import (  # noqa: F401
    asof_join,
    funnel_counts,
    gap_filled_hourly,
    hypertable_rollup,
    lttb_downsample,
    range_join,
    retention_cohorts,
    rolling_active_users,
    rolling_zscore,
    sessionize,
)
