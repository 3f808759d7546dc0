"""Benchmark-contamination detection for training corpora.

The standard pre-training hygiene step: flag training documents whose
word n-grams overlap an evaluation benchmark's n-gram set (the
GPT-3/PaLM-style "13-gram overlap" decontamination rule, parameterized
n since this corpus's documents are short).

Scale design (100 TB corpus, eval-suite-sized benchmark): the benchmark
shingle set is tiny relative to the corpus — it is DISTINCT-ed and
broadcast, so the membership test is a map-side broadcast join against
the training shingle stream; one keyed aggregation per training doc
produces the overlap counts. No shuffle of the corpus beyond the per-doc
aggregate, no driver-side set.

Reference parity note: the reference has no contamination operators
(SURVEY.md §2.7 — it delegates all query surface to Spark); this module
is part of the driver-mandated LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lightning_metastore_spark.operators.dedup import shingles


def contamination_overlap(train: DataFrame, benchmark: DataFrame,
                          n: int = 3, flag_threshold: float = 0.5,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          sh_train: DataFrame | None = None,
                          sh_bench: DataFrame | None = None) -> DataFrame:
    """Per-training-doc benchmark n-gram overlap:
    (doc_id, n_shingles, n_contaminated, contam_frac, is_contaminated).

    A training document's distinct word n-grams are tested for
    membership in the benchmark's n-gram set; ``contam_frac`` is the
    contaminated fraction and ``is_contaminated`` flags docs at or above
    ``flag_threshold``. Documents shorter than n words contribute their
    whole text as one shingle (same convention as the dedup operators).
    Pass prebuilt ``sh_train``/``sh_bench`` (e.g. a persisted corpus
    shingle relation filtered by the train/bench predicate) to skip the
    tokenize/explode passes.
    """
    sh_t = sh_train if sh_train is not None \
        else shingles(train, n, text_col, id_col)
    sh_b = sh_bench if sh_bench is not None \
        else shingles(benchmark, n, text_col, id_col)
    bench_set = sh_b.select("shingle").distinct()
    hits = (sh_t.join(F.broadcast(bench_set), "shingle")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_contaminated")))
    counts = sh_t.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_shingles"))
    frac = F.coalesce(F.col("n_contaminated"), F.lit(0)) / F.col("n_shingles")
    return (counts.join(hits, id_col, "left")
            .select(F.col(id_col),
                    F.col("n_shingles").cast("long").alias("n_shingles"),
                    F.coalesce(F.col("n_contaminated"), F.lit(0))
                    .cast("long").alias("n_contaminated"),
                    F.round(frac, 6).alias("contam_frac"),
                    (frac >= F.lit(flag_threshold)).alias("is_contaminated")))


# ---------------------------------------------------------------------------
# Bloom-filter decontamination artifact
# ---------------------------------------------------------------------------
#
# contamination_overlap broadcasts the benchmark's DISTINCT shingle set —
# right for eval-suite-sized benchmarks, but a held-out-set membership
# test over billions of grams (e.g. "everything in the validation split
# of the web crawl") needs a bounded artifact. A Bloom filter gives a
# fixed-size bitmap with ZERO false negatives (a contaminated doc can
# never slip through) and a tunable false-positive rate (a clean doc is
# occasionally over-flagged — the safe direction for decontamination).


def _bloom_positions(shingle: str, k: int, n_bits: int) -> list:
    """k bit positions via Kirsch-Mitzenmacher double hashing over one
    md5 digest — deterministic across Python versions/platforms (no
    PYTHONHASHSEED dependence) and, deliberately, re-derivable by ANY
    engine with an md5() function: h1/h2 are the first/second 15 hex
    chars as integers (60 bits each — in int64 range everywhere),
    reduced mod n_bits BEFORE the stride walk so no intermediate
    exceeds k * n_bits. The JVM twin is ``_bloom_position_cols``; the
    DuckDB gate oracle re-derives the same positions in SQL — the
    filter's exact bit pattern (false positives included) is therefore
    engine-portable and hash-verifiable."""
    import hashlib

    h = hashlib.md5(shingle.encode("utf-8")).hexdigest()
    h1 = int(h[:15], 16) % n_bits
    h2 = (int(h[15:30], 16) | 1) % n_bits   # odd (n_bits is even)
    return [(h1 + i * h2) % n_bits for i in range(k)]


def _bloom_position_cols(shingle_col, k: int, n_bits: int):
    """JVM expression twin of ``_bloom_positions``: array<long> of the
    k bit positions, computed inside whole-stage codegen so neither the
    build nor the membership test runs per-string Python hashing."""
    h = F.md5(shingle_col)
    h1 = F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % n_bits
    h2 = (F.conv(F.substring(h, 16, 15), 16, 10).cast("long")
          .bitwiseOR(F.lit(1))) % n_bits
    return F.array(*[(h1 + F.lit(i) * h2) % F.lit(n_bits)
                     for i in range(k)])


def build_ngram_bloom(benchmark: DataFrame, n: int = 3,
                      n_bits: int = 1 << 20, k: int = 4,
                      text_col: str = "text",
                      id_col: str = "doc_id",
                      sh_bench: DataFrame | None = None) -> dict:
    """Build a Bloom-filter membership artifact over the benchmark's
    distinct word n-grams: {"bits", "n_bits", "k", "n", "n_grams"}.

    Distributed build, fully JVM until final assembly: the ``shingles``
    relation (identical semantics to ``contamination_overlap`` — no
    Python re-tokenization to drift) maps each gram to its k bit
    positions inside codegen, then ONE distributed ``bit_or``
    aggregation keyed on the 64-bit word index ORs every bit in place —
    the driver receives at most n_bits/64 (word, bits) rows, i.e.
    EXACTLY one bitmap's worth regardless of partition count (at
    n_bits = 2^33 for billions of grams that is 1 GiB once, never
    p x 1 GiB; there is no per-partition partial-bitmap round trip).
    Assembly is Arrow (``toPandas`` on the two-primitive-column word
    relation) into a single numpy scatter — no per-word Python Row
    objects, so driver cost is the bitmap itself plus one int64 column
    pass, not 10-50x it. At 100 TB the benchmark side is what grows;
    the filter stays fixed-size by construction. Pass ``sh_bench`` (a
    persisted shingle relation) to skip the tokenize/explode pass.
    """
    import numpy as np

    if n_bits % 8:
        raise ValueError("n_bits must be a multiple of 8")
    sh_b = (sh_bench if sh_bench is not None
            else shingles(benchmark, n, text_col, id_col)) \
        .select("shingle").distinct()

    pos = sh_b.select(F.explode(
        _bloom_position_cols(F.col("shingle"), k, n_bits)).alias("p"))
    pdf = (pos.select(
               F.shiftright(F.col("p"), 6).alias("w"),
               F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p & 63 AS INT))")
               .alias("m"))
           .groupBy("w")
           .agg(F.expr("bit_or(m)").alias("word"),
                F.count(F.lit(1)).alias("cnt"))
           .toPandas())
    # ceil-sized so any multiple-of-8 n_bits is legal (the tail word is
    # truncated back off by the byte slice below)
    words = np.zeros((n_bits + 63) // 64, dtype=np.uint64)
    if len(pdf):
        words[pdf["w"].to_numpy(dtype=np.int64)] = \
            pdf["word"].to_numpy(dtype=np.int64).view(np.uint64)
    n_pos = int(pdf["cnt"].sum()) if len(pdf) else 0
    # every gram contributes exactly k position rows (duplicates kept)
    return {"bits": words.astype("<u8").tobytes()[:n_bits // 8],
            "n_bits": n_bits, "k": k, "n": n, "n_grams": n_pos // k}


def bloom_fp_rate(bloom: dict) -> float:
    """Theoretical false-positive probability of the built filter:
    (1 - e^(-k*n/m))^k."""
    import math

    m, k, ng = bloom["n_bits"], bloom["k"], bloom["n_grams"]
    return (1.0 - math.exp(-k * ng / m)) ** k


def bloom_contamination(train: DataFrame, bloom: dict,
                        flag_threshold: float = 0.5,
                        text_col: str = "text",
                        id_col: str = "doc_id",
                        sh_train: DataFrame | None = None) -> DataFrame:
    """Per-training-doc contamination via the Bloom artifact — same
    output schema as ``contamination_overlap``: (doc_id, n_shingles,
    n_contaminated, contam_frac, is_contaminated).

    Guarantees: n_contaminated here is a SUPERSET count of the exact
    operator's (no false negatives — every true benchmark gram hits);
    over-flagging is bounded by ``bloom_fp_rate``. The k bit positions
    are computed JVM-side inside codegen; the only Python work is a
    VECTORIZED numpy probe of the bitmap per Arrow batch (one fancy-
    index + all-reduce — no per-string hashing, no per-element loop).
    The fixed-size bitmap rides the task closure (use
    ``spark.sparkContext.broadcast`` for filters beyond a few MB); one
    per-doc aggregation — the corpus never shuffles against the
    benchmark at all, which is the point at 100 TB. Pass ``sh_train``
    (a persisted shingle relation) to skip the tokenize/explode pass.
    """
    import numpy as np
    import pandas as pd

    bits = np.frombuffer(bloom["bits"], dtype=np.uint8)
    k, nb = bloom["k"], bloom["n_bits"]
    sh_t = sh_train if sh_train is not None \
        else shingles(train, bloom["n"], text_col, id_col)
    pos_df = sh_t.select(
        F.col(id_col),
        _bloom_position_cols(F.col("shingle"), k, nb).alias("ps"))

    def test(batches):
        masks = (np.uint8(1) << np.arange(8, dtype=np.uint8))
        for pdf in batches:
            if len(pdf):
                pos = np.vstack(pdf["ps"].to_numpy()).astype(np.int64)
                hit = ((bits[pos >> 3] & masks[pos & 7]) != 0).all(axis=1)
            else:
                hit = np.array([], dtype=bool)
            yield pd.DataFrame({id_col: pdf[id_col], "hit": hit})

    hits = pos_df.mapInPandas(test, f"{id_col} long, hit boolean")
    frac = F.col("n_contaminated") / F.col("n_shingles")
    return (hits.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("long").alias("n_shingles"),
                 F.sum(F.col("hit").cast("long")).cast("long")
                 .alias("n_contaminated"))
            .select(F.col(id_col), "n_shingles", "n_contaminated",
                    F.round(frac, 6).alias("contam_frac"),
                    (frac >= F.lit(flag_threshold))
                    .alias("is_contaminated")))


def save_ngram_bloom(spark, bloom: dict, path: str) -> None:
    """Persist the filter as a one-row parquet artifact (bitmap +
    parameters) — engine-portable and versionable next to the corpus,
    like the tokenizer artifacts."""
    df = spark.createDataFrame(
        [(bytearray(bloom["bits"]), bloom["n_bits"], bloom["k"],
          bloom["n"], bloom["n_grams"])],
        "bits binary, n_bits long, k long, n long, n_grams long")
    df.coalesce(1).write.mode("overwrite").parquet(path)


def load_ngram_bloom(spark, path: str) -> dict:
    """Reload a saved filter artifact."""
    r = spark.read.parquet(path).collect()[0]
    return {"bits": bytes(r["bits"]), "n_bits": int(r["n_bits"]),
            "k": int(r["k"]), "n": int(r["n"]),
            "n_grams": int(r["n_grams"])}


def contamination_report(train: DataFrame, benchmark: DataFrame,
                         n: int = 3, max_grams: int = 20,
                         text_col: str = "text",
                         id_col: str = "doc_id",
                         sh_train: DataFrame | None = None,
                         sh_bench: DataFrame | None = None) -> DataFrame:
    """Span-level contamination ATTRIBUTION — the audit view behind
    ``contamination_overlap``'s counts: for each training doc, WHICH
    benchmark n-grams hit, as (doc_id, gram_rank, shingle) with at
    most ``max_grams`` grams per doc (rank by shingle text, ascending —
    deterministic on any engine). A decontamination review needs the
    actual overlapping text to judge false positives (famous quotes,
    boilerplate legalese) against true eval leakage; counts alone
    cannot distinguish them.

    100 TB shape: same plan as the overlap counter — the benchmark's
    DISTINCT gram set broadcasts against the training shingle stream
    (the corpus never shuffles for it) — plus one per-doc window
    bounded by the doc's OWN hit count, cut to max_grams. Output is
    hits-bounded, never corpus-bounded.
    """
    from pyspark.sql.window import Window as W

    from lightning_metastore_spark.operators.dedup import shingles

    sh_t = sh_train if sh_train is not None \
        else shingles(train, n, text_col, id_col)
    sh_b = sh_bench if sh_bench is not None \
        else shingles(benchmark, n, text_col, id_col)
    bench_set = sh_b.select("shingle").distinct()
    hits = sh_t.join(F.broadcast(bench_set), "shingle") \
        .select(id_col, "shingle").distinct()
    w = W.partitionBy(id_col).orderBy(F.asc("shingle"))
    return (hits.withColumn("gram_rank",
                            F.row_number().over(w).cast("long"))
            .filter(F.col("gram_rank") <= int(max_grams))
            .select(id_col, "gram_rank", "shingle")
            .orderBy(id_col, "gram_rank"))
