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
