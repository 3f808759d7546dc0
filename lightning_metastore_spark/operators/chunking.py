"""Sliding-window document chunking for RAG / training pipelines.

Long documents are cut into fixed-size token windows with overlap
("stride" chunking) before embedding or packing: chunk ``i`` covers
tokens ``[i*stride, i*stride + chunk_size)`` with
``stride = chunk_size - overlap``; the final chunk is the first one
whose window reaches the end of the document (no degenerate tail that
is pure overlap).

Scale design (100 TB): chunking is MAP-ONLY — tokens come from one
``split`` per document, the window starts from one ``sequence()``
fan-out, and the chunk text from ``slice`` + ``array_join``; there is
no shuffle, no UDF, and the per-document fan-out is bounded by
``ceil(n_tokens / stride)``. The operator composes with downstream
embedding / ANN stages without re-partitioning.

Reference parity note: the reference has no chunking operator
(SURVEY.md §2.7); part of the driver-mandated LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(docs: DataFrame, chunk_size: int = 32,
                    overlap: int = 8, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Explode each document into overlapping token-window chunks.

    Returns one row per chunk:
    ``(doc_id, chunk_id, start_tok, end_tok, n_chunk_tokens,
    chunk_md5)`` where ``start_tok``/``end_tok`` are 0-based
    [start, end) whitespace-token offsets into the document and
    ``chunk_md5`` is the md5 of the space-joined chunk tokens (the
    dedup-able chunk fingerprint; carrying the full chunk text is the
    same plan minus the hash).

    Chunk count: 1 if ``n_tokens <= chunk_size`` else
    ``ceil((n_tokens - chunk_size) / stride) + 1`` — the last window
    may be shorter than ``chunk_size`` but always starts at
    ``i*stride`` so offsets are reproducible by any consumer.
    Empty/whitespace-only documents produce one empty chunk (row-count
    preserving: every doc_id appears).
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("chunk_documents: need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    # NULL text behaves as empty (one empty chunk): coalesce BEFORE the
    # extract so _n is 0, never NULL/-1 (size-of-null semantics vary)
    toks = docs.select(
        F.col(id_col),
        F.regexp_extract_all(F.coalesce(F.col(text_col), F.lit("")),
                             F.lit(r"(\S+)"), 1).alias("_t"),
    ).withColumn("_n", F.size("_t"))
    n_chunks = F.when(F.col("_n") <= chunk_size, F.lit(1)).otherwise(
        F.ceil((F.col("_n") - chunk_size) / F.lit(stride)) + 1)
    out = (toks.withColumn("chunk_id",
                           F.explode(F.sequence(F.lit(0),
                                                n_chunks.cast("int") - 1)))
           .withColumn("start_tok", F.col("chunk_id") * stride)
           .withColumn("end_tok",
                       F.least(F.col("start_tok") + chunk_size, F.col("_n")))
           .withColumn("_chunk",
                       F.slice("_t", F.col("start_tok") + 1,
                               F.col("end_tok") - F.col("start_tok"))))
    return out.select(
        id_col, "chunk_id",
        F.col("start_tok").cast("long").alias("start_tok"),
        F.col("end_tok").cast("long").alias("end_tok"),
        (F.col("end_tok") - F.col("start_tok")).cast("long")
        .alias("n_chunk_tokens"),
        F.md5(F.array_join("_chunk", " ")).alias("chunk_md5"),
    )
