"""Multimodal column operators: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side plumbing here is REAL and tested — schemas, batch
iteration, partition sizing, UDF signatures. The pixel/sample decoding
itself is STUBBED (this container ships no image/audio libraries):
``decode_stub=True`` (default) derives deterministic pseudo-metadata
from content digests so pipelines are testable end-to-end;
``decode_stub=False`` raises NotImplementedError at the decode site,
which is where Pillow/torchaudio/ffmpeg calls slot in.

Batch shape notes for 100 TB: inputs arrive as whole-file rows
(binaryFile) or payload columns; `spark.sql.execution.arrow.
maxRecordsPerBatch` bounds Arrow batch memory; repartition upstream so
a batch of payloads (batch_rows x avg_payload) fits the executor.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_META_SCHEMA = ("id long, n_bytes int, content_md5 string, "
                       "width int, height int, n_channels int")
FEATURE_DIM = 16
FEATURE_SCHEMA = f"id long, feature array<float>"


def _stub_dims(digest: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode: dimensions derived from the digest."""
    w = 64 + digest[0] % 192
    h = 64 + digest[1] % 192
    c = 1 + digest[2] % 4
    return w, h, c


def decode_metadata(df: DataFrame, id_col: str = "id",
                    content_col: str = "content",
                    decode_stub: bool = True) -> DataFrame:
    """binary payload -> typed metadata row (one per input row)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["id", "n_bytes", "content_md5", "width", "height", "n_channels"]
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                data = bytes(r[content_col])
                digest = hashlib.md5(data).digest()
                if decode_stub:
                    w, h, c = _stub_dims(digest)
                else:
                    raise NotImplementedError(
                        "real decode requires an image/audio library "
                        "(Pillow / torchaudio / ffmpeg) — not in this container")
                rows.append({"id": int(r[id_col]), "n_bytes": len(data),
                             "content_md5": digest.hex(), "width": w,
                             "height": h, "n_channels": c})
            yield pd.DataFrame(rows, columns=cols) if rows else \
                pd.DataFrame(columns=cols)

    return df.mapInPandas(run, schema=DECODED_META_SCHEMA)


def extract_features(df: DataFrame, id_col: str = "id",
                     content_col: str = "content",
                     decode_stub: bool = True) -> DataFrame:
    """binary payload -> fixed-dim float feature vector (the embedding
    step of a multimodal pipeline). Stub: md5-seeded deterministic
    vector; real impl would run a vision/audio encoder per Arrow batch
    (GPU-friendly batch boundary)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                data = bytes(r[content_col])
                if not decode_stub:
                    raise NotImplementedError(
                        "real feature extraction requires a model runtime")
                digest = hashlib.md5(data).digest()
                vec = [((digest[i % 16] / 255.0) - 0.5) for i in range(FEATURE_DIM)]
                rows.append({"id": int(r[id_col]), "feature": vec})
            yield pd.DataFrame(rows, columns=["id", "feature"]) if rows else \
                pd.DataFrame(columns=["id", "feature"])

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def documents_as_binary(docs: DataFrame) -> DataFrame:
    """Adapter: treat the documents table's text as binary payloads so
    multimodal plumbing is exercisable on the driver's test data."""
    return docs.select(F.col("doc_id").alias("id"),
                       F.encode("text", "UTF-8").alias("content"))
