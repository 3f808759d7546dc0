"""Multimodal column operators: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side plumbing here is REAL and tested — schemas, batch
iteration, partition sizing, UDF signatures. Two decode modes:
``decode_stub=True`` (default) derives deterministic pseudo-metadata
from content digests so pipelines are verifiable end-to-end against a
SQL oracle (the driver gate's mode); ``decode_stub=False`` REALLY
decodes image payloads through sources/codecs.py (PNG / GIF / BMP /
baseline JPEG — no external libraries) for true dimensions and
classical pixel features; audio/video payloads and progressive JPEG
raise NotImplementedError there, which is where torchaudio/ffmpeg/
Pillow slot in.

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


def _real_decode(data: bytes):
    """(width, height, RGB rows) via the stdlib codecs; raises
    NotImplementedError for payloads that need an external runtime."""
    from lightning_metastore_spark.sources import codecs

    try:
        if data[:8] == b"\x89PNG\r\n\x1a\n":
            return codecs.png_decode(data)
        if data[:6] in (b"GIF87a", b"GIF89a"):
            return codecs.gif_decode(data)
        if data[:2] == b"BM":
            return codecs.bmp_decode(data)
        if data[:2] == b"\xff\xd8":
            return codecs.jpeg_decode(data)
    except NotImplementedError:
        raise
    except Exception as e:
        raise NotImplementedError(f"undecodable image payload: {e}") from e
    raise NotImplementedError(
        "payload is not a decodable image (audio/video decode requires "
        "torchaudio/ffmpeg — not in this container)")


def decode_metadata(df: DataFrame, id_col: str = "id",
                    content_col: str = "content",
                    decode_stub: bool = True) -> DataFrame:
    """binary payload -> typed metadata row (one per input row)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["id", "n_bytes", "content_md5", "width", "height", "n_channels"]
        for pdf in batches:
            rows = []
            # zip over columns, not iterrows(): iterrows materializes a
            # pandas Series per row — several times slower per batch.
            for rid, raw in zip(pdf[id_col], pdf[content_col]):
                data = bytes(raw)
                digest = hashlib.md5(data).digest()
                if decode_stub:
                    w, h, c = _stub_dims(digest)
                else:
                    w, h, _rows = _real_decode(data)
                    c = 3  # codecs decode to RGB rows
                rows.append({"id": int(rid), "n_bytes": len(data),
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
    vector. Real (decode_stub=False): classical pixel features from the
    stdlib-decoded RGB — per-channel mean/std + a 10-bin luminance
    histogram (3+3+10 = FEATURE_DIM). A learned encoder replaces this
    per Arrow batch (GPU-friendly batch boundary)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for rid, raw in zip(pdf[id_col], pdf[content_col]):
                data = bytes(raw)
                if decode_stub:
                    digest = hashlib.md5(data).digest()
                    vec = [((digest[i % 16] / 255.0) - 0.5)
                           for i in range(FEATURE_DIM)]
                else:
                    w, h, rgb_rows = _real_decode(data)
                    arr = (np.frombuffer(b"".join(rgb_rows), dtype=np.uint8)
                           .reshape(h, w, 3).astype(np.float64) / 255.0)
                    lum = arr @ np.array([0.299, 0.587, 0.114])
                    hist, _ = np.histogram(lum, bins=FEATURE_DIM - 6,
                                           range=(0.0, 1.0))
                    hist = hist / max(1, lum.size)
                    vec = ([float(arr[..., c].mean()) for c in range(3)]
                           + [float(arr[..., c].std()) for c in range(3)]
                           + [float(x) for x in hist])
                rows.append({"id": int(rid), "feature": vec})
            yield pd.DataFrame(rows, columns=["id", "feature"]) if rows else \
                pd.DataFrame(columns=["id", "feature"])

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = ("id long, width int, height int, rgb binary")
FRAME_SCHEMA = ("id long, frame_idx int, frame_ts double, frame binary")


def resize_images(df: DataFrame, target_w: int = 32, target_h: int = 32,
                  id_col: str = "id", content_col: str = "content",
                  decode_stub: bool = True) -> DataFrame:
    """binary image payload -> fixed-size RGB thumbnail (the resize
    step before a vision encoder). Real path (decode_stub=False):
    stdlib decode + numpy nearest-neighbor resample — no Pillow.
    Stub: digest-seeded deterministic RGB of the target size, so the
    batch shape / schema / memory profile are exercised end-to-end.
    Output rgb = target_h*target_w*3 raw bytes, row-major."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        cols = ["id", "width", "height", "rgb"]
        for pdf in batches:
            rows = []
            for rid, raw in zip(pdf[id_col], pdf[content_col]):
                data = bytes(raw)
                if decode_stub:
                    digest = hashlib.md5(data).digest()
                    rng = np.frombuffer(
                        (digest * (target_w * target_h * 3 // 16 + 1))
                        [:target_w * target_h * 3], dtype=np.uint8)
                    out = rng
                else:
                    w, h, rgb_rows = _real_decode(data)
                    arr = (np.frombuffer(b"".join(rgb_rows), dtype=np.uint8)
                           .reshape(h, w, 3))
                    yi = (np.arange(target_h) * h // target_h)
                    xi = (np.arange(target_w) * w // target_w)
                    out = arr[yi][:, xi].reshape(-1)
                rows.append({"id": int(rid), "width": target_w,
                             "height": target_h, "rgb": out.tobytes()})
            yield pd.DataFrame(rows, columns=cols) if rows else \
                pd.DataFrame(columns=cols)

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_video_frames(df: DataFrame, n_frames: int = 4,
                        id_col: str = "id", content_col: str = "content",
                        decode_stub: bool = True) -> DataFrame:
    """binary video payload -> n sampled frames (one output row per
    frame): the fan-out step of a video-training pipeline. The Spark
    plumbing — per-row fan-out inside mapInPandas, frame schema, batch
    memory shape — is real; actual frame extraction needs ffmpeg
    (absent here), so decode_stub=False raises NotImplementedError at
    the decode call site where ffmpeg slots in. Stub frames are
    digest-seeded deterministic bytes with evenly-spaced pseudo
    timestamps derived from payload length."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["id", "frame_idx", "frame_ts", "frame"]
        for pdf in batches:
            rows = []
            for rid, raw in zip(pdf[id_col], pdf[content_col]):
                data = bytes(raw)
                if not decode_stub:
                    raise NotImplementedError(
                        "video frame extraction requires ffmpeg — not in "
                        "this container; wire it here")
                digest = hashlib.md5(data).digest()
                pseudo_duration = max(1.0, len(data) / 1024.0)
                for i in range(n_frames):
                    fd = hashlib.md5(digest + bytes([i])).digest()
                    rows.append({
                        "id": int(rid), "frame_idx": i,
                        "frame_ts": round(i * pseudo_duration / n_frames, 6),
                        "frame": fd * 4})
            yield pd.DataFrame(rows, columns=cols) if rows else \
                pd.DataFrame(columns=cols)

    return df.mapInPandas(run, schema=FRAME_SCHEMA)


def documents_as_binary(docs: DataFrame) -> DataFrame:
    """Adapter: treat the documents table's text as binary payloads so
    multimodal plumbing is exercisable on the driver's test data."""
    return docs.select(F.col("doc_id").alias("id"),
                       F.encode("text", "UTF-8").alias("content"))
