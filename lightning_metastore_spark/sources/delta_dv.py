"""Delta Lake deletion-vector decoding — the public PROTOCOL.md
"Deletion Vectors" format, pure stdlib.

A deletion vector (DV) marks rows of one data file as logically
deleted; the reader must drop exactly those row indexes. The on-disk
format (all public):

- **Descriptor** (in the `add` action): ``storageType`` of ``"u"``
  (file path relative to the table, name derived from a Z85-encoded
  UUID), ``"p"`` (absolute file path) or ``"i"`` (inline —
  ``pathOrInlineDv`` IS the Z85-encoded data); ``offset`` (byte
  position of the DV inside a shared file), ``sizeInBytes`` (length of
  the serialized bitmap), ``cardinality`` (number of deleted rows).
- **File layout**: 1-byte format version (1), then per stored DV a
  4-byte BIG-endian size, the serialized bitmap, and a 4-byte
  BIG-endian CRC-32 of the bitmap bytes. ``offset`` points at the size
  prefix; when absent the single DV starts at byte 1.
- **Bitmap**: RoaringBitmapArray "portable" serialization — 4-byte
  LITTLE-endian magic ``1681511377``, 8-byte LE count of 32-bit
  bitmaps, then per bitmap a 4-byte LE key (the high 32 bits) and a
  standard 32-bit RoaringBitmap (RoaringFormatSpec: cookie 12346 with
  an explicit container count + offset header, or 12347 with the
  count packed in the cookie and a run-container bitset; descriptive
  header of (uint16 key, uint16 cardinality-1) pairs; array / bitmap /
  run containers).
- **Z85**: the ZeroMQ base-85 alphabet, 5 chars per 4 bytes,
  big-endian groups (UUIDs encode to exactly 20 chars).

Scale shape: DV decode happens EXECUTOR-side — descriptors fan out via
``parallelize``/``flatMap`` and each task opens its DV file locally
(the same shared-filesystem contract as every no-jar fallback in this
repo) — so the driver never holds the deleted-row relation; the
(file, row_index) pairs join the scan as an anti-join keyed on
``_metadata.file_path``/``row_index``, identical to the Iceberg
position-delete path (`sources/iceberg_reader.py`).
"""

from __future__ import annotations

import os
import re
import struct
import zlib

_Z85_ALPHABET = ("0123456789abcdefghijklmnopqrstuvwxyz"
                 "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}

_MAGIC = 1681511377
_SERIAL_COOKIE = 12347
_SERIAL_COOKIE_NO_RUNCONTAINER = 12346
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX_CARD = 4096


class DeletionVectorError(Exception):
    pass


def z85_decode(s: str) -> bytes:
    """ZeroMQ Z85: 5 chars -> 4 bytes, big-endian base-85 groups."""
    if len(s) % 5 != 0:
        raise DeletionVectorError(
            f"Z85 string length must be a multiple of 5, got {len(s)}")
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for c in s[i:i + 5]:
            if c not in _Z85_INDEX:
                raise DeletionVectorError(f"invalid Z85 character {c!r}")
            v = v * 85 + _Z85_INDEX[c]
        if v > 0xFFFFFFFF:
            raise DeletionVectorError("Z85 group out of range")
        out += v.to_bytes(4, "big")
    return bytes(out)


def _read_roaring32(data: bytes, pos: int) -> tuple[list[int], int]:
    """One 32-bit RoaringBitmap (RoaringFormatSpec) -> sorted values."""
    if pos + 4 > len(data):
        raise DeletionVectorError("truncated bitmap (cookie)")
    cookie, = struct.unpack_from("<I", data, pos)
    pos += 4
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        nbytes = (n + 7) // 8
        run_bits = data[pos:pos + nbytes]
        if len(run_bits) < nbytes:
            raise DeletionVectorError("truncated bitmap (run bitset)")
        pos += nbytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD

        def has_run(i: int) -> bool:
            return bool((run_bits[i // 8] >> (i % 8)) & 1)
    elif cookie == _SERIAL_COOKIE_NO_RUNCONTAINER:
        if pos + 4 > len(data):
            raise DeletionVectorError("truncated bitmap (count)")
        n, = struct.unpack_from("<I", data, pos)
        pos += 4
        has_offsets = True

        def has_run(i: int) -> bool:
            return False
    else:
        raise DeletionVectorError(f"unknown RoaringBitmap cookie {cookie}")

    header = []
    for _ in range(n):
        if pos + 4 > len(data):
            raise DeletionVectorError("truncated bitmap (keys)")
        key, card_m1 = struct.unpack_from("<HH", data, pos)
        pos += 4
        header.append((key, card_m1 + 1))
    if has_offsets:
        pos += 4 * n  # containers follow sequentially; offsets unused
    # values come back as (start, count) RUNS, never exploded Python
    # lists: a run container marking ~100M contiguous deleted rows is
    # O(runs) here (the explosion happens JVM-side via sequence());
    # array/bitmap containers emit singleton runs, bounded by the
    # container cardinality (<= 65536)
    runs: list[tuple[int, int]] = []
    for i, (key, card) in enumerate(header):
        base = key << 16
        if has_run(i):
            if pos + 2 > len(data):
                raise DeletionVectorError("truncated run container")
            n_runs, = struct.unpack_from("<H", data, pos)
            pos += 2
            if pos + 4 * n_runs > len(data):
                raise DeletionVectorError("truncated run container")
            for _ in range(n_runs):
                start, length = struct.unpack_from("<HH", data, pos)
                pos += 4
                runs.append((base + start, length + 1))
        elif card <= _ARRAY_MAX_CARD:
            end = pos + 2 * card
            if end > len(data):
                raise DeletionVectorError("truncated array container")
            runs.extend((base + v, 1)
                        for v in struct.unpack_from(f"<{card}H", data, pos))
            pos = end
        else:
            end = pos + 8192
            if end > len(data):
                raise DeletionVectorError("truncated bitmap container")
            words = struct.unpack_from("<1024Q", data, pos)
            pos = end
            for wi, w in enumerate(words):
                while w:
                    b = (w & -w).bit_length() - 1
                    runs.append((base + wi * 64 + b, 1))
                    w &= w - 1
    return runs, pos


def decode_bitmap_runs(data: bytes) -> list[tuple[int, int]]:
    """RoaringBitmapArray portable bytes -> sorted (start, count) runs
    of 64-bit row indexes. Run containers stay runs (O(runs) memory,
    not O(cardinality)); scattered values are singleton runs."""
    if len(data) < 12:
        raise DeletionVectorError("deletion vector too short")
    magic, = struct.unpack_from("<i", data, 0)
    if magic != _MAGIC:
        raise DeletionVectorError(
            f"bad RoaringBitmapArray magic {magic} (expected {_MAGIC})")
    n_bitmaps, = struct.unpack_from("<q", data, 4)
    pos = 12
    out: list[tuple[int, int]] = []
    for _ in range(n_bitmaps):
        if pos + 4 > len(data):
            raise DeletionVectorError("truncated bitmap array (key)")
        high, = struct.unpack_from("<I", data, pos)
        pos += 4
        runs, pos = _read_roaring32(data, pos)
        out.extend(((high << 32) | s, c) for s, c in runs)
    return sorted(out)


def decode_bitmap(data: bytes) -> list[int]:
    """RoaringBitmapArray portable bytes -> sorted 64-bit row indexes
    (exploded; prefer `decode_bitmap_runs` for anything large)."""
    return [v for s, c in decode_bitmap_runs(data)
            for v in range(s, s + c)]


def dv_relative_path(path_or_inline: str) -> str:
    """storageType "u": the last 20 chars are a Z85 UUID, anything
    before them is a directory prefix; the file is
    ``[<prefix>/]deletion_vector_<uuid>.bin``."""
    import uuid as _uuid
    if len(path_or_inline) < 20:
        raise DeletionVectorError(
            f"pathOrInlineDv too short for a UUID: {path_or_inline!r}")
    prefix, enc = path_or_inline[:-20], path_or_inline[-20:]
    u = _uuid.UUID(bytes=z85_decode(enc))
    name = f"deletion_vector_{u}.bin"
    return os.path.join(prefix, name) if prefix else name


def read_dv_runs(descriptor: dict, table_path: str
                 ) -> list[tuple[int, int]]:
    """Decode one DV descriptor into (start, count) runs of deleted
    row indexes, validating the size prefix and the CRC-32 (both
    spec-mandated). Memory is O(runs), never O(deleted rows)."""
    st = descriptor.get("storageType")
    payload = descriptor.get("pathOrInlineDv") or ""
    size = descriptor.get("sizeInBytes")
    if st == "i":
        data = z85_decode(payload)
        if size is not None:
            data = data[:int(size)]  # Z85 pads to 4-byte groups
        return decode_bitmap_runs(data)
    if st == "u":
        fpath = os.path.join(table_path, dv_relative_path(payload))
    elif st == "p":
        # delta-spark may store a scheme-qualified URI (shallow clones)
        fpath = re.sub(r"^file:/+", "/", payload)
    else:
        raise DeletionVectorError(f"unknown DV storageType {st!r}")
    offset = descriptor.get("offset")
    offset = 1 if offset is None else int(offset)
    with open(fpath, "rb") as fh:
        fh.seek(offset)
        raw = fh.read(4)
        if len(raw) < 4:
            raise DeletionVectorError(f"truncated DV file {fpath}")
        stored_size, = struct.unpack(">i", raw)
        if size is not None and stored_size != int(size):
            raise DeletionVectorError(
                f"DV size mismatch in {fpath}: descriptor says {size}, "
                f"file says {stored_size}")
        data = fh.read(stored_size)
        if len(data) < stored_size:
            raise DeletionVectorError(f"truncated DV data in {fpath}")
        crc_raw = fh.read(4)
        if len(crc_raw) == 4:
            expected, = struct.unpack(">I", crc_raw)
            if zlib.crc32(data) & 0xFFFFFFFF != expected:
                raise DeletionVectorError(f"DV checksum mismatch in {fpath}")
    return decode_bitmap_runs(data)


def read_dv(descriptor: dict, table_path: str) -> list[int]:
    """Exploded row indexes of one DV descriptor (prefer
    `read_dv_runs` for anything large)."""
    return [v for s, c in read_dv_runs(descriptor, table_path)
            for v in range(s, s + c)]


# java.net.URI path-component quoting (what Spark's _metadata.file_path
# carries after the scheme): US-ASCII chars outside this set are
# percent-encoded; '+' and non-ASCII stay raw. Mirrored here so the
# deleted-row relation joins the scan even when the table path carries
# spaces/%/# (verified empirically against Spark's own file_path).
_URI_PATH_LEGAL = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    "_-!.~'()*,;:$&+=/@")


def uri_path_encode(p: str) -> str:
    out = []
    for ch in p:
        if ch in _URI_PATH_LEGAL or ord(ch) >= 0x80:
            out.append(ch)
        else:
            out.append("".join(f"%{b:02X}" for b in ch.encode("utf-8")))
    return "".join(out)


# a run longer than this is split before the JVM-side sequence()
# expansion, bounding each exploded array row to 64k longs (~512 KB)
_RUN_CHUNK = 65536


def deleted_rows_df(spark, table_path: str,
                    dv_by_file: dict[str, dict]):
    """(__dv_file, __dv_pos) DataFrame of deleted rows for the live
    files of a snapshot — decoded EXECUTOR-side (one task per
    descriptor; DV files are opened where the task runs, the shared-
    filesystem contract of every no-jar fallback here). File keys are
    URI-path-encoded to match `_metadata.file_path`.

    Decoding yields (start, count) RUNS, chunked to ``_RUN_CHUNK``, and
    the per-row expansion happens JVM-side via sequence()/explode — a
    DV marking 100M contiguous rows costs O(runs) Python memory, never
    a 100M-element Python list in one task."""
    abs_table = os.path.abspath(table_path)
    items = [(uri_path_encode(
                  os.path.abspath(os.path.join(abs_table, rel))),
              dict(desc))
             for rel, desc in sorted(dv_by_file.items())]

    # Executor Python workers may not have this repo on their
    # sys.path (it is a source tree, not an installed package) —
    # register this module for pickle-BY-VALUE so the decode closure
    # ships self-contained instead of by module reference.
    try:
        import sys

        from pyspark import cloudpickle
        cloudpickle.register_pickle_by_value(
            sys.modules[__name__])
    except Exception:  # noqa: BLE001 — best-effort; by-ref still
        pass           # works when the repo is importable remotely

    def _expand(item):
        fpath, desc = item
        for start, count in read_dv_runs(desc, abs_table):
            while count > _RUN_CHUNK:
                yield (fpath, start, _RUN_CHUNK)
                start += _RUN_CHUNK
                count -= _RUN_CHUNK
            yield (fpath, start, count)

    from pyspark.sql import functions as F
    sc = spark.sparkContext
    rdd = sc.parallelize(items, max(1, len(items))).flatMap(_expand)
    runs = spark.createDataFrame(
        rdd, "__dv_file string, __dv_start long, __dv_n long")
    return runs.select(
        "__dv_file",
        F.explode(F.sequence(
            F.col("__dv_start"),
            F.col("__dv_start") + F.col("__dv_n") - F.lit(1)
        )).alias("__dv_pos"))


# ---------------------------------------------------------------------------
# encoding — the write-side inverse (offline merge-on-read DELETE)
# ---------------------------------------------------------------------------

def z85_encode(b: bytes) -> str:
    """ZeroMQ Z85: 4 bytes -> 5 chars, big-endian base-85 groups."""
    if len(b) % 4 != 0:
        raise DeletionVectorError(
            f"Z85 input length must be a multiple of 4, got {len(b)}")
    out = []
    for i in range(0, len(b), 4):
        v = int.from_bytes(b[i:i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85_ALPHABET[r])
        out.extend(reversed(chunk))
    return "".join(out)


def _write_roaring32(values: list[int]) -> bytes:
    """Sorted, unique uint32 values -> one 32-bit RoaringBitmap in the
    RoaringFormatSpec portable layout (cookie 12346: no run
    containers, explicit count + offset header — the simplest valid
    encoding; array containers <=4096 values, bitmap containers
    above). Any compliant reader (delta-spark's RoaringBitmapArray
    included) accepts this subset."""
    containers: list[tuple[int, list[int]]] = []
    for v in values:
        key = v >> 16
        if not containers or containers[-1][0] != key:
            containers.append((key, []))
        containers[-1][1].append(v & 0xFFFF)
    n = len(containers)
    header = struct.pack("<II", _SERIAL_COOKIE_NO_RUNCONTAINER, n)
    desc = b"".join(struct.pack("<HH", key, len(vals) - 1)
                    for key, vals in containers)
    # container payloads, then offsets measured from the bitmap start
    payloads: list[bytes] = []
    for _key, vals in containers:
        if len(vals) <= _ARRAY_MAX_CARD:
            payloads.append(struct.pack(f"<{len(vals)}H", *vals))
        else:
            words = [0] * 1024
            for lo in vals:
                words[lo >> 6] |= 1 << (lo & 63)
            payloads.append(struct.pack("<1024Q", *words))
    base = len(header) + len(desc) + 4 * n
    offsets = []
    pos = base
    for p in payloads:
        offsets.append(pos)
        pos += len(p)
    off = struct.pack(f"<{n}I", *offsets) if n else b""
    return header + desc + off + b"".join(payloads)


def encode_bitmap(rows: list[int]) -> bytes:
    """Sorted, unique 64-bit row indexes -> RoaringBitmapArray
    portable bytes (the inverse of `decode_bitmap`)."""
    groups: list[tuple[int, list[int]]] = []
    for v in rows:
        hi = v >> 32
        if not groups or groups[-1][0] != hi:
            groups.append((hi, []))
        groups[-1][1].append(v & 0xFFFFFFFF)
    out = [struct.pack("<iq", _MAGIC, len(groups))]
    for hi, vals in groups:
        out.append(struct.pack("<I", hi))
        out.append(_write_roaring32(vals))
    return b"".join(out)


def write_dv_file(table_path: str, rows: list[int]) -> dict:
    """Serialize ``rows`` (sorted, unique 64-bit row indexes) as an
    on-disk deletion vector under ``table_path`` and return the add
    action's `deletionVector` descriptor (storageType "u", spec file
    layout: version byte, 4-byte BE size, bitmap, 4-byte BE CRC-32)."""
    import uuid as _uuid
    if not rows:
        raise DeletionVectorError("empty deletion vector")
    bm = encode_bitmap(rows)
    u = _uuid.uuid4()
    name = f"deletion_vector_{u}.bin"
    data = (b"\x01" + struct.pack(">i", len(bm)) + bm
            + struct.pack(">I", zlib.crc32(bm) & 0xFFFFFFFF))
    with open(os.path.join(table_path, name), "wb") as fh:
        fh.write(data)
    return {"storageType": "u",
            "pathOrInlineDv": z85_encode(u.bytes),
            "offset": 1,
            "sizeInBytes": len(bm),
            "cardinality": len(rows)}
