"""Unstructured file tables (PDF / TEXT / IMAGE / VIDEO) over binaryFile.

Reference architecture (SURVEY.md §2.3): DSv2 FileTable per modality,
one row per whole file, metadata table (`...name`) + content table
(`...name.content`), three scan modes, declared TAG columns fed from
`.tag` JSON sidecars, and content laziness driven by column projection
(`UnstructuredFilePartitionReaderFactory.scala`).

PySpark mapping:
- `spark.read.format("binaryFile")` supplies (path, modificationTime,
  length, content); its scan already pushes path/length/modificationTime
  filters and never splits files — identical physics to the reference's
  `isSplitable=false` whole-file reader.
- scan modes: file_scan = top-level glob; recursive_scan =
  recursiveFileLookup + derived `subdir` column; parts_scan = Hive-style
  partition discovery (pruning for free, as the reference gets from
  `InMemoryFileIndex`).
- extraction runs in `mapInPandas` (Arrow-batched) AFTER any metadata
  filters, mirroring the reference's filter-before-extract ordering.
- extraction is REAL without external libs (sources/codecs.py, pure
  zlib+struct+numpy): FlateDecode PDF text incl. CID fonts via
  ToUnicode CMaps, PNG/GIF/BMP/JPEG (baseline AND progressive)
  thumbnails, EXIF IFD walk, MP4/MOV + AVI + MKV duration/dims.
  Pillow/pypdf still upgrade the paths when importable, but no decode
  is Pillow-only anymore (progressive JPEG closed in r12).
- the generic `UNSTRUCTURED` modality mirrors the reference's binary
  fallback (`UnstructuredFileFormat.scala`): any file, metadata columns
  only, `bincontent` content table.

Scale: one row per file; partitions = files. At 100 TB the knobs are
`spark.sql.files.maxPartitionBytes` (packs small files per task) and
partition-dir pruning — both native to the binaryFile source.
"""

from __future__ import annotations

import io
import json
import os
import re
import struct
from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lightning_metastore_spark.catalog.units import CatalogUnit, CatalogUnitError
from lightning_metastore_spark.model.serde import DataSource
from lightning_metastore_spark.sources import codecs

DEFAULT_GLOBS = {
    "PDF": "*.pdf",
    "TEXT": "*.txt",
    "IMAGE": "*.{png,jpg,jpeg,gif,bmp}",
    "VIDEO": "*.{mp4,mov,avi,mkv}",
    "AUDIO": "*.{mp3,wav,flac}",
    "UNSTRUCTURED": "*",   # generic binary fallback — every file
}

PREVIEW_LEN_OPT = "pdf_preview_len"       # UnstructuredData.scala:68-69
THUMB_W_OPT = "image_thumbnail_with"      # (sic — reference option name)
THUMB_H_OPT = "image_thumbnail_height"
DEFAULT_PREVIEW_LEN = 1000
DEFAULT_THUMB = 100


# ---------------------------------------------------------------------------
# pure-Python extractors (deterministic; import-gated libs upgrade them)
# ---------------------------------------------------------------------------

def png_jpeg_dimensions(data: bytes) -> tuple[Optional[int], Optional[int]]:
    """Real header parsing for PNG / JPEG / GIF / BMP — no library."""
    try:
        if data[:8] == b"\x89PNG\r\n\x1a\n":
            w, h = struct.unpack(">II", data[16:24])
            return int(w), int(h)
        if data[:2] == b"\xff\xd8":  # JPEG: scan for SOFn marker
            i = 2
            while i + 9 < len(data):
                if data[i] != 0xFF:
                    i += 1
                    continue
                marker = data[i + 1]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(">HH", data[i + 5: i + 9])
                    return int(w), int(h)
                seglen = struct.unpack(">H", data[i + 2: i + 4])[0]
                i += 2 + seglen
        if data[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", data[6:10])
            return int(w), int(h)
        if data[:2] == b"BM":
            w, h = struct.unpack("<ii", data[18:26])
            return int(w), abs(int(h))
    except Exception:
        pass
    return None, None


def mp4_metadata(data: bytes) -> dict:
    """Real MP4 box walk: mvhd -> duration seconds, tkhd -> dimensions.
    Mirrors the reference's Duration / Media Time Scale tag reads
    (VideoReaderFactory.scala:36-107)."""
    out: dict = {"duration": None, "width": None, "height": None, "format": None}
    try:
        if data[4:8] == b"ftyp":
            out["format"] = data[8:12].decode("ascii", "ignore").strip()

        def walk(buf: bytes, start: int, end: int) -> None:
            i = start
            while i + 8 <= end:
                size = struct.unpack(">I", buf[i: i + 4])[0]
                box = buf[i + 4: i + 8]
                if size < 8:
                    break
                if box in (b"moov", b"trak"):
                    walk(buf, i + 8, min(i + size, end))
                elif box == b"mvhd":
                    ver = buf[i + 8]
                    if ver == 0:
                        scale, dur = struct.unpack(">II", buf[i + 20: i + 28])
                    else:
                        scale = struct.unpack(">I", buf[i + 28: i + 32])[0]
                        dur = struct.unpack(">Q", buf[i + 32: i + 40])[0]
                    if scale:
                        out["duration"] = round(dur / scale, 3)
                elif box == b"tkhd":
                    ver = buf[i + 8]
                    off = i + 8 + (96 if ver == 1 else 84)
                    w, h = struct.unpack(">II", buf[off: off + 8])
                    if w and h and out["width"] is None:
                        out["width"], out["height"] = w >> 16, h >> 16
                i += size
        walk(data, 0, len(data))
    except Exception:
        pass
    return out


def pdf_text(data: bytes, max_chars: int) -> str:
    """PDF text extraction (parity: PdfReaderFactory.scala:52-67 via
    PDFBox). pypdf when importable; else the pure-zlib FlateDecode
    content-stream interpreter (codecs.pdf_text_flate) — REAL extraction
    on compressed real-world PDFs; last resort is the uncompressed-
    stream regex for damaged files."""
    try:
        import pypdf  # type: ignore

        reader = pypdf.PdfReader(io.BytesIO(data))
        text = "\n".join((p.extract_text() or "") for p in reader.pages)
        if text.strip():
            return text[:max_chars]
    except Exception:
        pass
    text = codecs.pdf_text_flate(data, max_chars)
    if text:
        return text
    chunks = re.findall(rb"\(((?:[^()\\]|\\.)*)\)", data[:200_000])
    return b" ".join(chunks).decode("latin-1", "ignore")[:max_chars]


def image_thumbnail(data: bytes, w: int, h: int) -> Optional[bytes]:
    """Aspect-fit thumbnail (parity: Thumbnailator,
    UnstructuredData.scala:195-202). Pillow when importable; else the
    pure-stdlib PNG/GIF/BMP/JPEG (baseline + progressive)
    decode->resize->PNG path."""
    try:
        from PIL import Image  # type: ignore

        img = Image.open(io.BytesIO(data))
        img.thumbnail((w, h))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()
    except Exception:
        pass
    return codecs.thumbnail_png(data, w, h)


def image_tags(data: bytes) -> str:
    """EXIF tag JSON (parity: metadata-extractor). Pillow when
    importable; else the pure TIFF-IFD walk over JPEG APP1 / PNG eXIf."""
    try:
        from PIL import ExifTags, Image  # type: ignore

        img = Image.open(io.BytesIO(data))
        exif = img.getexif()
        tags = {str(ExifTags.TAGS.get(k, k)): str(v) for k, v in exif.items()}
        if tags:
            return json.dumps(tags, sort_keys=True)
    except Exception:
        pass
    return json.dumps(codecs.exif_tags(data), sort_keys=True)


def video_metadata(data: bytes) -> dict:
    """Container-dispatching video metadata (parity:
    VideoReaderFactory.scala:36-107 reads Duration / Media Time Scale /
    dimension tags for many containers): MP4/MOV box walk, AVI RIFF
    header, MKV/WebM EBML."""
    if data[4:8] in (b"ftyp", b"moov", b"mdat", b"wide"):
        return mp4_metadata(data)
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return codecs.avi_metadata(data)
    if data[:4] == b"\x1aE\xdf\xa3":
        return codecs.mkv_metadata(data)
    return {"duration": None, "width": None, "height": None, "format": None}


# ---------------------------------------------------------------------------
# modality schemas (FIXTURES.md §5 / reference *Table.scala)
# ---------------------------------------------------------------------------

METADATA_SCHEMAS = {
    "PDF": ("type string, path string, modifiedat timestamp, "
            "sizeinbytes bigint, preview string"),
    "TEXT": ("type string, path string, modifiedat timestamp, "
             "sizeinbytes bigint, preview string"),
    "IMAGE": ("type string, path string, modifiedat timestamp, "
              "sizeinbytes bigint, width int, height int, tags string, "
              "imagethumbnail binary"),
    "VIDEO": ("type string, path string, format string, modifiedat timestamp, "
              "sizeinbytes bigint, duration float, width int, height int, "
              "tags string"),
    # generic fallback: metadata columns only (UnstructuredFileFormat.
    # scala:104-119 emits exactly type/path/modificationTime/length)
    "UNSTRUCTURED": ("type string, path string, modifiedat timestamp, "
                     "sizeinbytes bigint"),
}

CONTENT_SCHEMAS = {
    "PDF": "path string, textcontent string, bincontent binary",
    "TEXT": "path string, textcontent string",
    "IMAGE": "path string, imagecontent binary",
    "VIDEO": "path string, videothumbnail binary, videocontent binary",
    "UNSTRUCTURED": "path string, bincontent binary",
}


class UnstructuredCatalogUnit(CatalogUnit):
    """One datasource -> two logical tables: `<name>` (metadata) and
    `<name>.content` (reference resolves the trailing `content`
    identifier, AbstractLightningCatalog.scala:293-301)."""

    def __init__(self, ds: DataSource):
        super().__init__(ds)
        if ds.source_type not in METADATA_SCHEMAS:
            raise CatalogUnitError(
                f"unsupported unstructured type {ds.source_type} "
                f"(reference leaves AUDIO unimplemented too)")

    @property
    def path(self) -> str:
        p = self.ds.options.get("path")
        if not p:
            raise CatalogUnitError(f"{self.ds.name}: missing 'path' option")
        return p

    @property
    def scan_type(self) -> str:
        return self.ds.options.get("scan_type", "file_scan")

    def _root_uri_regex(self) -> str:
        """Regex matching this table's root as binaryFile reports it in
        the `path` column, scheme-agnostic: `file:/abs/x`, `s3a://b/x`,
        `hdfs://nn/x` all match. Local relative roots are absolutized
        (binaryFile always reports absolute URIs)."""
        from lightning_metastore_spark.model.fs import split_url

        scheme, p = split_url(self.path)
        if scheme in ("", "file"):
            p = os.path.abspath(p)
        return r"[A-Za-z][A-Za-z0-9+.\-]*:/{0,2}" + re.escape(p.rstrip("/"))

    def _binary_df(self, spark: SparkSession) -> DataFrame:
        glob = self.ds.options.get("glob", DEFAULT_GLOBS[self.ds.source_type])
        reader = (spark.read.format("binaryFile")
                  .option("pathGlobFilter", glob))
        mode = self.scan_type
        if mode == "recursive_scan":
            df = reader.option("recursiveFileLookup", "true").load(self.path)
            df = df.withColumn(
                "subdir",
                F.regexp_extract("path",
                                 self._root_uri_regex() + r"/(?:(.*)/)?[^/]+$",
                                 1))
        elif mode == "parts_scan":
            df = reader.load(self.path)  # Hive partition discovery on
        else:  # file_scan — leaf files of the root dir only
            df = reader.option("recursiveFileLookup", "true").load(self.path)
            df = df.filter(F.col("path").rlike(self._root_uri_regex()
                                               + r"/[^/]+$"))
        return df

    # -- table loading ------------------------------------------------------

    def load_table(self, spark: SparkSession, residual: list[str]) -> DataFrame:
        if residual == ["content"]:
            return self._content_table(spark)
        if residual == ["files"]:
            return self._files_table(spark)
        if residual:
            raise CatalogUnitError(
                f"unstructured datasource {self.ds.name} has no table "
                f"{'.'.join(residual)} (tables: <name>, <name>.content, "
                f"<name>.files)")
        return self._metadata_table(spark)

    def list_tables(self, spark: SparkSession, residual: list[str]) -> list[str]:
        return [self.ds.name, "content", "files"] if not residual else []

    def _files_table(self, spark: SparkSession) -> DataFrame:
        """Metadata-ONLY fast path: pure file listing, no content bytes
        read or decoded. The reference gets this laziness per-column
        (`contentNeed`, UnstructuredFilePartitionReaderFactory.scala:
        166-174); binaryFile always materializes content, so we expose
        the listing as its own table — size/mtime scans over millions of
        files cost directory listings only."""
        base = {"path", "modificationTime", "length", "content"}
        df = self._binary_df(spark)
        extra = [c for c in df.columns if c not in base]
        return df.select(
            F.lit(self.ds.source_type.lower()).alias("type"),
            F.col("path"),
            F.col("modificationTime").alias("modifiedat"),
            F.col("length").alias("sizeinbytes"),
            *extra)

    def _extra_cols(self, df: DataFrame) -> list[str]:
        base = {"path", "modificationTime", "length", "content"}
        return [c for c in df.columns if c not in base]

    def _metadata_table(self, spark: SparkSession) -> DataFrame:
        st = self.ds.source_type
        if st == "UNSTRUCTURED":
            # generic fallback = pure listing (no decode, content bytes
            # never read — binaryFile prunes the content column)
            return self._with_tags(spark, self._files_table(spark))
        df = self._binary_df(spark)
        extra = self._extra_cols(df)  # subdir / partition cols
        preview_len = int(self.ds.options.get(PREVIEW_LEN_OPT, DEFAULT_PREVIEW_LEN))
        tw = int(self.ds.options.get(THUMB_W_OPT, DEFAULT_THUMB))
        th = int(self.ds.options.get(THUMB_H_OPT, DEFAULT_THUMB))
        schema = METADATA_SCHEMAS[st] + "".join(
            f", {c} string" for c in extra)

        def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf_ in batches:
                rows = []
                # column zips, not iterrows(): no per-row Series build
                for raw, path, mtime, length, *extras in zip(
                        pdf_["content"], pdf_["path"],
                        pdf_["modificationTime"], pdf_["length"],
                        *(pdf_[c] for c in extra)):
                    data = bytes(raw)
                    base = {"type": st.lower(), "path": path,
                            "modifiedat": mtime,
                            "sizeinbytes": int(length)}
                    if st in ("PDF", "TEXT"):
                        base["preview"] = (
                            pdf_text(data, preview_len) if st == "PDF"
                            else data.decode("utf-8", "ignore")[:preview_len])
                    elif st == "IMAGE":
                        w, h = png_jpeg_dimensions(data)
                        base.update(width=w, height=h, tags=image_tags(data),
                                    imagethumbnail=image_thumbnail(data, tw, th))
                    elif st == "VIDEO":
                        meta = video_metadata(data)
                        base.update(format=meta["format"],
                                    duration=meta["duration"],
                                    width=meta["width"], height=meta["height"],
                                    tags="{}")
                    for c, v in zip(extra, extras):
                        base[c] = v
                    rows.append(base)
                cols = [f.strip().split()[0] for f in schema.split(",")]
                yield pd.DataFrame(rows, columns=cols) if rows else \
                    pd.DataFrame(columns=cols)

        out = df.mapInPandas(extract, schema=schema)
        return self._with_tags(spark, out)

    def _content_table(self, spark: SparkSession) -> DataFrame:
        df = self._binary_df(spark)
        st = self.ds.source_type
        if st == "TEXT":
            return df.select("path",
                             F.decode("content", "UTF-8").alias("textcontent"))
        if st == "IMAGE":
            return df.select("path", F.col("content").alias("imagecontent"))
        if st == "UNSTRUCTURED":
            return df.select("path", F.col("content").alias("bincontent"))
        if st == "VIDEO":
            tw = int(self.ds.options.get(THUMB_W_OPT, DEFAULT_THUMB))
            return df.select("path", F.lit(None).cast("binary").alias("videothumbnail"),
                             F.col("content").alias("videocontent"))
        # PDF
        preview_len = 10_000_000

        def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf_ in batches:
                rows = [{"path": path,
                         "textcontent": pdf_text(bytes(raw), preview_len),
                         "bincontent": bytes(raw)}
                        for path, raw in zip(pdf_["path"], pdf_["content"])]
                yield pd.DataFrame(rows, columns=["path", "textcontent", "bincontent"]) \
                    if rows else pd.DataFrame(columns=["path", "textcontent", "bincontent"])

        return df.mapInPandas(
            extract, schema="path string, textcontent string, bincontent binary")

    # -- TAG sidecars -------------------------------------------------------

    def _with_tags(self, spark: SparkSession, df: DataFrame) -> DataFrame:
        """Append declared TAG columns from `<file>.tag` JSON sidecars
        (UnstructuredFilePartitionReaderFactory.scala:106-116); missing
        sidecar -> nulls. Implemented as a broadcast left join against a
        sidecar DataFrame — metadata-sized, never a shuffle on the fact
        side."""
        if not self.ds.tag_schema:
            return df
        try:
            tags_raw = (spark.read.format("binaryFile")
                        .option("pathGlobFilter", "*.tag")
                        .option("recursiveFileLookup", "true")
                        .load(self.path))
        except Exception:
            tags_raw = None
        tag_schema = self.ds.tag_schema
        if tags_raw is None or not tags_raw.head(1):
            parsed = None
        else:
            parsed = (tags_raw
                      .select(F.expr("substring(path, 1, length(path) - 4)").alias("path"),
                              F.from_json(F.decode("content", "UTF-8"),
                                          tag_schema).alias("t")))
        if parsed is None:
            from pyspark.sql.types import StructType
            empty_struct = F.from_json(F.lit(None).cast("string"), tag_schema)
            return df.withColumn("__t", empty_struct).select("*", "__t.*").drop("__t")
        return (df.join(F.broadcast(parsed), "path", "left")
                .select("*", "t.*").drop("t"))

    # -- writes (INSERT INTO unstructured tables) ---------------------------

    def write_table(self, df: DataFrame, residual: list[str],
                    mode: str = "append") -> None:
        """Write rows back as files (UnstructuredFileWrite.scala:37-93 /
        BinOutputWriter.scala:80-116): each row provides `path` (file
        name) + the modality content column. Image rows also emit the
        `<name>_thumbnail.<ext>` twin file, exactly as BinOutputWriter
        does. foreachPartition — executor-side, no driver collect.

        mode='overwrite' clears the previously-written files matching
        the source glob first (stale rows don't survive an overwrite
        that dropped them); any other non-append mode is rejected.

        Crash safety: new files are fully written into a hidden staging
        directory first; only after every partition has succeeded does
        the commit run — and it renames the staged files into place
        FIRST (``fs.replace``: an atomic POSIX rename locally / HDFS,
        copy+delete on object stores — either way it lands the new file
        over a same-path stale one), and only then deletes the
        remaining stale files that had no replacement. A failure
        mid-write leaves the table untouched, and a failure mid-commit
        can only leave extra old files behind — there is no window
        where a row's data exists nowhere. The staging dir is removed
        only after the replace loop completes; leftover ``.staging-*``
        litter from hard-killed prior runs is swept at the start of the
        next overwrite. Staged files are keyed by their path RELATIVE
        to the table root (not basename), so two same-named files in
        different subdirs of a recursive-scan table never collide and
        are restored into their original subdirs. The stale-file
        cleanup mirrors the datasource's scan mode (recursive/parts
        scans walk subdirs, a file_scan only clears the top level) and
        skips anything that is not a regular file (glob '*' also
        matches directories).

        All I/O routes through model/fs.py (HdfsFileSystem.scala:57
        parity): the table root may be file://, s3://, hdfs://...
        Executors resolve the filesystem INSIDE the partition closure
        from the URL string — no FS handle is pickled."""
        import fnmatch
        import uuid

        from lightning_metastore_spark.model.fs import get_filesystem

        st = self.ds.source_type
        content_col = {"PDF": "bincontent", "TEXT": "textcontent",
                       "IMAGE": "imagecontent", "VIDEO": "videocontent",
                       "UNSTRUCTURED": "bincontent"}[st]
        root_url = self.path
        fs, root = get_filesystem(root_url)
        is_text = st == "TEXT"
        if mode not in ("append", "overwrite"):
            raise CatalogUnitError(
                f"unstructured write supports append/overwrite, not {mode!r}")
        stale: list[str] = []
        if mode == "overwrite":
            # sweep .staging-* litter from hard-killed prior runs (their
            # finally never ran); nothing live can be in them — a live
            # staging dir only exists inside this method's own lifetime
            for entry in fs.listdir(root):
                if entry.startswith(".staging-"):
                    fs.rmtree(fs.join(root, entry), ignore_errors=True)
            # materialize BEFORE deleting: the rows may be derived from
            # the very files we are about to remove
            df = df.localCheckpoint(eager=True)
            pattern = self.ds.options.get("glob", DEFAULT_GLOBS[st])
            # brace-expand {a,b} by hand (fnmatch has no brace support)
            m = re.fullmatch(r"(.*)\{([^}]*)\}(.*)", pattern)
            pats = ([f"{m.group(1)}{alt}{m.group(3)}"
                     for alt in m.group(2).split(",")] if m else [pattern])
            recursive = self.scan_type in ("recursive_scan", "parts_scan")
            for dirpath, dirnames, filenames in fs.walk(root):
                dirnames[:] = [d for d in dirnames
                               if not d.startswith(".staging-")]
                for fn in filenames:
                    if any(fnmatch.fnmatch(fn, p) for p in pats):
                        stale.append(fs.join(dirpath, fn))
                if not recursive:
                    break  # file_scan reads top-level files only
        tw = int(self.ds.options.get(THUMB_W_OPT, DEFAULT_THUMB))
        th = int(self.ds.options.get(THUMB_H_OPT, DEFAULT_THUMB))
        emit_thumb = st == "IMAGE"
        staging_name = f".staging-{uuid.uuid4().hex}"
        staging = fs.join(root, staging_name)
        fs.mkdirs(staging)

        def write_partition(rows) -> None:
            # runs on EXECUTORS: resolve the filesystem from the URL
            # string here (never pickle a driver-side handle)
            import posixpath

            from lightning_metastore_spark.model.fs import (
                get_filesystem,
                split_url,
            )

            pfs, proot = get_filesystem(root_url)
            pstaging = pfs.join(proot, staging_name)
            rootn = posixpath.normpath(proot)

            def staged_name(path: str) -> str:
                # key by path-relative-to-root so same-named files in
                # different subdirs of a recursive table don't collide
                # in staging and get restored into their original
                # subdirs; paths outside the root (new rows named by a
                # bare filename) fall back to basename at the top level
                p = posixpath.normpath(split_url(str(path))[1])
                if p.startswith(rootn + "/"):
                    return posixpath.relpath(p, rootn)
                return posixpath.basename(p)

            def thumb_twin_path(out: str) -> str:
                stem, ext = os.path.splitext(out)
                return f"{stem}_thumbnail{ext}" if ext else out + "_thumbnail"

            for r in rows:
                d = r.asDict()
                name = staged_name(d["path"])
                data = d[content_col]
                out = pfs.join(pstaging, name)
                pfs.write_bytes(out, data.encode("utf-8") if is_text
                                else bytes(data))
                if emit_thumb:
                    # prefer a provided imagethumbnail column, else build
                    thumb = d.get("imagethumbnail") or image_thumbnail(
                        bytes(data), tw, th)
                    if thumb:
                        pfs.write_bytes(thumb_twin_path(out), bytes(thumb))

        try:
            df.foreachPartition(write_partition)
        except Exception:
            # nothing committed yet — the staged partial output is
            # garbage, the table is untouched; clean up and re-raise
            fs.rmtree(staging, ignore_errors=True)
            raise
        # every partition succeeded: commit. Order matters for crash
        # safety — restore staged files FIRST (fs.replace lands the new
        # file over a same-path stale one), THEN delete the stale
        # leftovers that had no replacement, THEN drop the (now empty)
        # staging dir. A crash anywhere in this sequence can only leave
        # extra old files behind, never lose the new data.
        restored: set[str] = set()
        for dirpath, _dirnames, filenames in fs.walk(staging):
            for fn in filenames:
                src = fs.join(dirpath, fn)
                rel = fs.relpath(src, staging)
                dst = fs.join(root, rel)
                parent = fs.parent(dst)
                if parent:
                    fs.mkdirs(parent)
                fs.replace(src, dst)
                restored.add(dst)
        for f in stale:
            if f not in restored and fs.is_file(f):
                fs.remove(f)
        fs.rmtree(staging, ignore_errors=True)


def read_jsonl_with_quarantine(spark, path: str, schema: str):
    """JSONL corpus ingest with bad-record quarantine: returns
    (good_df, bad_df) where malformed lines land in the quarantine
    frame with their raw text instead of poisoning the batch — the
    PERMISSIVE + columnNameOfCorruptRecord pattern every production
    ingest front end runs.

    ``schema`` is the expected DDL ("doc_id long, text string", ...);
    rows where Spark could parse nothing keep only the raw line. The
    split is one predicate on the corrupt column — the source is still
    a single scan, and both frames prune/push down independently.
    """
    from pyspark.sql import functions as F

    full = schema + ", _corrupt string"
    df = (spark.read
          .schema(full)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .json(path))
    # cache the parse: the corrupt-column split reads the source twice
    # otherwise, and Spark requires referencing the corrupt column only
    # from a materialized frame (SPARK-21610)
    df = df.cache()
    good = df.filter(F.col("_corrupt").isNull()).drop("_corrupt")
    bad = (df.filter(F.col("_corrupt").isNotNull())
           .select(F.col("_corrupt").alias("raw_line")))
    return good, bad
