"""Unstructured source tests mirroring RegisterTextDataSourceTestSuite /
RegisterImageDataSourceTestSuite / RegisterPdfDataSourceTestSuite:
3 scan modes, content tables, TAG sidecars, filter pushdown on metadata,
and the write path."""

from __future__ import annotations

import json
import struct
import sys
import zlib

import pytest

sys.path.insert(0, "/root/repo")

from lightning_metastore_spark.context import LightningContext  # noqa: E402


def make_png(width: int, height: int) -> bytes:
    """Minimal valid PNG with the given dimensions."""
    def chunk(typ: bytes, data: bytes) -> bytes:
        raw = typ + data
        return struct.pack(">I", len(data)) + raw + struct.pack(
            ">I", zlib.crc32(raw) & 0xFFFFFFFF)

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    row = b"\x00" + b"\x80\x80\x80" * width
    idat = zlib.compress(row * height)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b""))


@pytest.fixture()
def ctx(spark, tmp_path):
    return LightningContext(spark, warehouse=str(tmp_path / "model"))


@pytest.fixture()
def text_tree(tmp_path):
    root = tmp_path / "text"
    root.mkdir()
    (root / "aa.txt").write_text("aa\n")
    (root / "bb.txt").write_text("bb content here\n")
    (root / "subdir").mkdir()
    (root / "subdir" / "cc.txt").write_text("cc nested\n")
    parts = tmp_path / "text-parts"
    for ct in ("alpha", "numeric"):
        d = parts / f"ct={ct}"
        d.mkdir(parents=True)
        (d / f"{ct}1.txt").write_text(f"{ct} one\n")
        (d / f"{ct}2.txt").write_text(f"{ct} two\n")
    return root, parts


def test_text_file_scan(ctx, text_tree):
    root, _ = text_tree
    ctx.sql("CREATE NAMESPACE lightning.datasource.files")
    ctx.sql(f"REGISTER TEXT DATASOURCE txt OPTIONS(path '{root}') "
            f"NAMESPACE lightning.datasource.files")
    rows = ctx.sql("SELECT * FROM lightning.datasource.files.txt "
                   "ORDER BY path").collect()
    # file_scan: leaf files of root only — no subdir files
    assert len(rows) == 2
    assert rows[0].type == "text" and rows[0].preview == "aa\n"
    assert rows[0].sizeinbytes == 3


def test_text_recursive_scan_subdir_column(ctx, text_tree):
    root, _ = text_tree
    ctx.sql("CREATE NAMESPACE lightning.datasource.files")
    ctx.sql(f"REGISTER TEXT DATASOURCE txt OPTIONS(path '{root}', "
            f"scan_type 'recursive_scan') NAMESPACE lightning.datasource.files")
    rows = ctx.sql("SELECT path, subdir FROM lightning.datasource.files.txt "
                   "ORDER BY path").collect()
    assert len(rows) == 3
    subdirs = {r.path.split("/")[-1]: r.subdir for r in rows}
    assert subdirs["cc.txt"] == "subdir"
    assert subdirs["aa.txt"] == ""


def test_text_parts_scan_partition_pruning(ctx, text_tree):
    _, parts = text_tree
    ctx.sql("CREATE NAMESPACE lightning.datasource.files")
    ctx.sql(f"REGISTER TEXT DATASOURCE tp OPTIONS(path '{parts}', "
            f"scan_type 'parts_scan') NAMESPACE lightning.datasource.files")
    rows = ctx.sql("SELECT path, ct FROM lightning.datasource.files.tp "
                   "WHERE ct = 'alpha'").collect()
    assert len(rows) == 2 and all(r.ct == "alpha" for r in rows)


def test_text_content_table(ctx, text_tree):
    root, _ = text_tree
    ctx.sql("CREATE NAMESPACE lightning.datasource.files")
    ctx.sql(f"REGISTER TEXT DATASOURCE txt OPTIONS(path '{root}') "
            f"NAMESPACE lightning.datasource.files")
    rows = ctx.sql("SELECT * FROM lightning.datasource.files.txt.content "
                   "ORDER BY path").collect()
    assert rows[0].textcontent == "aa\n"
    assert rows[1].textcontent == "bb content here\n"


def test_text_tags_sidecar(ctx, text_tree):
    """TAG columns from .tag sidecars; missing sidecar -> nulls
    (RegisterImageDataSourceTestSuite.scala:224-276 pattern)."""
    root, _ = text_tree
    (root / "aa.txt.tag").write_text(json.dumps({"author": "bob", "score": 3}))
    ctx.sql("CREATE NAMESPACE lightning.datasource.files")
    ctx.sql(f"REGISTER TEXT DATASOURCE txt OPTIONS(path '{root}') "
            f"NAMESPACE lightning.datasource.files "
            f"TAG (author string, score int)")
    rows = {r.path.split("/")[-1]: r for r in
            ctx.sql("SELECT * FROM lightning.datasource.files.txt").collect()}
    assert rows["aa.txt"].author == "bob" and rows["aa.txt"].score == 3
    assert rows["bb.txt"].author is None and rows["bb.txt"].score is None


def test_image_dimensions_and_content(ctx, tmp_path):
    root = tmp_path / "img"
    root.mkdir()
    (root / "small.png").write_bytes(make_png(230, 148))
    (root / "big.png").write_bytes(make_png(270, 148))
    ctx.sql("CREATE NAMESPACE lightning.datasource.files")
    ctx.sql(f"REGISTER IMAGE DATASOURCE img OPTIONS(path '{root}') "
            f"NAMESPACE lightning.datasource.files")
    rows = {r.path.split("/")[-1]: r for r in
            ctx.sql("SELECT * FROM lightning.datasource.files.img").collect()}
    assert (rows["small.png"].width, rows["small.png"].height) == (230, 148)
    assert (rows["big.png"].width, rows["big.png"].height) == (270, 148)
    # metadata filter pushdown path: width predicate evaluated after extract
    wide = ctx.sql("SELECT path FROM lightning.datasource.files.img "
                   "WHERE width > 250").collect()
    assert len(wide) == 1
    content = ctx.sql("SELECT * FROM lightning.datasource.files.img.content "
                      "ORDER BY path").collect()
    assert content[1].imagecontent[:8] == b"\x89PNG\r\n\x1a\n"


def test_files_listing_table(ctx, text_tree):
    """<name>.files = metadata-only fast path: no content read, no
    extraction UDF in the plan."""
    root, _ = text_tree
    ctx.sql("CREATE NAMESPACE lightning.datasource.files")
    ctx.sql(f"REGISTER TEXT DATASOURCE txt OPTIONS(path '{root}') "
            f"NAMESPACE lightning.datasource.files")
    df = ctx.sql("SELECT path, sizeinbytes FROM "
                 "lightning.datasource.files.txt.files ORDER BY path")
    rows = df.collect()
    assert [r.sizeinbytes for r in rows] == [3, 16]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan  # no extraction stage
    assert "content" not in plan.split("ReadSchema")[-1][:200]  # pruned


def test_update_file_tags(ctx, text_tree):
    """UPDATE ... SET over tag sidecars — the reference's unfinished
    feature (UpdateLightningTableTag.scala), working here."""
    root, _ = text_tree
    ctx.sql("CREATE NAMESPACE lightning.datasource.files")
    ctx.sql(f"REGISTER TEXT DATASOURCE txt OPTIONS(path '{root}') "
            f"NAMESPACE lightning.datasource.files "
            f"TAG (author string, score int)")
    out = ctx.sql("""UPDATE lightning.datasource.files.txt
        SET author = 'alice', score = 7
        WHERE sizeinbytes > 5""").collect()
    assert out[0].n_files == 1  # only bb.txt (16 B) matches
    rows = {r.path.split("/")[-1]: r for r in
            ctx.sql("SELECT * FROM lightning.datasource.files.txt").collect()}
    assert rows["bb.txt"].author == "alice" and rows["bb.txt"].score == 7
    assert rows["aa.txt"].author is None
    # update everything (no WHERE), expression value
    ctx.sql("UPDATE lightning.datasource.files.txt SET score = 1 + 1")
    rows = {r.path.split("/")[-1]: r for r in
            ctx.sql("SELECT * FROM lightning.datasource.files.txt").collect()}
    assert all(r.score == 2 for r in rows.values())


def test_update_tags_where_on_updated_tag_column(ctx, text_tree):
    """Regression: n_files must be counted BEFORE sidecars are rewritten
    — a lazy recount after the write re-reads the updated tags and a
    WHERE on the tag column being SET would report 0."""
    root, _ = text_tree
    ctx.sql("CREATE NAMESPACE lightning.datasource.files")
    ctx.sql(f"REGISTER TEXT DATASOURCE txt OPTIONS(path '{root}') "
            f"NAMESPACE lightning.datasource.files TAG (status string)")
    ctx.sql("UPDATE lightning.datasource.files.txt SET status = 'pending'")
    out = ctx.sql("UPDATE lightning.datasource.files.txt SET status = 'done' "
                  "WHERE status = 'pending'").collect()
    assert out[0].n_files == 2  # both files matched the pre-update state
    rows = ctx.sql("SELECT status FROM lightning.datasource.files.txt").collect()
    assert all(r.status == "done" for r in rows)


def test_unstructured_write_roundtrip(ctx, spark, text_tree):
    """INSERT-INTO-style write-back (UnstructuredFileWrite.scala:37-93)."""
    root, _ = text_tree
    ctx.sql("CREATE NAMESPACE lightning.datasource.files")
    ctx.sql(f"REGISTER TEXT DATASOURCE txt OPTIONS(path '{root}') "
            f"NAMESPACE lightning.datasource.files")
    from lightning_metastore_spark.catalog.units import load_catalog_unit
    ds = ctx.metastore.load_datasource(["files"], "txt")
    unit = load_catalog_unit(ds)
    new = spark.createDataFrame([("dd.txt", "written back")],
                                ["path", "textcontent"])
    unit.write_table(new, [])
    rows = ctx.sql("SELECT * FROM lightning.datasource.files.txt "
                   "WHERE path LIKE '%dd.txt'").collect()
    assert len(rows) == 1 and rows[0].preview == "written back"


def test_pdf_flate_extraction_real(ctx, tmp_path):
    """Compressed (FlateDecode) PDFs — the shape virtually every
    real-world PDF has — must yield REAL text, not the old stub's empty
    string (parity: RegisterPdfDataSourceTestSuite content asserts)."""
    from tests.test_codecs import make_flate_pdf
    root = tmp_path / "pdfs"
    root.mkdir()
    (root / "report.pdf").write_bytes(
        make_flate_pdf("Quarterly revenue rose 12 percent.",
                       "Risks remain in logistics."))
    ctx.sql("CREATE NAMESPACE lightning.datasource.files")
    ctx.sql(f"REGISTER PDF DATASOURCE docs OPTIONS(path '{root}') "
            f"NAMESPACE lightning.datasource.files")
    meta = ctx.sql(
        "SELECT preview FROM lightning.datasource.files.docs").collect()
    assert "Quarterly revenue rose 12 percent." in meta[0].preview
    content = ctx.sql("SELECT textcontent FROM "
                      "lightning.datasource.files.docs.content").collect()
    assert "Risks remain in logistics." in content[0].textcontent


def test_image_thumbnail_and_exif_real(ctx, tmp_path):
    """Thumbnails + EXIF without Pillow: pure-stdlib PNG decode/resize
    and TIFF IFD walk (parity: UnstructuredData.scala:195-202 +
    metadata-extractor)."""
    from lightning_metastore_spark.sources import codecs
    from tests.test_codecs import gradient_rows
    root = tmp_path / "img"
    root.mkdir()
    (root / "photo.png").write_bytes(
        codecs.png_encode(64, 32, gradient_rows(64, 32)))
    ctx.sql("CREATE NAMESPACE lightning.datasource.files")
    ctx.sql(f"REGISTER IMAGE DATASOURCE img OPTIONS(path '{root}', "
            f"image_thumbnail_with '16', image_thumbnail_height '16') "
            f"NAMESPACE lightning.datasource.files")
    row = ctx.sql("SELECT * FROM lightning.datasource.files.img").collect()[0]
    assert (row.width, row.height) == (64, 32)
    assert row.imagethumbnail is not None
    tw, th, _ = codecs.png_decode(bytes(row.imagethumbnail))
    assert (tw, th) == (16, 8)  # aspect-fit inside 16x16


def test_video_avi_and_mkv_metadata(ctx, tmp_path):
    """Non-MP4 containers (parity: VideoReaderFactory.scala:36-107 reads
    tags for many formats via metadata-extractor)."""
    from tests.test_codecs import make_avi, make_mkv
    root = tmp_path / "vid"
    root.mkdir()
    (root / "clip.avi").write_bytes(make_avi(40_000, 250, 640, 480))
    (root / "clip.mkv").write_bytes(make_mkv(12.5, 1_000_000, 1280, 720))
    ctx.sql("CREATE NAMESPACE lightning.datasource.files")
    ctx.sql(f"REGISTER VIDEO DATASOURCE vid OPTIONS(path '{root}') "
            f"NAMESPACE lightning.datasource.files")
    rows = {r.path.split("/")[-1]: r for r in
            ctx.sql("SELECT * FROM lightning.datasource.files.vid").collect()}
    avi = rows["clip.avi"]
    assert avi.format == "avi" and abs(avi.duration - 10.0) < 0.01
    assert (avi.width, avi.height) == (640, 480)
    mkv = rows["clip.mkv"]
    assert mkv.format == "matroska" and abs(mkv.duration - 12.5) < 0.05
    assert (mkv.width, mkv.height) == (1280, 720)


def test_generic_unstructured_fallback(ctx, tmp_path):
    """UNSTRUCTURED modality = any-file binary fallback
    (UnstructuredFileFormat.scala): metadata listing + bincontent."""
    root = tmp_path / "blob"
    root.mkdir()
    (root / "data.bin").write_bytes(b"\x00\x01\x02\x03")
    (root / "notes.xyz").write_bytes(b"opaque")
    ctx.sql("CREATE NAMESPACE lightning.datasource.files")
    ctx.sql(f"REGISTER UNSTRUCTURED DATASOURCE blob OPTIONS(path '{root}') "
            f"NAMESPACE lightning.datasource.files")
    rows = ctx.sql("SELECT * FROM lightning.datasource.files.blob "
                   "ORDER BY path").collect()
    assert [r.path.split("/")[-1] for r in rows] == ["data.bin", "notes.xyz"]
    assert rows[0].type == "unstructured" and rows[0].sizeinbytes == 4
    content = ctx.sql("SELECT * FROM lightning.datasource.files.blob.content "
                      "ORDER BY path").collect()
    assert bytes(content[0].bincontent) == b"\x00\x01\x02\x03"


def test_write_overwrite_clears_stale_files(ctx, spark, tmp_path):
    """mode='overwrite' must remove files the new rowset no longer
    contains (the old writer silently appended)."""
    root = tmp_path / "txt"
    root.mkdir()
    (root / "keep.txt").write_text("old keep")
    (root / "drop.txt").write_text("to be dropped")
    ctx.sql("CREATE NAMESPACE lightning.datasource.files")
    ctx.sql(f"REGISTER TEXT DATASOURCE txt OPTIONS(path '{root}') "
            f"NAMESPACE lightning.datasource.files")
    from lightning_metastore_spark.catalog.units import load_catalog_unit
    unit = load_catalog_unit(ctx.metastore.load_datasource(["files"], "txt"))
    new = spark.createDataFrame([("keep.txt", "new keep")],
                                ["path", "textcontent"])
    unit.write_table(new, [], mode="overwrite")
    rows = ctx.sql("SELECT path, preview FROM "
                   "lightning.datasource.files.txt").collect()
    assert len(rows) == 1
    assert rows[0].preview == "new keep"
    import pytest as _pt
    from lightning_metastore_spark.catalog.units import CatalogUnitError
    with _pt.raises(CatalogUnitError, match="append/overwrite"):
        unit.write_table(new, [], mode="error_if_exists")


def test_write_overwrite_staged_and_subdir_safe(ctx, spark, tmp_path):
    """Overwrite cleanup must skip directories (glob '*' matches them),
    must clear stale files under subdirs when the scan mode is
    recursive, must leave them alone for a top-level file_scan, and
    must leave no staging litter behind."""
    from lightning_metastore_spark.catalog.units import load_catalog_unit
    root = tmp_path / "blob"
    sub = root / "nested"
    sub.mkdir(parents=True)
    (root / "top.bin").write_bytes(b"old-top")
    (sub / "deep.bin").write_bytes(b"old-deep")
    ctx.sql("CREATE NAMESPACE lightning.datasource.files")
    ctx.sql(f"REGISTER UNSTRUCTURED DATASOURCE flatblob OPTIONS("
            f"path '{root}') NAMESPACE lightning.datasource.files")
    unit = load_catalog_unit(
        ctx.metastore.load_datasource(["files"], "flatblob"))
    new = spark.createDataFrame([("fresh.bin", bytearray(b"fresh"))],
                                ["path", "bincontent"])
    # file_scan: the subdirectory itself must not break the walk, and
    # its contents are out of scope for the overwrite
    unit.write_table(new, [], mode="overwrite")
    assert not (root / "top.bin").exists()
    assert (root / "fresh.bin").read_bytes() == b"fresh"
    assert (sub / "deep.bin").read_bytes() == b"old-deep"
    # recursive_scan: the nested stale file is in scope and goes away
    ctx.sql(f"REGISTER UNSTRUCTURED DATASOURCE deepblob OPTIONS("
            f"path '{root}', scan_type 'recursive_scan') "
            f"NAMESPACE lightning.datasource.files")
    unit2 = load_catalog_unit(
        ctx.metastore.load_datasource(["files"], "deepblob"))
    unit2.write_table(new, [], mode="overwrite")
    assert not (sub / "deep.bin").exists()
    assert (root / "fresh.bin").read_bytes() == b"fresh"
    assert not [p for p in root.iterdir() if p.name.startswith(".staging-")]


def test_write_same_basename_different_subdirs(ctx, spark, tmp_path):
    """Two rows whose paths share a basename but live in different
    subdirs of a recursive table must both survive an overwrite (the
    old writer keyed staging by basename — the second silently
    clobbered the first) and be restored into their original subdirs."""
    from lightning_metastore_spark.catalog.units import load_catalog_unit
    root = tmp_path / "tree"
    a = root / "a"
    b = root / "b"
    a.mkdir(parents=True)
    b.mkdir()
    (a / "doc.txt").write_text("old a")
    (b / "doc.txt").write_text("old b")
    ctx.sql("CREATE NAMESPACE lightning.datasource.files")
    ctx.sql(f"REGISTER TEXT DATASOURCE tree OPTIONS(path '{root}', "
            f"scan_type 'recursive_scan') NAMESPACE "
            f"lightning.datasource.files")
    unit = load_catalog_unit(ctx.metastore.load_datasource(["files"], "tree"))
    new = spark.createDataFrame(
        [(str(a / "doc.txt"), "new a"), (str(b / "doc.txt"), "new b")],
        ["path", "textcontent"])
    unit.write_table(new, [], mode="overwrite")
    assert (a / "doc.txt").read_text() == "new a"
    assert (b / "doc.txt").read_text() == "new b"
    rows = ctx.sql("SELECT subdir, preview FROM "
                   "lightning.datasource.files.tree ORDER BY subdir").collect()
    assert [(r.subdir, r.preview) for r in rows] == [("a", "new a"),
                                                     ("b", "new b")]


def test_overwrite_sweeps_stale_staging_litter(ctx, spark, tmp_path):
    """A .staging-* dir left by a hard-killed prior run must be removed
    by the next overwrite, not accumulate forever."""
    from lightning_metastore_spark.catalog.units import load_catalog_unit
    root = tmp_path / "txt"
    root.mkdir()
    (root / "keep.txt").write_text("old")
    litter = root / ".staging-deadbeef"
    litter.mkdir()
    (litter / "orphan.txt").write_text("orphaned partial write")
    ctx.sql("CREATE NAMESPACE lightning.datasource.files")
    ctx.sql(f"REGISTER TEXT DATASOURCE txt OPTIONS(path '{root}') "
            f"NAMESPACE lightning.datasource.files")
    unit = load_catalog_unit(ctx.metastore.load_datasource(["files"], "txt"))
    new = spark.createDataFrame([("keep.txt", "new")],
                                ["path", "textcontent"])
    unit.write_table(new, [], mode="overwrite")
    assert not litter.exists()
    assert (root / "keep.txt").read_text() == "new"
    assert not [p for p in root.iterdir() if p.name.startswith(".staging-")]


def test_image_write_emits_thumbnail_twin(ctx, spark, tmp_path):
    """BinOutputWriter.scala:80-116 parity: writing image content also
    writes the `<name>_thumbnail.<ext>` twin file."""
    from lightning_metastore_spark.sources import codecs
    from tests.test_codecs import gradient_rows
    root = tmp_path / "img"
    root.mkdir()
    ctx.sql("CREATE NAMESPACE lightning.datasource.files")
    ctx.sql(f"REGISTER IMAGE DATASOURCE img OPTIONS(path '{root}', "
            f"image_thumbnail_with '8', image_thumbnail_height '8') "
            f"NAMESPACE lightning.datasource.files")
    from lightning_metastore_spark.catalog.units import load_catalog_unit
    unit = load_catalog_unit(ctx.metastore.load_datasource(["files"], "img"))
    png = codecs.png_encode(32, 32, gradient_rows(32, 32))
    df = spark.createDataFrame([("shot.png", bytearray(png))],
                               ["path", "imagecontent"])
    unit.write_table(df, [])
    assert (root / "shot.png").read_bytes() == png
    twin = (root / "shot_thumbnail.png").read_bytes()
    tw, th, _ = codecs.png_decode(twin)
    assert (tw, th) == (8, 8)


def test_jsonl_quarantine_split(spark, tmp_path):
    from lightning_metastore_spark.sources.unstructured import (
        read_jsonl_with_quarantine)

    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "good row"}\n'
        'this is not json at all\n'
        '{"doc_id": 2, "text": "another good"}\n'
        '{"doc_id": broken json, "text": }\n')
    good, bad = read_jsonl_with_quarantine(
        spark, str(p), "doc_id long, text string")
    rows = {r.doc_id: r.text for r in good.collect()}
    assert rows == {1: "good row", 2: "another good"}
    raws = sorted(r.raw_line for r in bad.collect())
    assert raws == sorted(["this is not json at all",
                           '{"doc_id": broken json, "text": }'])
