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
