"""Offline Apache Iceberg writer: spec-conformant v2 commits without
the runtime jar — the write-side twin of `sources/iceberg_reader.py`.

The reference's Iceberg scenarios are CREATE TABLE + INSERT INTO +
`.history` + VERSION AS OF (`RegisterIcebergDataSourceTestSuite.scala:
151-184`); with this module they run end-to-end offline, exactly like
the Delta unit's story (`sources/delta_reader.py`). Each commit:

- stages parquet data files via Spark's own writer and moves them under
  `data/` with sequence-stamped names;
- writes ONE manifest (Avro, `sources/avro_codec.py`) whose entries
  carry the new data sequence number — the field the reader's v2
  equality-delete scoping consumes;
- writes a new manifest list = the parent snapshot's manifests (their
  sequence numbers carried over) plus the new one — or ONLY the new
  one for `overwrite`, which is how a snapshot replaces table contents
  while every older snapshot (and time travel to it) stays intact;
- appends the snapshot + snapshot-log entry and writes
  `v{N+1}.metadata.json` + `version-hint.text` (single-writer
  semantics: the repo runs one driver; a real multi-writer needs the
  runtime's atomic catalog swap).

Unpartitioned writes only (spec-id 0) — identity-partition source
columns live in the data files anyway, which is all the offline reader
needs. Schema is translated from the DataFrame with field ids assigned
1..n at create; appends align by position and cast to the table schema
(Spark INSERT semantics, same as the Delta writer).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from lightning_metastore_spark.sources import avro_codec as ac
from lightning_metastore_spark.sources import iceberg_reader as ir

# the manifest-file / manifest-list Avro schemas this writer emits —
# the subset of the spec's fields the planner path needs, under the
# spec's field names (the reader decodes ANY conforming writer schema,
# so richer files from real runtimes still read fine)
MANIFEST_SCHEMA = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "sequence_number", "type": ["null", "long"]},
        {"name": "data_file", "type": {
            "type": "record", "name": "r2", "fields": [
                {"name": "content", "type": "int"},
                {"name": "file_path", "type": "string"},
                {"name": "file_format", "type": "string"},
                {"name": "record_count", "type": "long"},
                {"name": "file_size_in_bytes", "type": "long"},
                {"name": "equality_ids",
                 "type": ["null", {"type": "array", "items": "int"}]},
            ]}},
    ]}

MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": ["null", "long"]},
        {"name": "added_snapshot_id", "type": "long"},
    ]}

_ICE_PRIM = {
    "boolean": "boolean", "integer": "int", "long": "long",
    "float": "float", "double": "double", "string": "string",
    "date": "date", "timestamp": "timestamptz",
    "timestamp_ntz": "timestamp", "binary": "binary",
}


def _iceberg_schema_json(spark_schema) -> dict:
    fields = []
    for i, f in enumerate(spark_schema.fields, start=1):
        tn = f.dataType.typeName()
        if tn in _ICE_PRIM:
            itype = _ICE_PRIM[tn]
        elif tn == "decimal":
            itype = f"decimal({f.dataType.precision}, {f.dataType.scale})"
        else:
            raise ir.IcebergError(
                f"offline Iceberg writes support flat primitive schemas; "
                f"column {f.name} has type {tn}")
        fields.append({"id": i, "name": f.name,
                       "required": not f.nullable, "type": itype})
    return {"type": "struct", "schema-id": 0, "fields": fields}


def write_iceberg(df: DataFrame, table_path: str,
                  mode: str = "append") -> None:
    """Create/append/overwrite an unpartitioned Iceberg table offline."""
    if mode not in ("append", "overwrite", "error", "errorifexists"):
        raise ir.IcebergError(f"unsupported save mode: {mode}")
    spark = df.sparkSession
    mdir = os.path.join(table_path, "metadata")
    ddir = os.path.join(table_path, "data")
    exists = os.path.isdir(mdir) and any(
        f.endswith(".metadata.json") for f in os.listdir(mdir))
    if exists and mode in ("error", "errorifexists"):
        raise ir.IcebergError(f"Iceberg table already exists: {table_path}")
    now_ms = int(time.time() * 1000)

    if exists:
        meta = ir.load_metadata(table_path)
        table_schema = ir.spark_schema(meta)
        # INSERT semantics for append AND overwrite: align by position,
        # cast to the table schema (no schema evolution offline)
        if len(df.columns) != len(table_schema.fields):
            raise ir.IcebergError(
                f"write width mismatch: {len(df.columns)} columns "
                f"vs table's {len(table_schema.fields)}")
        df = df.select(*[
            F.col(c).cast(f.dataType).alias(f.name)
            for c, f in zip(df.columns, table_schema.fields)])
        seq = int(meta.get("last-sequence-number", 0)) + 1
        snap_id = max((s["snapshot-id"] for s in meta.get("snapshots", [])),
                      default=0) + 1
        parent = meta.get("current-snapshot-id")
        version = 1 + max(
            int(f[1:].split(".")[0]) for f in os.listdir(mdir)
            if f.startswith("v") and f.endswith(".metadata.json"))
    else:
        meta = {
            "format-version": 2,
            "table-uuid": "00000000-0000-0000-0000-000000000000",
            "location": table_path,
            "last-sequence-number": 0,
            "last-updated-ms": now_ms,
            "last-column-id": len(df.columns),
            "current-schema-id": 0,
            "schemas": [_iceberg_schema_json(df.schema)],
            "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "last-partition-id": 999,
            "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "snapshots": [],
            "snapshot-log": [],
        }
        os.makedirs(mdir, exist_ok=True)
        os.makedirs(ddir, exist_ok=True)
        seq, snap_id, parent, version = 1, 1, None, 1

    # stage data files via Spark's writer, move under data/
    staging = os.path.join(table_path, f".staging-{now_ms}")
    df.write.mode("overwrite").parquet(staging)
    data_files: list[str] = []
    i = 0
    for f in sorted(os.listdir(staging)):
        if f.endswith(".parquet") and not f.startswith((".", "_")):
            dst = os.path.join(ddir, f"{seq:05d}-{i:05d}.parquet")
            os.rename(os.path.join(staging, f), dst)
            data_files.append(dst)
            i += 1
    shutil.rmtree(staging, ignore_errors=True)

    def _num_rows(p: str) -> int:
        # real record counts from the parquet footer (a real runtime
        # reading our table uses them for planning); pyarrow footer
        # reads are metadata-only
        try:
            import pyarrow.parquet as pq
            return int(pq.ParquetFile(p).metadata.num_rows)
        except Exception:  # noqa: BLE001 — counts are advisory
            return 0

    manifest = os.path.join(mdir, f"m-{snap_id}.avro")
    ac.write_container(manifest, MANIFEST_SCHEMA, [
        {"status": 1, "snapshot_id": snap_id, "sequence_number": seq,
         "data_file": {"content": 0, "file_path": p,
                       "file_format": "PARQUET",
                       "record_count": _num_rows(p),
                       "file_size_in_bytes": os.path.getsize(p),
                       "equality_ids": None}}
        for p in data_files])

    carried: list[dict] = []
    if exists and mode == "append" and parent is not None:
        prev = next(s for s in meta["snapshots"]
                    if s["snapshot-id"] == parent)
        carried = list(ac.iter_records(ir._local(prev["manifest-list"])))
    mlist = os.path.join(mdir, f"snap-{snap_id}.avro")
    ac.write_container(mlist, MANIFEST_LIST_SCHEMA, carried + [
        {"manifest_path": manifest,
         "manifest_length": os.path.getsize(manifest),
         "partition_spec_id": 0, "content": 0, "sequence_number": seq,
         "added_snapshot_id": snap_id}])

    snap = {"snapshot-id": snap_id, "timestamp-ms": now_ms,
            "sequence-number": seq, "manifest-list": mlist,
            "summary": {"operation":
                        "append" if mode == "append" or not exists
                        else "overwrite"}}
    if parent is not None:
        snap["parent-snapshot-id"] = parent
    meta["snapshots"] = list(meta.get("snapshots", [])) + [snap]
    meta["snapshot-log"] = list(meta.get("snapshot-log", [])) + [
        {"timestamp-ms": now_ms, "snapshot-id": snap_id}]
    meta["current-snapshot-id"] = snap_id
    meta["last-sequence-number"] = seq
    meta["last-updated-ms"] = now_ms

    tmp = os.path.join(mdir, f".v{version}.metadata.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    final = os.path.join(mdir, f"v{version}.metadata.json")
    if os.path.exists(final):
        raise ir.IcebergError(f"concurrent write: {final} exists")
    os.rename(tmp, final)
    with open(os.path.join(mdir, "version-hint.text"), "w") as fh:
        fh.write(str(version))
