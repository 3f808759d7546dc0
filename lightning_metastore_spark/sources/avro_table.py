"""Distributed Avro table read/write on the pure-Python codec.

The image ships no spark-avro module for this Scala line (the single
skipped test), so the reference's Avro file tables
(`FileCatalogUnit.scala:61-73`) would be registration-only. This module
is the no-jar fallback the catalog unit drops to when
`spark.read.format("avro")` raises: schema from the first file's
container header (driver, header-only), then tasks decode byte-range
SPLITS executor-side (sync-marker anchored, the JVM input format's
contract — one giant file still fans out) and `createDataFrame`
applies the translated Spark schema. Writes mirror Spark's own file
sinks: a directory of `part-NNNNN.avro` files written per-partition
from the executors plus `_SUCCESS`, so round-trips stay
directory-compatible with spark-avro.

The decode is row-at-a-time Python and honestly the slow path; it
exists so the surface WORKS without the jar, and upgrades to the JVM
reader the moment one is present. Reader/writer OPTIONS beyond the
path are not interpreted here — the catalog unit refuses the fallback
when avro-specific options were registered, rather than silently
ignoring them.
"""

from __future__ import annotations

import os
import shutil
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from lightning_metastore_spark.sources import avro_codec as ac


_SIZE_SUFFIX = {"": 1, "b": 1, "k": 1 << 10, "kb": 1 << 10,
                "m": 1 << 20, "mb": 1 << 20, "g": 1 << 30, "gb": 1 << 30}


def _parse_size_bytes(raw: str) -> int:
    """Spark size-conf strings: '134217728', '128m', '1g', '512MB'."""
    import re
    m = re.fullmatch(r"\s*(\d+)\s*([a-zA-Z]*)\s*", raw)
    if not m or m.group(2).lower() not in _SIZE_SUFFIX:
        return 128 * 1024 * 1024
    return int(m.group(1)) * _SIZE_SUFFIX[m.group(2).lower()]


def _data_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    if os.path.isdir(path):
        out = []
        for root, _dirs, files in os.walk(path):
            for f in sorted(files):
                if f.endswith(".avro") and not f.startswith((".", "_")):
                    out.append(os.path.join(root, f))
        return sorted(out)
    raise ac.AvroError(f"no Avro data at {path}")


def read_avro(spark: SparkSession, path: str,
              schema: Optional[object] = None,
              split_bytes: Optional[int] = None) -> DataFrame:
    """Read an Avro file or directory without spark-avro.

    Parallelism is sync-marker splits, the same contract the JVM Avro
    input format uses: each file is cut into byte ranges of
    ``split_bytes`` (default: `spark.sql.files.maxPartitionBytes`) and
    a task owns every block whose payload starts inside its range
    (`avro_codec.iter_records_range`), so one giant file still fans
    out across the cluster. Tasks open `path` directly, so executors
    must see the same filesystem as the driver (local mode or a shared
    POSIX mount) — the same constraint `write_avro` enforces."""
    files = _data_files(path)
    if not files:
        raise ac.AvroError(f"no .avro part files under {path}")
    avro_schema = ac.read_schema(files[0])
    spark_schema = schema or ac.to_spark_type(avro_schema)
    if split_bytes is None:
        try:
            raw = spark.conf.get("spark.sql.files.maxPartitionBytes",
                                 "134217728")
            # sanity floor on the conf-derived value only: a mis-parsed
            # conf must never explode into millions of splits
            split_bytes = max(_parse_size_bytes(str(raw)), 1024 * 1024)
        except Exception:  # noqa: BLE001 — conf probe only
            split_bytes = 128 * 1024 * 1024
    split_bytes = max(int(split_bytes), 1)
    splits: list[tuple[str, int, int]] = []
    for f in files:
        size = os.path.getsize(f)
        lo = 0
        while lo < size:
            splits.append((f, lo, min(lo + split_bytes, size)))
            lo += split_bytes
        if size == 0:
            splits.append((f, 0, 0))
    sc = spark.sparkContext
    rdd = (sc.parallelize(splits, len(splits))
           .flatMap(lambda s: ac.iter_records_range(s[0], s[1], s[2])))
    # dict records + explicit schema: Spark's own converter handles
    # Decimal / date / datetime / nested dict-structs / maps exactly
    return spark.createDataFrame(rdd, spark_schema)


def write_avro(df: DataFrame, path: str, mode: str = "append",
               codec: str = "deflate") -> None:
    """Write a DataFrame as a directory of Avro part files (no jar).

    Part files are written from inside `foreachPartition` against
    `path` as seen by EACH EXECUTOR, so the write is only correct when
    executors share the driver's filesystem — local mode, or a shared
    POSIX mount (NFS/Lustre). On a plain multi-node cluster the parts
    would land on executor-local disks while `_SUCCESS` advertised a
    complete directory, so non-local, non-shared setups are refused;
    clusters with real distributed storage have the spark-avro jar and
    never reach this fallback."""
    if mode not in ("append", "overwrite", "error", "errorifexists"):
        raise ac.AvroError(f"unsupported save mode: {mode}")
    master = df.sparkSession.sparkContext.master or ""
    if not master.startswith("local"):
        raise ac.AvroError(
            f"the no-jar Avro writer requires a filesystem shared "
            f"between driver and executors and refuses master "
            f"'{master}'; install spark-avro for cluster writes")
    exists = os.path.exists(path)
    if exists and mode in ("error", "errorifexists"):
        raise ac.AvroError(f"path already exists: {path}")
    if exists and os.path.isfile(path):
        raise ac.AvroError(
            f"{path} is a single Avro file; the no-jar writer produces "
            "directories — write to a new path")
    if exists and mode == "overwrite":
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)
    avro_schema = ac.from_spark_schema(df.schema)
    # unique prefix per write so 'append' never collides with existing
    # part files (mirrors Spark's per-job UUID in file names)
    import hashlib
    salt = hashlib.md5(repr(sorted(os.listdir(path))).encode()).hexdigest()[:8]

    def _write_partition(rows_iter):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        rows = [r.asDict(recursive=True) for r in rows_iter]
        if not rows and pid != 0:
            return
        ac.write_container(
            os.path.join(path, f"part-{pid:05d}-{salt}.avro"),
            avro_schema, rows, codec=codec)

    df.foreachPartition(_write_partition)
    with open(os.path.join(path, "_SUCCESS"), "w"):
        pass
