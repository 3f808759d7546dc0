"""JSON-file metastore — the catalog's persistent state.

File layout mirrors `LightningHdfsModel.scala` (SURVEY.md §1.2) so a
catalog written by this engine is structurally recognizable to a
reference user:

    <warehouse>/datasource/<ns...>/<name>_ds.json   (non-file source)
    <warehouse>/datasource/<ns...>/<name>_fs.json   (file source)
    <warehouse>/metastore/<ns...>/<name>_table.json (snapshot table)
    <warehouse>/metastore/<ns...>/<name>_usl.json   (USL database)
    <warehouse>/metastore/<ns...>/.<usl>/<table>_activation_query.json
    <dir>/.properties                               (namespace metadata)

The reference supports HDFS/S3/local through Hadoop's FileSystem
(`model/HdfsFileSystem.scala:57`); all I/O here routes through the
scheme-resolved shim in `model/fs.py`, so a warehouse of
``s3://bucket/wh`` or ``hdfs://nn/wh`` works with the same code
(pyarrow.fs clients). Every operation is tiny driver-side metadata
I/O — never executor work — so the data plane is unaffected either way.
"""

from __future__ import annotations

import json
import re
from typing import Optional

from lightning_metastore_spark.model.fs import get_filesystem
from lightning_metastore_spark.model.serde import (
    DataSource,
    RegisteredTable,
    UnifiedSemanticLayer,
)

DATASOURCE_ROOT = "datasource"
METASTORE_ROOT = "metastore"
_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_\-]*$")


class MetastoreError(Exception):
    pass


def _check_name(name: str) -> str:
    if not _NAME_RE.match(name):
        raise MetastoreError(f"invalid identifier: {name!r}")
    return name


class Metastore:
    """Process-wide catalog state rooted at a warehouse directory/URL.

    Mirrors the singleton `LightningModelFactory` pattern
    (`LightningModelFactory.scala:29-55`) without forcing global state —
    LightningContext owns one instance.
    """

    def __init__(self, warehouse: str):
        self.warehouse = warehouse
        self.fs, self.root = get_filesystem(warehouse)
        self.fs.mkdirs(self.fs.join(self.root, DATASOURCE_ROOT))
        self.fs.mkdirs(self.fs.join(self.root, METASTORE_ROOT))

    # -- namespaces ---------------------------------------------------------

    def _root_dir(self, root: str) -> str:
        if root not in (DATASOURCE_ROOT, METASTORE_ROOT):
            raise MetastoreError(
                f"namespace must start with lightning.{DATASOURCE_ROOT} or "
                f"lightning.{METASTORE_ROOT}, got {root!r}")
        return self.fs.join(self.root, root)

    def _ns_dir(self, root: str, ns: list[str]) -> str:
        d = self._root_dir(root)
        for part in ns:
            d = self.fs.join(d, _check_name(part))
        return d

    def create_namespace(self, root: str, ns: list[str],
                         properties: Optional[dict] = None,
                         if_not_exists: bool = False) -> None:
        d = self._ns_dir(root, ns)
        if self.fs.exists(d):
            if if_not_exists:
                return
            raise MetastoreError(f"namespace already exists: {'.'.join(ns)}")
        self.fs.mkdirs(d)
        if properties:
            self.fs.write_text(self.fs.join(d, ".properties"),
                               json.dumps(properties))

    def namespace_exists(self, root: str, ns: list[str]) -> bool:
        return self.fs.is_dir(self._ns_dir(root, ns))

    def drop_namespace(self, root: str, ns: list[str], cascade: bool = False) -> None:
        d = self._ns_dir(root, ns)
        if not self.fs.is_dir(d):
            raise MetastoreError(f"no such namespace: {'.'.join(ns)}")
        if not cascade and self.fs.listdir(d):
            raise MetastoreError(f"namespace not empty: {'.'.join(ns)}")
        self.fs.rmtree(d)

    def list_namespaces(self, root: str, ns: list[str]) -> list[str]:
        d = self._ns_dir(root, ns)
        if not self.fs.is_dir(d):
            return []
        return sorted(n for n in self.fs.listdir(d)
                      if self.fs.is_dir(self.fs.join(d, n))
                      and not n.startswith("."))

    def namespace_properties(self, root: str, ns: list[str]) -> dict:
        p = self.fs.join(self._ns_dir(root, ns), ".properties")
        return json.loads(self.fs.read_text(p)) if self.fs.exists(p) else {}

    # -- datasources --------------------------------------------------------

    def _ds_path(self, ns: list[str], name: str, is_file: bool) -> str:
        suffix = "_fs.json" if is_file else "_ds.json"
        return self.fs.join(self._ns_dir(DATASOURCE_ROOT, ns),
                            f"{_check_name(name)}{suffix}")

    def save_datasource(self, ds: DataSource, replace: bool = False) -> None:
        self.fs.mkdirs(self._ns_dir(DATASOURCE_ROOT, ds.namespace))
        path = self._ds_path(ds.namespace, ds.name, ds.is_file)
        other = self._ds_path(ds.namespace, ds.name, not ds.is_file)
        if (self.fs.exists(path) or self.fs.exists(other)) and not replace:
            raise MetastoreError(
                f"datasource already exists: {'.'.join(ds.namespace + [ds.name])}")
        self.fs.remove(other, missing_ok=True)
        self.fs.write_text(path, ds.to_json())

    def load_datasource(self, ns: list[str], name: str) -> Optional[DataSource]:
        for is_file in (False, True):
            p = self._ds_path(ns, name, is_file)
            if self.fs.exists(p):
                return DataSource.from_json(self.fs.read_text(p))
        return None

    def list_datasources(self, ns: list[str]) -> list[str]:
        d = self._ns_dir(DATASOURCE_ROOT, ns)
        if not self.fs.is_dir(d):
            return []
        out = []
        for n in self.fs.listdir(d):
            for sfx in ("_ds.json", "_fs.json"):
                if n.endswith(sfx):
                    out.append(n[: -len(sfx)])
        return sorted(out)

    def drop_datasource(self, ns: list[str], name: str) -> None:
        found = False
        for is_file in (False, True):
            p = self._ds_path(ns, name, is_file)
            if self.fs.exists(p):
                self.fs.remove(p)
                found = True
        if not found:
            raise MetastoreError(f"no such datasource: {'.'.join(ns + [name])}")

    def find_parent_datasource(self, path: list[str]) -> Optional[tuple[DataSource, list[str]]]:
        """Walk UP from the deepest prefix of ``path`` (under
        `lightning.datasource`) to the nearest enclosing DataSource
        definition; return (datasource, residual_path). Mirrors
        `AbstractLightningCatalog.findParentDataSource` (:70-92).
        """
        for i in range(len(path), 0, -1):
            ns, name = path[: i - 1], path[i - 1]
            try:
                ds = self.load_datasource(ns, name)
            except MetastoreError:
                ds = None
            if ds is not None:
                return ds, path[i:]
        return None

    # -- registered (snapshot) tables --------------------------------------

    def save_table(self, t: RegisteredTable, replace: bool = False) -> None:
        d = self._ns_dir(METASTORE_ROOT, t.namespace)
        self.fs.mkdirs(d)
        p = self.fs.join(d, f"{_check_name(t.name)}_table.json")
        if self.fs.exists(p) and not replace:
            raise MetastoreError(
                f"table already registered: {'.'.join(t.namespace + [t.name])}")
        self.fs.write_text(p, t.to_json())

    def load_table(self, ns: list[str], name: str) -> Optional[RegisteredTable]:
        p = self.fs.join(self._ns_dir(METASTORE_ROOT, ns),
                         f"{_check_name(name)}_table.json")
        if not self.fs.exists(p):
            # Spark SQL identifiers are case-insensitive; a JDBC engine
            # may have reported the snapshot name in its own case
            # (Derby: TEST_USERS) while the query says test_users
            for cand in self.list_tables(ns):
                if cand.lower() == name.lower():
                    p = self.fs.join(self._ns_dir(METASTORE_ROOT, ns),
                                     f"{cand}_table.json")
                    break
            else:
                return None
        return RegisteredTable.from_json(self.fs.read_text(p))

    def list_tables(self, ns: list[str]) -> list[str]:
        d = self._ns_dir(METASTORE_ROOT, ns)
        if not self.fs.is_dir(d):
            return []
        return sorted(n[: -len("_table.json")] for n in self.fs.listdir(d)
                      if n.endswith("_table.json"))

    def drop_table(self, ns: list[str], name: str) -> None:
        p = self.fs.join(self._ns_dir(METASTORE_ROOT, ns),
                         f"{_check_name(name)}_table.json")
        if not self.fs.exists(p):
            raise MetastoreError(f"no such table: {'.'.join(ns + [name])}")
        self.fs.remove(p)

    # -- USL ----------------------------------------------------------------

    def save_usl(self, usl: UnifiedSemanticLayer, replace: bool = False) -> None:
        d = self._ns_dir(METASTORE_ROOT, usl.namespace)
        self.fs.mkdirs(d)
        p = self.fs.join(d, f"{_check_name(usl.name)}_usl.json")
        if self.fs.exists(p) and not replace:
            raise MetastoreError(
                f"USL already exists: {'.'.join(usl.namespace + [usl.name])}")
        self.fs.write_text(p, usl.to_json())

    def load_usl(self, ns: list[str], name: str) -> Optional[UnifiedSemanticLayer]:
        p = self.fs.join(self._ns_dir(METASTORE_ROOT, ns),
                         f"{_check_name(name)}_usl.json")
        if not self.fs.exists(p):
            return None
        return UnifiedSemanticLayer.from_json(self.fs.read_text(p))

    def list_usls(self, ns: list[str]) -> list[str]:
        d = self._ns_dir(METASTORE_ROOT, ns)
        if not self.fs.is_dir(d):
            return []
        return sorted(n[: -len("_usl.json")] for n in self.fs.listdir(d)
                      if n.endswith("_usl.json"))

    def remove_usl(self, ns: list[str], name: str) -> None:
        d = self._ns_dir(METASTORE_ROOT, ns)
        p = self.fs.join(d, f"{_check_name(name)}_usl.json")
        if not self.fs.exists(p):
            raise MetastoreError(f"no such USL: {'.'.join(ns + [name])}")
        self.fs.remove(p)
        act_dir = self.fs.join(d, f".{name}")
        if self.fs.is_dir(act_dir):
            self.fs.rmtree(act_dir)

    # -- USL activation queries (`<ns>/.<usl>/<table>_activation_query.json`)

    def save_activation(self, ns: list[str], usl: str, table: str,
                        query: str) -> None:
        d = self.fs.join(self._ns_dir(METASTORE_ROOT, ns),
                         f".{_check_name(usl)}")
        self.fs.mkdirs(d)
        self.fs.write_text(
            self.fs.join(d, f"{_check_name(table)}_activation_query.json"),
            json.dumps({"table": table, "query": query}))

    def load_activation(self, ns: list[str], usl: str, table: str) -> Optional[str]:
        p = self.fs.join(self._ns_dir(METASTORE_ROOT, ns),
                         f".{_check_name(usl)}",
                         f"{_check_name(table)}_activation_query.json")
        if not self.fs.exists(p):
            return None
        return json.loads(self.fs.read_text(p))["query"]
