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
(`model/HdfsFileSystem.scala`); we use local-path I/O behind small
helpers — at cluster scale the metastore lives on shared storage and
every operation here is tiny driver-side metadata I/O (never executor
work), so the engine's data-plane scalability is unaffected.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from pathlib import Path
from typing import Optional

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
    """Process-wide catalog state rooted at a warehouse directory.

    Mirrors the singleton `LightningModelFactory` pattern
    (`LightningModelFactory.scala:29-55`) without forcing global state —
    LightningContext owns one instance.
    """

    def __init__(self, warehouse: str):
        self.warehouse = Path(warehouse)
        (self.warehouse / DATASOURCE_ROOT).mkdir(parents=True, exist_ok=True)
        (self.warehouse / METASTORE_ROOT).mkdir(parents=True, exist_ok=True)

    # -- namespaces ---------------------------------------------------------

    def _root_dir(self, root: str) -> Path:
        if root not in (DATASOURCE_ROOT, METASTORE_ROOT):
            raise MetastoreError(
                f"namespace must start with lightning.{DATASOURCE_ROOT} or "
                f"lightning.{METASTORE_ROOT}, got {root!r}")
        return self.warehouse / root

    def _ns_dir(self, root: str, ns: list[str]) -> Path:
        d = self._root_dir(root)
        for part in ns:
            d = d / _check_name(part)
        return d

    def create_namespace(self, root: str, ns: list[str],
                         properties: Optional[dict] = None,
                         if_not_exists: bool = False) -> None:
        d = self._ns_dir(root, ns)
        if d.exists():
            if if_not_exists:
                return
            raise MetastoreError(f"namespace already exists: {'.'.join(ns)}")
        d.mkdir(parents=True)
        if properties:
            (d / ".properties").write_text(json.dumps(properties))

    def namespace_exists(self, root: str, ns: list[str]) -> bool:
        return self._ns_dir(root, ns).is_dir()

    def drop_namespace(self, root: str, ns: list[str], cascade: bool = False) -> None:
        d = self._ns_dir(root, ns)
        if not d.is_dir():
            raise MetastoreError(f"no such namespace: {'.'.join(ns)}")
        if not cascade and any(d.iterdir()):
            raise MetastoreError(f"namespace not empty: {'.'.join(ns)}")
        shutil.rmtree(d)

    def list_namespaces(self, root: str, ns: list[str]) -> list[str]:
        d = self._ns_dir(root, ns)
        if not d.is_dir():
            return []
        return sorted(p.name for p in d.iterdir()
                      if p.is_dir() and not p.name.startswith("."))

    def namespace_properties(self, root: str, ns: list[str]) -> dict:
        p = self._ns_dir(root, ns) / ".properties"
        return json.loads(p.read_text()) if p.exists() else {}

    # -- datasources --------------------------------------------------------

    def _ds_path(self, ns: list[str], name: str, is_file: bool) -> Path:
        suffix = "_fs.json" if is_file else "_ds.json"
        return self._ns_dir(DATASOURCE_ROOT, ns) / f"{_check_name(name)}{suffix}"

    def save_datasource(self, ds: DataSource, replace: bool = False) -> None:
        d = self._ns_dir(DATASOURCE_ROOT, ds.namespace)
        d.mkdir(parents=True, exist_ok=True)
        path = self._ds_path(ds.namespace, ds.name, ds.is_file)
        other = self._ds_path(ds.namespace, ds.name, not ds.is_file)
        if (path.exists() or other.exists()) and not replace:
            raise MetastoreError(
                f"datasource already exists: {'.'.join(ds.namespace + [ds.name])}")
        other.unlink(missing_ok=True)
        path.write_text(ds.to_json())

    def load_datasource(self, ns: list[str], name: str) -> Optional[DataSource]:
        for is_file in (False, True):
            p = self._ds_path(ns, name, is_file)
            if p.exists():
                return DataSource.from_json(p.read_text())
        return None

    def list_datasources(self, ns: list[str]) -> list[str]:
        d = self._ns_dir(DATASOURCE_ROOT, ns)
        if not d.is_dir():
            return []
        out = []
        for p in d.iterdir():
            for sfx in ("_ds.json", "_fs.json"):
                if p.name.endswith(sfx):
                    out.append(p.name[: -len(sfx)])
        return sorted(out)

    def drop_datasource(self, ns: list[str], name: str) -> None:
        found = False
        for is_file in (False, True):
            p = self._ds_path(ns, name, is_file)
            if p.exists():
                p.unlink()
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
        d.mkdir(parents=True, exist_ok=True)
        p = d / f"{_check_name(t.name)}_table.json"
        if p.exists() and not replace:
            raise MetastoreError(
                f"table already registered: {'.'.join(t.namespace + [t.name])}")
        p.write_text(t.to_json())

    def load_table(self, ns: list[str], name: str) -> Optional[RegisteredTable]:
        p = self._ns_dir(METASTORE_ROOT, ns) / f"{_check_name(name)}_table.json"
        return RegisteredTable.from_json(p.read_text()) if p.exists() else None

    def list_tables(self, ns: list[str]) -> list[str]:
        d = self._ns_dir(METASTORE_ROOT, ns)
        if not d.is_dir():
            return []
        return sorted(p.name[: -len("_table.json")] for p in d.iterdir()
                      if p.name.endswith("_table.json"))

    def drop_table(self, ns: list[str], name: str) -> None:
        p = self._ns_dir(METASTORE_ROOT, ns) / f"{_check_name(name)}_table.json"
        if not p.exists():
            raise MetastoreError(f"no such table: {'.'.join(ns + [name])}")
        p.unlink()

    # -- USL ----------------------------------------------------------------

    def save_usl(self, usl: UnifiedSemanticLayer, replace: bool = False) -> None:
        d = self._ns_dir(METASTORE_ROOT, usl.namespace)
        d.mkdir(parents=True, exist_ok=True)
        p = d / f"{_check_name(usl.name)}_usl.json"
        if p.exists() and not replace:
            raise MetastoreError(
                f"USL already exists: {'.'.join(usl.namespace + [usl.name])}")
        p.write_text(usl.to_json())

    def load_usl(self, ns: list[str], name: str) -> Optional[UnifiedSemanticLayer]:
        p = self._ns_dir(METASTORE_ROOT, ns) / f"{_check_name(name)}_usl.json"
        return UnifiedSemanticLayer.from_json(p.read_text()) if p.exists() else None

    def list_usls(self, ns: list[str]) -> list[str]:
        d = self._ns_dir(METASTORE_ROOT, ns)
        if not d.is_dir():
            return []
        return sorted(p.name[: -len("_usl.json")] for p in d.iterdir()
                      if p.name.endswith("_usl.json"))

    def remove_usl(self, ns: list[str], name: str) -> None:
        d = self._ns_dir(METASTORE_ROOT, ns)
        p = d / f"{_check_name(name)}_usl.json"
        if not p.exists():
            raise MetastoreError(f"no such USL: {'.'.join(ns + [name])}")
        p.unlink()
        act_dir = d / f".{name}"
        if act_dir.is_dir():
            shutil.rmtree(act_dir)

    # -- USL activation queries (`<ns>/.<usl>/<table>_activation_query.json`)

    def save_activation(self, ns: list[str], usl: str, table: str,
                        query: str) -> None:
        d = self._ns_dir(METASTORE_ROOT, ns) / f".{_check_name(usl)}"
        d.mkdir(parents=True, exist_ok=True)
        (d / f"{_check_name(table)}_activation_query.json").write_text(
            json.dumps({"table": table, "query": query}))

    def load_activation(self, ns: list[str], usl: str, table: str) -> Optional[str]:
        p = (self._ns_dir(METASTORE_ROOT, ns) / f".{_check_name(usl)}"
             / f"{_check_name(table)}_activation_query.json")
        if not p.exists():
            return None
        return json.loads(p.read_text())["query"]
