"""Persisted catalog entities (JSON serde).

Mirrors the reference's metastore documents (SURVEY.md §1.2):
- DataSource   — `serde/DataSource.scala` (credential masking in repr at
                 :31-35); persisted as `<name>_ds.json` / `<name>_fs.json`
- Table        — snapshot-registered source table: source FQN + schema
                 (`serde/Table.scala`, `LightningHdfsModel.scala:280-297`)
- UnifiedSemanticLayer — list of table specs (`serde/UnifiedSemanticLayer.
                 scala:29-43`)

All documents are tiny row-ish JSON — metadata only, never data.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Optional

# Source types, per the reference's enum (`DataSourceType.scala`).
FILE_SOURCE_TYPES = {"PARQUET", "ORC", "CSV", "JSON", "AVRO", "XML",
                     "PDF", "TEXT", "IMAGE", "VIDEO", "AUDIO",
                     "UNSTRUCTURED"}
NON_FILE_SOURCE_TYPES = {"JDBC", "ICEBERG", "DELTA"}
ALL_SOURCE_TYPES = FILE_SOURCE_TYPES | NON_FILE_SOURCE_TYPES
# UNSTRUCTURED = the reference's generic binary fallback
# (UnstructuredFileFormat.scala shortName "unstructured": any file,
# metadata columns only + bincontent content table)
UNSTRUCTURED_TYPES = {"PDF", "TEXT", "IMAGE", "VIDEO", "AUDIO",
                      "UNSTRUCTURED"}

_CREDENTIAL_KEYS = {"password", "secret", "token", "key", "credential"}


@dataclass
class DataSource:
    """A registered endpoint: type + connection/options (+ tag schema for
    unstructured sources)."""
    name: str
    namespace: list[str]           # path under `lightning.datasource`
    source_type: str               # member of ALL_SOURCE_TYPES
    options: dict[str, str] = field(default_factory=dict)
    tag_schema: Optional[str] = None   # DDL string, e.g. "age int, name string"

    @property
    def is_file(self) -> bool:
        return self.source_type in FILE_SOURCE_TYPES

    @property
    def is_unstructured(self) -> bool:
        return self.source_type in UNSTRUCTURED_TYPES

    def to_json(self) -> str:
        return json.dumps({
            "name": self.name,
            "namespace": self.namespace,
            "sourceType": self.source_type,
            "options": self.options,
            "tagSchema": self.tag_schema,
        }, indent=2)

    @classmethod
    def from_json(cls, s: str) -> "DataSource":
        d = json.loads(s)
        return cls(d["name"], d["namespace"], d["sourceType"],
                   d.get("options", {}), d.get("tagSchema"))

    def __repr__(self) -> str:  # mask credentials like the reference
        masked = {k: ("***" if any(c in k.lower() for c in _CREDENTIAL_KEYS) else v)
                  for k, v in self.options.items()}
        return (f"DataSource(name={self.name!r}, namespace={self.namespace!r}, "
                f"source_type={self.source_type!r}, options={masked!r})")


@dataclass
class RegisteredTable:
    """Snapshot-registered source table: where it came from + the schema
    captured at registration time (used as an override on load —
    `AbstractLightningCatalog.loadTable(ingestedSchema, ident):266-271`)."""
    name: str
    namespace: list[str]           # path under `lightning.metastore`
    source_fqn: list[str]          # full lightning path of the origin table
    schema_json: str               # Spark StructType.json()
    row_count: Optional[int] = None  # ANALYZE at REGISTER CATALOG time

    def to_json(self) -> str:
        d = {
            "name": self.name,
            "namespace": self.namespace,
            "sourceFqn": self.source_fqn,
            "schemaJson": self.schema_json,
        }
        if self.row_count is not None:
            d["rowCount"] = self.row_count
        return json.dumps(d, indent=2)

    @classmethod
    def from_json(cls, s: str) -> "RegisteredTable":
        d = json.loads(s)
        return cls(d["name"], d["namespace"], d["sourceFqn"], d["schemaJson"],
                   d.get("rowCount"))


@dataclass
class UnifiedSemanticLayer:
    """A compiled USL database: named bundle of CreateTableSpec dicts
    (parser/create_table.py produces them)."""
    name: str
    namespace: list[str]
    tables: list[dict[str, Any]]   # CreateTableSpec.to_dict() payloads

    def to_json(self) -> str:
        return json.dumps({
            "name": self.name,
            "namespace": self.namespace,
            "tables": self.tables,
        }, indent=2)

    @classmethod
    def from_json(cls, s: str) -> "UnifiedSemanticLayer":
        d = json.loads(s)
        return cls(d["name"], d["namespace"], d["tables"])
