"""ANSI CREATE TABLE parser with constraints + hint annotations.

Re-implements the surface of the reference's ANTLR visitor
(`LightningExtensionAstBuilder.scala:59-90`, constraints at
`CreateTableSpec.scala:33-121`, annotation parsing at
`LightningParserUtils.scala:53-132`) with a paren-aware tokenizer —
no parser generator needed for this grammar subset.

Supported:
- column defs: `name TYPE [NOT NULL] [PRIMARY KEY] [UNIQUE]
  [REFERENCES tbl(col...) [ON DELETE|UPDATE action]]`
- table constraints: `[CONSTRAINT name] PRIMARY KEY (...)`, `UNIQUE (...)`,
  `FOREIGN KEY (...) REFERENCES tbl(cols) [ON DELETE action]
  [ON UPDATE action]`
- annotations before CREATE: `@DataQuality(name=.., expression=..)`,
  `@AccessControl(accessType=.., users=.., groups=..)`
- types are Spark DDL type strings, validated lazily against
  `pyspark.sql.types` when a session is available.

Constraints are METADATA ONLY (never enforced at write) — exactly the
reference's contract; DQ checks read them (operators/dq.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Optional

FK_ACTIONS = {"RESTRICT", "CASCADE", "SET NULL", "NO ACTION", "SET DEFAULT"}


class DDLParseError(Exception):
    pass


@dataclass
class ColumnSpec:
    name: str
    data_type: str
    not_null: bool = False
    primary_key: bool = False
    unique: bool = False
    references: Optional[dict[str, Any]] = None  # {table, columns, on_delete, on_update}

    def to_dict(self) -> dict:
        return {
            "name": self.name, "dataType": self.data_type,
            "notNull": self.not_null, "primaryKey": self.primary_key,
            "unique": self.unique, "references": self.references,
        }


@dataclass
class CreateTableSpec:
    name: str
    columns: list[ColumnSpec]
    if_not_exists: bool = False
    namespace: list[str] = field(default_factory=list)
    primary_key: list[str] = field(default_factory=list)
    unique_keys: list[list[str]] = field(default_factory=list)
    foreign_keys: list[dict[str, Any]] = field(default_factory=list)
    annotations: list[dict[str, Any]] = field(default_factory=list)
    constraint_names: dict[str, str] = field(default_factory=dict)

    def to_dict(self) -> dict:
        return {
            "name": self.name,
            "ifNotExists": self.if_not_exists,
            "namespace": self.namespace,
            "columns": [c.to_dict() for c in self.columns],
            "primaryKey": self.primary_key,
            "uniqueKeys": self.unique_keys,
            "foreignKeys": self.foreign_keys,
            "annotations": self.annotations,
            "constraintNames": self.constraint_names,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "CreateTableSpec":
        cols = [ColumnSpec(c["name"], c["dataType"], c.get("notNull", False),
                           c.get("primaryKey", False), c.get("unique", False),
                           c.get("references"))
                for c in d.get("columns", [])]
        return cls(d["name"], cols, d.get("ifNotExists", False),
                   d.get("namespace", []), d.get("primaryKey", []),
                   d.get("uniqueKeys", []), d.get("foreignKeys", []),
                   d.get("annotations", []), d.get("constraintNames", {}))

    def schema_ddl(self) -> str:
        """Spark DDL schema string ("a BIGINT, b STRING")."""
        return ", ".join(f"{c.name} {c.data_type}" for c in self.columns)

    def all_pk_columns(self) -> list[str]:
        if self.primary_key:
            return self.primary_key
        return [c.name for c in self.columns if c.primary_key]

    def all_unique_keys(self) -> list[list[str]]:
        out = [[c.name] for c in self.columns if c.unique]
        out.extend(self.unique_keys)
        return out

    def all_foreign_keys(self) -> list[dict[str, Any]]:
        out = []
        for c in self.columns:
            if c.references:
                out.append({"columns": [c.name], **c.references})
        out.extend(self.foreign_keys)
        return out


# ---------------------------------------------------------------------------

def _split_top_level(s: str, sep: str = ",", angle: bool = False) -> list[str]:
    """Split on top-level ``sep``; ``angle=True`` also tracks ``<...>``
    nesting (complex type literals) — opt-in because ``<`` is a plain
    operator in expression contexts."""
    parts, depth, cur, in_str = [], 0, [], None
    for ch in s:
        if in_str:
            cur.append(ch)
            if ch == in_str:
                in_str = None
            continue
        if ch in "'\"":
            in_str = ch
            cur.append(ch)
        elif ch == "(" or (angle and ch == "<"):
            depth += 1
            cur.append(ch)
        elif ch == ")" or (angle and ch == ">"):
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return [p for p in parts if p]


_ANNOT = re.compile(r"@([A-Za-z_]\w*)\s*\(", re.S)
_CREATE = re.compile(
    r"CREATE\s+TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.`\-]+)\s*\(",
    re.I | re.S)
_NAMESPACE = re.compile(r"\)\s*NAMESPACE\s+(?P<ns>[\w.\-]+)\s*$", re.I | re.S)
_REFS = re.compile(
    r"REFERENCES\s+(?P<tbl>[\w.\-]+)\s*\((?P<cols>[^)]*)\)"
    r"(?P<actions>(\s+ON\s+(DELETE|UPDATE)\s+"
    r"(RESTRICT|CASCADE|SET\s+NULL|NO\s+ACTION|SET\s+DEFAULT))*)",
    re.I | re.S)
_ON_ACTION = re.compile(
    r"ON\s+(DELETE|UPDATE)\s+(RESTRICT|CASCADE|SET\s+NULL|NO\s+ACTION|SET\s+DEFAULT)",
    re.I)


def _find_close_paren(s: str, open_idx: int) -> int:
    depth, in_str = 0, None
    for i in range(open_idx, len(s)):
        ch = s[i]
        if in_str:
            if ch == in_str:
                in_str = None
            continue
        if ch in "'\"":
            in_str = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i
    raise DDLParseError(f"unbalanced parens in: {s[open_idx:open_idx+60]!r}")


def parse_annotations(ddl: str) -> tuple[list[dict[str, Any]], str]:
    """Strip leading @Hint(...) annotations; returns (annotations, rest).
    `${var}` placeholders inside values are recorded for CTE substitution
    (reference `LightningParserUtils.extractVariables:53-71`)."""
    annotations = []
    rest = ddl.lstrip()
    while rest.startswith("@"):
        m = _ANNOT.match(rest)
        if not m:
            break
        close = _find_close_paren(rest, m.end() - 1)
        body = rest[m.end():close]
        kv = {}
        for item in _split_top_level(body):
            if "=" not in item:
                raise DDLParseError(f"bad annotation arg: {item!r}")
            k, v = item.split("=", 1)
            v = v.strip().strip("\"'")
            kv[k.strip()] = v
        variables = sorted(set(re.findall(r"\$\{(\w+)\}", body)))
        annotations.append({"name": m.group(1), "args": kv,
                            "variables": variables})
        rest = rest[close + 1:].lstrip()
    return annotations, rest


def _parse_column_or_constraint(item: str, spec: CreateTableSpec) -> None:
    up = item.upper()
    cname = None
    m = re.match(r"CONSTRAINT\s+(\w+)\s+(.*)", item, re.I | re.S)
    if m:
        cname, item, up = m.group(1), m.group(2), m.group(2).upper()

    if up.startswith("PRIMARY KEY"):
        cols = _split_top_level(item[item.index("(") + 1: item.rindex(")")])
        if spec.primary_key or any(c.primary_key for c in spec.columns):
            raise DDLParseError(f"duplicate PRIMARY KEY in table {spec.name}")
        spec.primary_key = [c.strip() for c in cols]
        if cname:
            spec.constraint_names[f"pk:{','.join(spec.primary_key)}"] = cname
        return
    if up.startswith("UNIQUE"):
        cols = [c.strip() for c in
                _split_top_level(item[item.index("(") + 1: item.rindex(")")])]
        spec.unique_keys.append(cols)
        if cname:
            spec.constraint_names[f"uk:{','.join(cols)}"] = cname
        return
    if up.startswith("FOREIGN KEY"):
        inner = item[item.index("(") + 1:]
        cols = [c.strip() for c in _split_top_level(inner[: inner.index(")")])]
        refs = _REFS.search(item)
        if not refs:
            raise DDLParseError(f"FOREIGN KEY without REFERENCES: {item!r}")
        fk = {
            "columns": cols,
            "table": refs.group("tbl"),
            "refColumns": [c.strip() for c in refs.group("cols").split(",") if c.strip()],
        }
        for kind, action in _ON_ACTION.findall(refs.group("actions") or ""):
            fk[f"on_{kind.lower()}"] = re.sub(r"\s+", " ", action.upper())
        spec.foreign_keys.append(fk)
        if cname:
            spec.constraint_names[f"fk:{','.join(cols)}"] = cname
        return

    # plain column definition
    m = re.match(r"(?P<name>[`\w\-]+)\s+(?P<rest>.+)", item, re.S)
    if not m:
        raise DDLParseError(f"cannot parse column def: {item!r}")
    name = m.group("name").strip("`")
    rest = m.group("rest").strip()
    col_refs = None
    refs = _REFS.search(rest)
    if refs:
        col_refs = {
            "table": refs.group("tbl"),
            "refColumns": [c.strip() for c in refs.group("cols").split(",") if c.strip()],
        }
        for kind, action in _ON_ACTION.findall(refs.group("actions") or ""):
            col_refs[f"on_{kind.lower()}"] = re.sub(r"\s+", " ", action.upper())
        rest = rest[: refs.start()].strip()
    up_rest = rest.upper()
    flags = {"not_null": False, "primary_key": False, "unique": False}
    for pat, key in ((r"\bNOT\s+NULL\b", "not_null"),
                     (r"\bPRIMARY\s+KEY\b", "primary_key"),
                     (r"\bUNIQUE\b", "unique")):
        if re.search(pat, up_rest):
            flags[key] = True
            rest = re.sub(pat, "", rest, flags=re.I)
    data_type = re.sub(r"\s+", " ", rest).strip()
    if not data_type:
        raise DDLParseError(f"column {name!r} has no type")
    spec.columns.append(ColumnSpec(name, data_type, **flags, references=col_refs))


def parse_create_table(ddl: str) -> CreateTableSpec:
    annotations, rest = parse_annotations(ddl)
    m = _CREATE.search(rest)
    if not m:
        raise DDLParseError(f"not a CREATE TABLE statement: {rest[:60]!r}")
    open_idx = m.end() - 1
    close_idx = _find_close_paren(rest, open_idx)
    body = rest[open_idx + 1: close_idx]
    tail = rest[close_idx:]

    ns: list[str] = []
    nsm = _NAMESPACE.search(rest[close_idx:])
    if nsm:
        ns = nsm.group("ns").split(".")
        if ns[0].lower() == "lightning":
            ns = ns[1:]
    elif tail.strip(") \n\t;"):
        leftover = tail.strip()[1:].strip(" ;\n")
        if leftover:
            raise DDLParseError(f"unexpected trailing clause: {leftover!r}")

    spec = CreateTableSpec(
        name=m.group("name").strip("`").split(".")[-1],
        columns=[],
        if_not_exists=bool(m.group("ine")),
        namespace=ns,
        annotations=annotations,
    )
    for item in _split_top_level(body, angle=True):
        _parse_column_or_constraint(item, spec)
    # validation mirroring LightningParserUtils.scala:134-169
    names = [c.name.lower() for c in spec.columns]
    if len(names) != len(set(names)):
        raise DDLParseError(f"duplicate column names in table {spec.name}")
    known = set(names)
    for key in ([spec.primary_key] + spec.unique_keys
                + [fk["columns"] for fk in spec.foreign_keys]):
        for c in key:
            if c.lower() not in known:
                raise DDLParseError(
                    f"constraint references unknown column {c!r} in {spec.name}")
    return spec


def split_ddl_bundle(text: str) -> list[str]:
    """Split a multi-statement DDL bundle on top-level ';'
    (CompileUSLSpec.scala:74-77)."""
    return [s for s in (x.strip() for x in _split_top_level(text, ";")) if s]
