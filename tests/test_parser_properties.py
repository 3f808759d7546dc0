"""Property-based tests (hypothesis) for the CREATE TABLE parser —
the reference's grammar surface, fuzzed."""

from __future__ import annotations

import sys

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, "/root/repo")

from lightning_metastore_spark.parser.create_table import (  # noqa: E402
    parse_create_table,
    split_ddl_bundle,
)

IDENT = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)
TYPES = st.sampled_from(
    ["int", "bigint", "string", "double", "float", "date", "timestamp",
     "decimal(10,2)", "varchar(30)", "ARRAY<int>", "MAP<string, double>"])


@st.composite
def column(draw):
    name = draw(IDENT)
    typ = draw(TYPES)
    flags = draw(st.sampled_from(["", " not null", " unique", " NOT NULL UNIQUE"]))
    return name, typ, flags


@given(st.lists(column(), min_size=1, max_size=8,
                unique_by=lambda c: c[0]))
@settings(max_examples=200, deadline=None)
def test_parse_roundtrip_columns(cols):
    ddl = "create table t (" + ", ".join(
        f"{n} {t}{f}" for n, t, f in cols) + ")"
    spec = parse_create_table(ddl)
    assert [c.name for c in spec.columns] == [n for n, _, _ in cols]
    for c, (_, t, f) in zip(spec.columns, cols):
        assert c.data_type.lower().replace(" ", "") == t.lower().replace(" ", "")
        assert c.not_null == ("not null" in f.lower())
        assert c.unique == ("unique" in f.lower())


@given(st.lists(IDENT, min_size=2, max_size=5, unique=True),
       st.integers(min_value=1, max_value=4))
@settings(max_examples=100, deadline=None)
def test_composite_pk(names, k):
    k = min(k, len(names))
    pk = names[:k]
    ddl = ("create table t (" + ", ".join(f"{n} int" for n in names)
           + f", PRIMARY KEY ({', '.join(pk)}))")
    spec = parse_create_table(ddl)
    assert spec.primary_key == pk


@given(st.lists(st.lists(column(), min_size=1, max_size=3,
                         unique_by=lambda c: c[0]),
                min_size=1, max_size=4))
@settings(max_examples=100, deadline=None)
def test_bundle_split(tables):
    stmts = [f"create table t{i} (" + ", ".join(
        f"{n} {t}" for n, t, _ in cols) + ")" for i, cols in enumerate(tables)]
    parts = split_ddl_bundle(";\n".join(stmts))
    assert len(parts) == len(tables)
    for i, p in enumerate(parts):
        assert parse_create_table(p).name == f"t{i}"
