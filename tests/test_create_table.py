"""CREATE TABLE parser tests (CreateTableTestSuite.scala analogue):
constraints, composite keys, FK actions, annotations."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from lightning_metastore_spark.parser.create_table import (  # noqa: E402
    DDLParseError,
    parse_annotations,
    parse_create_table,
    split_ddl_bundle,
)


def test_basic_columns_and_flags():
    spec = parse_create_table(
        "create table customer (id BIGINT primary key, name String not null, "
        "address String, UNIQUE (id), UNIQUE (id, name))")
    assert spec.name == "customer"
    assert [c.name for c in spec.columns] == ["id", "name", "address"]
    assert spec.columns[0].primary_key and spec.columns[1].not_null
    assert spec.all_unique_keys() == [["id"], ["id", "name"]]


def test_composite_pk_and_fk_actions():
    spec = parse_create_table("""
        create table "order" (id BIGINT, cid BIGINT, iid BIGINT,
          odate date, otime timestamp,
          PRIMARY KEY (id, cid),
          foreign key(cid) references customer(id) ON DELETE CASCADE ON UPDATE SET NULL,
          foreign key(iid) references lineitem(id))
        """.replace('"order"', "order_t"))
    assert spec.primary_key == ["id", "cid"]
    fks = spec.all_foreign_keys()
    assert fks[0]["table"] == "customer"
    assert fks[0]["on_delete"] == "CASCADE"
    assert fks[0]["on_update"] == "SET NULL"
    assert fks[1]["table"] == "lineitem"


def test_column_level_references():
    spec = parse_create_table(
        "create table t (a BIGINT references parent(pk), b int)")
    assert spec.all_foreign_keys() == [
        {"columns": ["a"], "table": "parent", "refColumns": ["pk"]}]


def test_annotations_with_variables():
    anns, rest = parse_annotations(
        "@DataQuality(name=q1, expression=id > ${minid}) "
        "@AccessControl(accessType=deny, users=bob) create table t (id int)")
    assert anns[0]["name"] == "DataQuality"
    assert anns[0]["variables"] == ["minid"]
    assert anns[1]["args"]["accessType"] == "deny"
    assert rest.startswith("create table")
    spec = parse_create_table(
        "@AccessControl(accessType=deny, users=bob) create table t (id int)")
    assert spec.annotations[0]["name"] == "AccessControl"


def test_errors():
    with pytest.raises(DDLParseError, match="duplicate column"):
        parse_create_table("create table t (a int, A string)")
    with pytest.raises(DDLParseError, match="unknown column"):
        parse_create_table("create table t (a int, PRIMARY KEY (b))")
    with pytest.raises(DDLParseError, match="duplicate PRIMARY KEY"):
        parse_create_table(
            "create table t (a int primary key, b int, PRIMARY KEY (b))")


def test_split_ddl_bundle_ignores_semicolons_in_strings():
    parts = split_ddl_bundle(
        "create table a (x int); create table b (y string)")
    assert len(parts) == 2
    assert parts[1].startswith("create table b")


def test_complex_types_pass_through():
    spec = parse_create_table(
        "create table t (a ARRAY<int>, b MAP<string, double>, "
        "c STRUCT<x: int, y: string>, d decimal(10,2), e varchar(20))")
    assert spec.columns[0].data_type.upper().startswith("ARRAY")
    assert spec.columns[3].data_type == "decimal(10,2)"
