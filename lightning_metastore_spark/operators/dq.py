"""Data-quality check programs (reference SURVEY.md §2.6).

The reference generates SQL per check (`DataQualitySpec.scala:280-482`):
PK/Unique via GROUP BY … HAVING COUNT == 1 subqueries, FK via
`ARRAY(cols) IN (SELECT ARRAY(refcols) …)`. We keep the exact result
contract — one row (name, table, check_type, total, valid, invalid) —
but use single-pass scalable formulations:

- PK/Unique: one hash aggregation on the key, then sum counts vs
  count-of-singleton-groups (no second scan, no IN subquery).
- FK: left-anti join against the (deduplicated, broadcastable) parent
  key set instead of a correlated IN — Spark plans broadcast-anti at
  small parent sizes and shuffle-anti beyond, both 100 TB-safe.
- Custom expression: conditional aggregation in one scan.

Row-level variants (SHOW DQ {VALID|INVALID} RECORD,
`DataQualitySpec.scala:509-621`) return the matching rows instead of
counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RESULT_COLS = ("dq_name", "table_name", "check_type", "total", "valid", "invalid")


def _result(df: DataFrame, name: str, table: str, check_type: str) -> DataFrame:
    return df.select(
        F.lit(name).alias("dq_name"),
        F.lit(table).alias("table_name"),
        F.lit(check_type).alias("check_type"),
        F.col("total").cast("long").alias("total"),
        F.col("valid").cast("long").alias("valid"),
        (F.col("total") - F.col("valid")).cast("long").alias("invalid"),
    )


def pk_check(df: DataFrame, key_cols: list[str], name: str, table: str,
             check_type: str = "Primary Key Constraint") -> DataFrame:
    """Rows whose key occurs exactly once are valid. Nulls in any key
    column are invalid (PK implies NOT NULL), matching the reference's
    GROUP-BY-HAVING semantics where null keys never form singleton groups
    of valid rows."""
    non_null = F.lit(True)
    for c in key_cols:
        non_null = non_null & F.col(c).isNotNull()
    grouped = (df.withColumn("__k_ok", non_null)
               .groupBy(*key_cols, "__k_ok")
               .agg(F.count(F.lit(1)).alias("cnt")))
    stats = grouped.agg(
        F.sum("cnt").alias("total"),
        F.sum(F.when((F.col("cnt") == 1) & F.col("__k_ok"), 1).otherwise(0)).alias("valid"),
    )
    return _result(stats, name, table, check_type)


def unique_check(df: DataFrame, key_cols: list[str], name: str, table: str) -> DataFrame:
    return pk_check(df, key_cols, name, table, check_type="Unique Constraint")


def fk_check(child: DataFrame, child_cols: list[str], parent: DataFrame,
             parent_cols: list[str], name: str, table: str) -> DataFrame:
    """FK orphan check via left-anti join (scalable NOT IN)."""
    parent_keys = parent.select(
        *[F.col(p).alias(c) for c, p in zip(child_cols, parent_cols)]).distinct()
    total = child.agg(F.count(F.lit(1)).alias("total"))
    orphans = (child.join(parent_keys, child_cols, "left_anti")
               .agg(F.count(F.lit(1)).alias("invalid")))
    stats = (total.crossJoin(orphans)
             .select("total", (F.col("total") - F.col("invalid")).alias("valid")))
    return _result(stats, name, table, "Foreign Key Constraint")


def custom_check(df: DataFrame, expr: str, name: str, table: str) -> DataFrame:
    """Custom boolean-expression DQ: single-scan conditional aggregation
    (reference runs two count jobs, `DataQualitySpec.runDQ:60-73`)."""
    stats = df.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.expr(expr), 1).otherwise(0)).alias("valid"),
    )
    return _result(stats, name, table, "Custom Data Quality")


def dq_records(df: DataFrame, expr: str, valid: bool = True,
               limit: int | None = None) -> DataFrame:
    """Row-level DQ results (SHOW DQ VALID|INVALID RECORD)."""
    cond = F.expr(expr)
    out = df.filter(cond if valid else ~cond)
    # `is not None`, not truthiness: LIMIT 0 must return zero rows
    return out.limit(limit) if limit is not None else out
