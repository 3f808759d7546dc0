"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every implemented operator from SURVEY.md §2 (the
delegated relational surface + the LLM-pipeline extension operators);
``oracle_sql()`` gives the DuckDB-equivalent SQL for each (omitted only
for genuinely approximate operators — ivf ANN — which get a rows-only
check). Column names/types are aligned between both sides; see
lightning_metastore_spark/plans/queries.py for the float-determinism
strategy (decimal-cast sums, rounded cosines, keyed tiebreaks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _registry():
    from lightning_metastore_spark.plans.queries import RELATIONAL_QUERIES
    from lightning_metastore_spark.plans.pipeline_queries import PIPELINE_QUERIES
    merged = {}
    merged.update(RELATIONAL_QUERIES)
    merged.update(PIPELINE_QUERIES)
    return merged


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q5-shape 6-table
    snowflake join (the reference's doc revenue query)."""
    from lightning_metastore_spark.plans.queries import q5_local_supplier_revenue
    return q5_local_supplier_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.build for name, spec in _registry().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in _registry().items()
            if spec.oracle is not None}
