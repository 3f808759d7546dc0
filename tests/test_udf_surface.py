"""UDF/UDAF/UDTF surface tests (SURVEY §2.7 delegated surface) + the
cents-determinism property."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F  # noqa: E402


def test_python_udtf(spark):
    """Spark 4 Python UDTF: explode a range per row."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="x int, sq int")
    class Squares:
        def eval(self, n: int):
            for i in range(n):
                yield i, i * i

    spark.udtf.register("squares", Squares)
    rows = spark.sql("SELECT s.x, s.sq FROM squares(4) AS s ORDER BY x").collect()
    assert [(r.x, r.sq) for r in rows] == [(0, 0), (1, 1), (2, 4), (3, 9)]


def test_grouped_pandas_udaf(spark):
    """UDAF via applyInPandas: per-group normalization."""
    import pandas as pd

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0)], ["k", "v"])

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf["centered"] = pdf["v"] - pdf["v"].mean()
        return pdf

    out = {(r.k, r.v): r.centered for r in
           df.groupBy("k").applyInPandas(
               center, "k string, v double, centered double").collect()}
    assert out[("a", 1.0)] == -1.0 and out[("a", 3.0)] == 1.0
    assert out[("b", 10.0)] == 0.0


@given(st.lists(st.integers(min_value=-10_000_000, max_value=10_000_000),
                min_size=1, max_size=50))
@settings(max_examples=20, deadline=None)
def test_cents_roundtrip_property(cents_values):
    """Property: for any exact 2-decimal value x = c/100, the cents
    pattern CAST(ROUND(x*100) AS BIGINT) recovers c exactly in Python
    float64 semantics (the same IEEE ops Spark/DuckDB execute)."""
    for c in cents_values:
        x = c / 100.0  # nearest float64 to the decimal value
        assert int(round(x * 100)) == c
