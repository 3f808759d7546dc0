"""Distributed skyline (Pareto-optimal set) queries.

A row is in the skyline when no other row dominates it — is at least
as good on EVERY criterion and strictly better on one (criteria are
per-column minimize/maximize). The classic use in a corpus pipeline:
"shortest documents with the highest quality score" without picking a
weighting between the two.

Algorithm (the standard two-phase distributed skyline, cf. "Integration
of Skyline Queries into Spark SQL", EDBT 2023 — reimplemented from the
public algorithm description): phase 1 computes a LOCAL skyline inside
every partition (dominated rows can never enter the global skyline, so
this is a pure filter — and it shrinks data drastically on correlated
data); phase 2 unions the surviving candidates into one group and
filters once more. Phase-2 input is the union of local skylines —
small for correlated/independent dimensions (the common case); fully
anti-correlated data degenerates to the whole input, which no skyline
algorithm avoids (documented caveat).

2-D groups use the sort-scan skyline (sort by dim1, keep rows that
strictly improve dim2 — O(n log n)); higher dimensions use blockwise
numpy dominance tests.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _local_skyline(pdf: pd.DataFrame, dims: list[str]) -> pd.DataFrame:
    """Rows of ``pdf`` not dominated within ``pdf`` (all dims already
    normalized to MINIMIZE). Rows with a NULL/NaN criterion are always
    KEPT and never dominate — SQL NULL comparison semantics, matching
    the NOT EXISTS oracle definition."""
    import numpy as np

    X_all = pdf[dims].to_numpy(dtype=np.float64)
    finite = np.isfinite(X_all).all(axis=1)
    if not finite.all():
        kept_null = pdf[~finite]
        rest = _local_skyline(pdf[finite], dims)
        return pd.concat([rest, kept_null])
    X = X_all
    n = len(X)
    if n <= 1:
        return pdf
    if len(dims) == 2:
        # sort by (x asc, y asc): a row is kept iff its y is strictly
        # below every earlier DIFFERENT point's minimum y, or it ties a
        # kept point exactly (equal points never dominate each other)
        order = np.lexsort((X[:, 1], X[:, 0]))
        keep = np.zeros(n, dtype=bool)
        best_y = np.inf
        prev_kept: tuple | None = None
        for i in order:
            x, y = X[i, 0], X[i, 1]
            if (x, y) == prev_kept:
                keep[i] = True        # duplicate of a skyline point
            elif y < best_y:
                keep[i] = True
                best_y = y
                prev_kept = (x, y)
        return pdf[keep]
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        if not keep[i]:
            continue
        le = (X <= X[i]).all(axis=1)
        lt = (X < X[i]).any(axis=1)
        if (le & lt).any():
            keep[i] = False
    return pdf[keep]


def skyline(df: DataFrame, minimize: list[str] = (),
            maximize: list[str] = ()) -> DataFrame:
    """The Pareto-optimal rows of ``df`` under the given criteria.
    Returns the input columns unchanged (only non-dominated rows).

    100 TB shape: one partition-local filter (no shuffle — dominated
    rows die where they live), then ONE single-group pass over the
    surviving candidates. The candidate set is the union of local
    skylines; its size is the operator's memory bound — for the
    typical correlated corpus dimensions it is tiny, for adversarial
    anti-correlated data pre-aggregate or sample first.
    Partition-invariant: local filtering is a superset filter, so the
    final result never depends on how the input was split.
    """
    dims = list(minimize) + list(maximize)
    if len(dims) < 2:
        raise ValueError("skyline needs >= 2 criteria columns")
    norm = df
    tmp = []
    for c in maximize:
        nc = f"__neg_{c}"
        norm = norm.withColumn(nc, -F.col(c))
        tmp.append(nc)
    ndims = list(minimize) + tmp
    out_cols = df.columns

    def phase(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            yield _local_skyline(pdf, ndims)

    schema = norm.schema
    local = norm.mapInPandas(phase, schema=schema)

    def final(_key, pdf: pd.DataFrame) -> pd.DataFrame:
        return _local_skyline(pdf, ndims)

    merged = (local.groupBy(F.lit(0).alias("__g"))
              .applyInPandas(lambda key, pdf: final(key, pdf.drop(
                  columns=["__g"], errors="ignore")), schema=schema))
    return merged.select(*out_cols)


def skyline_per_group(df: DataFrame, group_cols: list[str],
                      minimize: list[str] = (),
                      maximize: list[str] = ()) -> DataFrame:
    """Skyline computed independently WITHIN each group (e.g. the
    Pareto-front of documents per language): one shuffle on the group
    key, then the whole dominance computation runs inside each group's
    Arrow batch — no second pass needed because groups are complete
    after the shuffle.

    Memory bound is the largest group (same caveat as any
    groupBy-apply); for huge groups fall back to ``skyline`` per group
    subset.
    """
    dims = list(minimize) + list(maximize)
    if len(dims) < 2:
        raise ValueError("skyline_per_group needs >= 2 criteria columns")
    norm = df
    tmp = []
    for c in maximize:
        nc = f"__neg_{c}"
        norm = norm.withColumn(nc, -F.col(c))
        tmp.append(nc)
    ndims = list(minimize) + tmp
    out_cols = df.columns
    schema = norm.schema

    def per_group(_key, pdf: pd.DataFrame) -> pd.DataFrame:
        return _local_skyline(pdf, ndims)

    return (norm.groupBy(*group_cols)
            .applyInPandas(per_group, schema=schema)
            .select(*out_cols))
