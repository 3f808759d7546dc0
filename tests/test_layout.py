"""Range-clustered write layout tests: footer stats must actually
enable file-level skipping."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from lightning_metastore_spark.operators.layout import (  # noqa: E402
    file_column_ranges, write_range_clustered)

from tests.conftest import SF_DIR  # noqa: E402


def test_range_clustered_write_produces_disjoint_ranges(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    out = str(tmp_path / "li_clustered")
    write_range_clustered(li, out, ["l_shipdate"], n_files=8)

    back = spark.read.parquet(out)
    assert back.count() == li.count()

    ranges = sorted(file_column_ranges(out, "l_shipdate"))
    assert len(ranges) >= 4
    # consecutive file ranges must not interleave (boundary value may be
    # shared): that is what lets a shipdate predicate skip whole files
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert lo_next >= hi_prev
    # and a point query's value range lands in a strict subset of files
    probe = ranges[len(ranges) // 2][0]
    containing = [r for r in ranges if r[0] <= probe <= r[1]]
    assert len(containing) < len(ranges) / 2

    # correctness under the clustered layout
    expect = li.filter(f"l_shipdate >= '{probe}'").count()
    assert back.filter(f"l_shipdate >= '{probe}'").count() == expect
