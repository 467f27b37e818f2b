"""Physical-plan regression tests: the properties that make these
queries scale must stay in the plan (pushdown, pruning, partial
aggregation, broadcast joins)."""

from __future__ import annotations

import contextlib
import io

import pytest

from hawk_pack_spark.queries import CATALOG


def _plan(spark, sf_dir, name: str) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        CATALOG[name].fn(spark, sf_dir).explain("formatted")
    return buf.getvalue()


def test_q01_scan_pushdown_and_partial_agg(spark, sf_dir):
    s = _plan(spark, sf_dir, "q01_pricing_summary")
    # filter reaches the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in s
    # column pruning: exactly the 7 needed columns, no l_orderkey etc.
    read = next(l for l in s.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" not in read and "l_partkey" not in read
    assert "l_quantity" in read and "l_shipdate" in read
    # map-side combine before the exchange
    assert "partial_sum" in s and "Exchange" in s


def test_q03_broadcasts_dimensions(spark, sf_dir):
    s = _plan(spark, sf_dir, "q03_shipping_priority")
    assert "BroadcastHashJoin" in s
    # customer scan pushes the segment filter
    assert "EqualTo(c_mktsegment,BUILDING)" in s


def test_knn_projects_only_needed_columns(spark, sf_dir):
    s = _plan(spark, sf_dir, "knn_exact_l2")
    reads = [l for l in s.splitlines() if "ReadSchema" in l]
    assert reads and all("label" not in l for l in reads)  # label pruned
