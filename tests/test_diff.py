"""Snapshot diff: classification correctness, null-safety, schema
guardrails, and the hash-not-payload join shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hawk_pack_spark.operators.diff import diff_summary, table_diff
from hawk_pack_spark.sources import load_table


def test_table_diff_classifies(spark):
    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k int, s string, v int",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "CHANGED", 30), (4, None, 40), (5, "e", 50)],
        "k int, s string, v int",
    )
    got = {(r.k, r.change) for r in table_diff(old, new, ["k"]).collect()}
    assert got == {(1, "removed"), (3, "changed"), (5, "added")}
    # null-valued compare columns are equal to themselves (k=4 unchanged)
    summ = {r.change: r.n for r in diff_summary(old, new, ["k"]).collect()}
    assert summ == {"removed": 1, "changed": 1, "added": 1}


def test_table_diff_compare_subset(spark):
    old = spark.createDataFrame([(1, "a", 10)], "k int, s string, v int")
    new = spark.createDataFrame([(1, "a", 99)], "k int, s string, v int")
    # full compare sees the change; s-only compare does not
    assert table_diff(old, new, ["k"]).count() == 1
    assert table_diff(old, new, ["k"], compare_cols=["s"]).count() == 0


def test_table_diff_rejects_missing_columns(spark):
    old = spark.createDataFrame([(1, "a")], "k int, s string")
    new = spark.createDataFrame([(1, "a")], "k int, s string")
    with pytest.raises(ValueError, match="absent"):
        table_diff(old, new, ["k"], compare_cols=["nope"])


def test_table_diff_joins_hashes_not_payload(spark, sf_dir):
    """The classifying join carries (key, hash) — the wide payload
    columns are pruned before the shuffle."""
    orders = load_table(spark, "orders", sf_dir)
    d = table_diff(orders, orders.where(F.col("o_orderkey") % 7 != 0), ["o_orderkey"])
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in plan
    assert d.count() > 0
    assert {r.change for r in d.select("change").distinct().collect()} == {"removed"}


def test_table_diff_exact_mode_matches_hash_mode(spark):
    from hawk_pack_spark.operators.diff import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k long, s string, v long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, "d", 40), (5, "e", 50)],
        "k long, s string, v long",
    )
    want = {(2, "changed"), (3, "removed"), (4, "changed"), (5, "added")}
    got_hash = {(r.k, r.change) for r in table_diff(old, new, ["k"]).collect()}
    got_exact = {
        (r.k, r.change) for r in table_diff(old, new, ["k"], exact=True).collect()
    }
    assert got_hash == want
    # exact mode: column-wise null-safe compare, no collision contract
    assert got_exact == want
