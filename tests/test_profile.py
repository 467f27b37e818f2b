"""One-pass table profiling: correctness vs hand aggregates and the
single-job contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from hawk_pack_spark.operators.profile import profile_table
from hawk_pack_spark.sources import load_table


def test_profile_matches_hand_aggregates(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    prof = {r["column"]: r for r in profile_table(
        li, ["l_orderkey", "l_returnflag", "l_quantity"], exact_distinct=True
    ).collect()}
    n = li.count()
    for c in ("l_orderkey", "l_returnflag", "l_quantity"):
        r = prof[c]
        assert r.n == n
        assert r.n_null == li.where(F.col(c).isNull()).count()
        assert r.n_distinct == li.select(c).distinct().count()
    assert prof["l_orderkey"].min_val == str(
        li.agg(F.min("l_orderkey")).collect()[0][0]
    )
    got_mean = prof["l_quantity"].mean_val
    want_mean = li.agg(F.round(F.avg("l_quantity"), 6)).collect()[0][0]
    assert abs(got_mean - want_mean) < 1e-9
    assert prof["l_returnflag"].mean_val is None


def test_profile_nulls_and_approx(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (None, "b"), (4, "a")], "x int, s string"
    )
    prof = {r["column"]: r for r in profile_table(df).collect()}
    assert prof["x"].n == 4 and prof["x"].n_null == 1
    assert prof["s"].n_null == 1
    # approx distinct is exact at tiny cardinality
    assert prof["x"].n_distinct == 3 and prof["s"].n_distinct == 2
    assert prof["x"].min_val == "1" and prof["x"].max_val == "4"


def test_profile_is_one_job(spark, sf_dir):
    """The whole profile collapses into ONE aggregate over ONE scan —
    no per-column scan (the layout.quantize_bounds discipline)."""
    li = load_table(spark, "lineitem", sf_dir)
    plan = profile_table(
        li, ["l_orderkey", "l_linenumber", "l_returnflag"]
    )._jdf.queryExecution().executedPlan().toString()
    # a single scan of the source feeds the whole profile
    assert plan.count("Scan ") + plan.count("FileScan") <= 2


def test_profile_unknown_column(spark, sf_dir):
    import pytest

    li = load_table(spark, "lineitem", sf_dir)
    with pytest.raises(ValueError, match="nope"):
        profile_table(li, ["nope"])
