"""Binned range join: equivalence to the naive O(n·m) join, semi-join
mode, and the plan guarantee (hash equi-join, never nested-loop)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from hawk_pack_spark.operators.range_join import range_join_points


def _fixtures(spark):
    pts = spark.createDataFrame(
        [(u, i, float(u * 100 + i * 7)) for u in range(3) for i in range(40)],
        "user_id int, pid int, ts double",
    )
    iv = spark.createDataFrame(
        [(u, j, float(j * 50 + u * 10), float(j * 50 + u * 10 + 35))
         for u in range(3) for j in range(5)],
        "user_id int, iid int, w_start double, w_end double",
    )
    return pts, iv


def test_matches_naive_join(spark):
    pts, iv = _fixtures(spark)
    fast = range_join_points(
        pts, iv, "ts", "w_start", "w_end", bin_width_s=20, keys=["user_id"]
    )
    naive = pts.alias("p").join(
        iv.alias("i"),
        (F.col("p.user_id") == F.col("i.user_id"))
        & (F.col("p.ts") >= F.col("i.w_start"))
        & (F.col("p.ts") < F.col("i.w_end")),
    )
    a = {(r.pid, r.iid) for r in fast.select("pid", "iid").collect()}
    b = {(r.pid, r.iid) for r in naive.select("p.pid", "i.iid").collect()}
    assert a == b and len(a) > 0


def test_no_duplicate_pairs_across_bins(spark):
    """Intervals spanning many bins must still yield each pair once."""
    pts, iv = _fixtures(spark)
    fast = range_join_points(
        pts, iv, "ts", "w_start", "w_end", bin_width_s=3, keys=["user_id"]
    )
    pairs = fast.select("pid", "iid").collect()
    assert len(pairs) == len({(r.pid, r.iid) for r in pairs})


def test_left_semi_mode(spark):
    pts, iv = _fixtures(spark)
    semi = range_join_points(
        pts, iv, "ts", "w_start", "w_end", bin_width_s=20,
        keys=["user_id"], how="left_semi",
    )
    assert set(semi.columns) == set(pts.columns)
    inner_pids = {
        r.pid
        for r in range_join_points(
            pts, iv, "ts", "w_start", "w_end", bin_width_s=20, keys=["user_id"]
        ).select("pid").collect()
    }
    assert {r.pid for r in semi.collect()} == inner_pids


def test_plans_as_hash_join_not_nested_loop(spark):
    pts, iv = _fixtures(spark)
    df = range_join_points(
        pts, iv, "ts", "w_start", "w_end", bin_width_s=20, keys=["user_id"]
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "NestedLoop" not in plan, plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_boundary_semantics(spark):
    """Half-open [start, end): ts==start joins, ts==end doesn't;
    zero-length intervals match nothing; negative timestamps bin
    correctly (floor, not truncate-toward-zero)."""
    pts = spark.createDataFrame(
        [(1, 0.0), (2, 10.0), (3, 20.0), (4, -35.0)],
        "pid int, ts double",
    )
    iv = spark.createDataFrame(
        [(100, 0.0, 20.0),    # [0,20): catches ts=0,10 not 20
         (200, 20.0, 20.0),   # zero-length: catches nothing
         (300, -40.0, -30.0)],  # negative window: catches ts=-35
        "iid int, w_start double, w_end double",
    )
    res = range_join_points(pts, iv, "ts", "w_start", "w_end", bin_width_s=7)
    pairs = {(r.pid, r.iid) for r in res.collect()}
    assert pairs == {(1, 100), (2, 100), (4, 300)}, pairs
