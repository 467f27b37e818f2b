"""Sketch aggregates: error bounds vs exact answers, and the mergeable
pre-sketch → union workflow that replaces raw-data rescans at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from hawk_pack_spark.functions import sketches as S
from hawk_pack_spark.sources import load_table


def test_hll_count_within_rsd(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    exact = ev.select("user_id").distinct().count()
    est = ev.agg(S.hll_count(F.col("user_id"), rsd=0.02).alias("e")).collect()[0].e
    assert abs(est - exact) <= max(3, 0.06 * exact), (est, exact)


def test_hll_presketch_merge_matches_direct(spark, sf_dir):
    """Daily sketches unioned must estimate ≈ the direct global count —
    the pre-aggregation contract that makes sketches reusable."""
    ev = load_table(spark, "events", sf_dir).withColumn(
        "day", F.to_date("ts")
    )
    per_day = S.hll_presketch(ev, "user_id", ["day", "event_type"])
    merged = S.hll_merge_count(per_day).collect()[0].distinct_estimate
    exact = ev.select("user_id").distinct().count()
    assert abs(merged - exact) <= max(3, 0.06 * exact), (merged, exact)
    # regrouped coarser: per event_type estimates stay in bounds
    by_type = {
        r.event_type: r.distinct_estimate
        for r in S.hll_merge_count(per_day, ["event_type"]).collect()
    }
    exact_by_type = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for t, n in exact_by_type.items():
        assert abs(by_type[t] - n) <= max(3, 0.06 * n), (t, by_type[t], n)


def test_quantile_summary_rank_error(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    vals = sorted(r.value for r in ev.select("value").collect())
    n = len(vals)
    approx = S.quantile_summary(ev, "value", probs=(0.5, 0.9)).collect()[0].quantiles
    for p, got in zip((0.5, 0.9), approx):
        # value at the approximate quantile must sit within ±1% rank
        import bisect

        rank = bisect.bisect_left(vals, got) / n
        assert abs(rank - p) <= 0.02, (p, got, rank)


def test_kll_presketch_merge(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir).withColumn("day", F.to_date("ts"))
    per_day = S.kll_presketch(ev, "value", ["day"])
    med = S.kll_merge_quantile(per_day, 0.5).collect()[0].quantile
    vals = sorted(r.value for r in ev.select("value").collect())
    import bisect

    rank = bisect.bisect_left(vals, med) / len(vals)
    assert abs(rank - 0.5) <= 0.02, (med, rank)


def test_heavy_hitters_match_exact_topk(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    hh = S.heavy_hitters(ev, "event_type", k=3)
    got = {r.event_type: r.est_count for r in hh.collect()}
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"))
        .limit(3)
        .collect()
    }
    # 5 distinct types ≪ max_tracked → estimates are exact
    assert got == exact
