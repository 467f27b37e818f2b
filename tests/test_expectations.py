"""Expectations operator: exact violation counts on planted defects,
and the one-pass promise for row-local rules."""

from __future__ import annotations

from hawk_pack_spark.operators.expectations import (
    accepted_values,
    check_expectations,
    foreign_key,
    in_range,
    matches,
    not_null,
    unique,
)


def test_violation_counts_on_planted_defects(spark):
    df = spark.createDataFrame(
        [
            (1, "a", 10.0, "ok-1"),
            (2, "b", -5.0, "ok-2"),      # range violation
            (2, "z", 20.0, "bad"),       # dup key, domain violation, format violation
            (None, "a", None, "ok-3"),   # null key; null value -> range violation
            (3, "a", 1e9, "ok-4"),       # range violation
        ],
        "k long, status string, v double, tag string",
    )
    dim = spark.createDataFrame([(1,), (3,)], "pk long")
    rep = {
        r["rule"]: r["n_violations"]
        for r in check_expectations(
            df,
            [
                not_null("k_not_null", "k"),
                in_range("v_range", "v", 0.0, 100.0),
                accepted_values("status_domain", "status", ["a", "b"]),
                matches("tag_format", "tag", "^ok-"),
                unique("k_unique", "k"),
                foreign_key("k_fk", "k", dim, "pk"),
            ],
        ).collect()
    }
    assert rep == {
        "k_not_null": 1,
        "v_range": 3,       # -5, NULL (unknown can't satisfy), 1e9
        "status_domain": 1,
        "tag_format": 1,
        "k_unique": 1,      # one extra row under k=2
        "k_fk": 3,          # both k=2 rows and the NULL key have no parent
    }


def test_row_local_rules_share_one_scan(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(100)], "k long, v double")
    rep = check_expectations(
        df,
        [
            not_null("a", "k"),
            in_range("b", "v", 0.0, 50.0),
            accepted_values("c", "k", [1, 2, 3]),
        ],
    )
    # row-local rules fold into a single aggregate: exactly one scan of
    # the source in the optimized plan
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LogicalRDD") == 1
    got = {r["rule"]: r["n_violations"] for r in rep.collect()}
    assert got == {"a": 0, "b": 49, "c": 97}
