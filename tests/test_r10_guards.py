"""Round-10 guard regressions (ADVICE r9): as-of tie determinism vs the
tie-explicit oracle, _two_phase_rank NULL exclusion, chi-square
two-sided NULL parity on a nullable fixture, leakage_safe_split
non-integral id raise."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_asof_forward_duplicate_right_ts_picks_min_value(spark):
    """asof_join_forward's documented tie rule: among right rows tied on
    (key, matched ts) it returns the SMALLEST value tuple. The catalog
    oracle (ASOF_FWD_SQL) now pre-reduces to MIN(value) per (key, ts)
    to mirror exactly this — so a fixture gaining duplicate purchase
    timestamps can no longer flake the gate (ADVICE r9)."""
    from hawk_pack_spark.operators.asof import asof_join_forward

    left = spark.createDataFrame(
        [(1, 100, 5)], "event_id long, user_id long, ts long"
    )
    right = spark.createDataFrame(
        [(100, 10, 3.0), (100, 10, 1.0), (100, 10, 2.0), (100, 20, 0.5)],
        "user_id long, ts long, value double",
    )
    rows = asof_join_forward(left, right, "user_id").collect()
    assert len(rows) == 1
    assert rows[0]["asof_value"] == 1.0  # min among the ts=10 ties


def test_two_phase_rank_excludes_nulls(spark):
    """A NULL value used to take rank 1 on the Spark side (ASC default
    = NULLS FIRST) while the DuckDB oracles rank NULLS LAST — ranks are
    now over non-null values only (ADVICE r9)."""
    from hawk_pack_spark.operators.analytics import _two_phase_rank

    df = spark.createDataFrame(
        [(None,), (3,), (1,), (None,), (2,)], "v int"
    )
    got = {(r["_v"], r["_rank"], r["_n"]) for r in
           _two_phase_rank(df, "v", None).collect()}
    assert got == {(1, 1, 3), (2, 2, 3), (3, 3, 3)}


def test_chi_square_null_cohort_parity(spark):
    """chi_square_independence drops rows where EITHER column is NULL;
    the oracle's cm CTE now filters both sides too. Verify true parity
    on a fixture that HAS a NULL user_id (ADVICE r9's latent case)."""
    import duckdb

    from hawk_pack_spark.operators.analytics import chi_square_independence
    from hawk_pack_spark.queries.catalog import CHI_SQUARE_SQL

    rows = [
        ("click", 1), ("click", 2), ("buy", 1), ("buy", 2),
        ("click", 3), ("buy", 4), ("click", None), ("buy", None),
        (None, 1),
    ]
    ev = spark.createDataFrame(rows, "event_type string, user_id long")
    got = chi_square_independence(
        ev.select("event_type",
                  (F.col("user_id") % 2).cast("bigint").alias("cohort")),
        "event_type", "cohort",
    ).collect()[0]

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({'NULL' if t is None else repr(t)}, "
            f"{'NULL' if u is None else u})"
            for t, u in rows
        )
        + ") AS t(event_type, user_id)"
    )
    want = con.execute(CHI_SQUARE_SQL).fetchone()
    assert (got["n"], got["dof"]) == (want[0], want[1])
    assert got["chi2"] == pytest.approx(want[2], abs=1e-9)
    assert got["n"] == 6  # the three NULL-bearing rows are excluded


def test_knn_join_auto_derates_to_candidate_budget(spark):
    """VERDICT r9 #3: defaulted (nprobe, replicas) must derate against
    the candidate-pair budget instead of letting a hot corpus OOM the
    disk. A tiny budget on a one-hot-cluster corpus forces the derate:
    the warning names the chosen point and the join still completes."""
    import numpy as np

    from hawk_pack_spark.operators.similarity import knn_join

    rng = np.random.default_rng(7)
    # one tight cluster: every point probes/lands in the same cells, so
    # the exact measured volume ~ n^2 >> any small budget
    mat = rng.normal(size=(300, 8)) * 0.01
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(300)],
        "vec_id long, embedding array<double>",
    ).localCheckpoint()
    with pytest.warns(UserWarning, match="derated to"):
        g = knn_join(
            df, k=3, n_clusters=4, fit_fraction=1.0, dim=8,
            candidate_budget=10_000,
        )
    rows = g.collect()
    assert len(rows) > 0
    assert all(r.query_id != r.vec_id for r in rows)


def test_knn_join_explicit_params_are_absolute(spark):
    """Explicitly-passed nprobe/replicas must NEVER be derated, no
    matter how small the budget — explicit params are the documented
    absolute API (VERDICT r9 #3)."""
    import warnings as _w

    import numpy as np

    from hawk_pack_spark.operators.similarity import knn_join

    rng = np.random.default_rng(7)
    mat = rng.normal(size=(200, 8)) * 0.01
    df = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(200)],
        "vec_id long, embedding array<double>",
    ).localCheckpoint()
    with _w.catch_warnings():
        _w.simplefilter("error")  # any derate warning -> test failure
        g = knn_join(
            df, k=3, n_clusters=4, nprobe=2, replicas=2,
            fit_fraction=1.0, dim=8, candidate_budget=1,
        )
        assert g.count() > 0


def test_leakage_safe_split_rejects_non_integral_id(spark):
    """A string/uuid id would cast to NULL → NULL bucket → every doc
    silently lands in 'test'. Misuse now raises loudly (ADVICE r9)."""
    from hawk_pack_spark.functions.curation import leakage_safe_split

    docs = spark.createDataFrame(
        [("a-1", "hello"), ("a-2", "world")], "doc_id string, text string"
    )
    with pytest.raises(ValueError, match="non-integral"):
        leakage_safe_split(docs)
