"""Round-11 guard regressions (ADVICE r10): seasonal_decompose rejects
even periods (the centered ROWS frame spans period rows only for odd
periods), the oracle-side lint actually catches DuckDB list types
(rendered 'INTEGER[]', not 'LIST'), benford_first_digit filters on
cents (sub-cent values no longer emit a spurious digit-0 row),
streaming heavy hitters exclude NULL items from counters AND n_seen,
and share_ppm is computed with integer division (exact, not a floored
double)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_seasonal_decompose_even_period_raises(spark):
    """Even periods used to produce garbage silently: the centered
    rowsBetween(-(p//2), p//2) frame spans p+1 rows for even p, so the
    count==period guard matched only truncated edge windows. Now a
    loud ValueError (ADVICE r10)."""
    from hawk_pack_spark.operators.analytics import seasonal_decompose

    df = spark.createDataFrame(
        [("a", "2024-01-01", 10)], "k string, d string, v long"
    ).select("k", F.col("d").cast("date").alias("d"), "v")
    with pytest.raises(ValueError, match="odd period"):
        seasonal_decompose(df, ["k"], "d", "v", period=4)
    with pytest.raises(ValueError, match="odd period"):
        seasonal_decompose(df, ["k"], "d", "v", period=1)
    # odd periods still build a plan (no execution needed)
    seasonal_decompose(df, ["k"], "d", "v", period=7).schema


def test_oracle_lint_flags_duckdb_list_types():
    """DuckDB renders list types as 'INTEGER[]' — containing neither
    'LIST' nor 'ARRAY' — so the r10 lint entries never matched the r9
    root-cause type. The ']'-suffix check must flag them (ADVICE
    r10)."""
    from hawk_pack_spark.oracle import lint_oracle_types

    con = duckdb.connect()
    assert lint_oracle_types(con, "SELECT [1, 2] AS l") == ["l:INTEGER[]"]
    assert lint_oracle_types(con, "SELECT ['a'] AS s") == ["s:VARCHAR[]"]
    # fixed-size arrays render 'INTEGER[3]' — also unhashable, also flagged
    assert lint_oracle_types(
        con, "SELECT CAST([1,2,3] AS INTEGER[3]) AS a"
    ) == ["a:INTEGER[3]"]
    # scalars stay clean
    assert lint_oracle_types(
        con, "SELECT CAST(1 AS BIGINT) AS x, 'y' AS y"
    ) == []


def test_benford_excludes_subcent_values(spark):
    """Values in (0, 0.005) round to 0 cents; the old value>0 filter
    let them through as a spurious digit-0 row with NULL benford_ppm.
    The filter is now cents>0 (ADVICE r10)."""
    from hawk_pack_spark.operators.profile import benford_first_digit

    df = spark.createDataFrame(
        [(0.004,), (0.002,), (1.23,), (1.99,), (9.50,), (None,), (-5.0,)],
        "v double",
    )
    rows = {r["digit"]: r for r in benford_first_digit(df, "v").collect()}
    assert 0 not in rows  # no spurious digit-0 row
    assert rows[1]["n_values"] == 2  # 1.23, 1.99
    assert rows[9]["n_values"] == 1  # 9.50
    assert set(rows) == {1, 9}
    # share_ppm is exact integer division: 2/3 -> 666666, 1/3 -> 333333
    assert rows[1]["share_ppm"] == 666666
    assert rows[9]["share_ppm"] == 333333
    assert all(r["benford_ppm"] is not None for r in rows.values())


def test_key_skew_share_ppm_integer_division(spark):
    """share_ppm is now bigint cross-multiply + integer div — the
    docstring's exactness claim holds without the 2^53 double bound
    (ADVICE r10). 1/3 of rows -> exactly 333333 ppm."""
    from hawk_pack_spark.operators.profile import key_skew_profile

    df = spark.createDataFrame(
        [(1,), (1,), (2,), (2,), (3,), (3,)], "k long"
    )
    rows = key_skew_profile(df, "k", top_k=10).collect()
    assert all(r["share_ppm"] == 333333 for r in rows)


def test_streaming_hh_fold_excludes_null_items():
    """NULL items are excluded from BOTH counters and n_seen: pandas
    value_counts silently dropped them from counters while the paired
    batch oracle kept a NULL group — latent parity break (ADVICE r10).
    Exercise the per-batch fold directly with a NaN-bearing frame."""
    from hawk_pack_spark.streaming.stateful import _heavy_hitters_fn_factory

    class _FakeState:
        exists = False

        def update(self, v):
            self.value = v

    fn = _heavy_hitters_fn_factory("item", capacity=10, key_names=["g"])
    pdf = pd.DataFrame({"item": ["x", None, "x", "y", None]})
    (out,) = list(fn(("a",), [pdf], _FakeState()))
    assert set(out["item"]) == {"x", "y"}
    assert int(out["n_seen"].iloc[0]) == 3  # NULLs not in n_seen either
    got = dict(zip(out["item"], out["est_count"]))
    assert got == {"x": 2, "y": 1}
