"""DuckDB-oracle parity checker — a local replica of the driver's gate.

The driver runs each ``queries()`` entry on Spark and its ``oracle_sql()``
on DuckDB over the same parquet, then compares row count + schema +
order-insensitive value hash. This module reproduces that comparison so
regressions surface in ``pytest`` before a round ends.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
from pyspark.sql import DataFrame, SparkSession

from hawk_pack_spark.sources import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        # driver fixtures are single files; scaled fixtures
        # (tools/make_scale.py) are Spark-written directories of parts
        if os.path.isdir(path):
            path = os.path.join(path, "*.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style canonicalization: repr of the rounded double
        return repr(round(v, 9))
    if isinstance(v, list):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return repr(v)


def _canon_rows(cols, rows) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "|".join(_canon_cell(r[i]) for i in order) for r in rows
    )


# DuckDB result types the driver canonicalizes differently from Spark's
# (Arrow decimal128 vs int64): SUM(BIGINT) is typed HUGEINT by DuckDB, so
# any oracle emitting one of these hash-mismatches even when the VALUES
# are identical (r7 root cause: user_daily_gapfill / dq_expectations).
# LIST/ARRAY/STRUCT/MAP are banned outright: the driver canonicalizes via
# pandas sort_values, and a list cell is unhashable there (r9 root cause:
# lineitem_fd_violations errored before any comparison). Nested output
# must be serialized — array_to_string / to_json — in BOTH engines.
_BANNED_ORACLE_TYPES = (
    "HUGEINT", "UHUGEINT", "DECIMAL", "LIST", "ARRAY", "STRUCT", "MAP",
)


def lint_oracle_types(
    con: duckdb.DuckDBPyConnection, sql: str
) -> list[str]:
    """Return ``col:type`` offenders whose DuckDB result type the driver
    cannot hash-compare against Spark. Uses the lazy relation's type
    plan — no execution — so the full ALL_SPECS sweep is cheap. Fix
    offenders with ``CAST(… AS BIGINT)`` (or DOUBLE) in the oracle SQL;
    serialize nested types (``array_to_string`` / ``to_json``).
    """
    rel = con.sql(sql)
    # DuckDB renders list types as 'INTEGER[]' / 'VARCHAR[]' — the
    # string contains neither 'LIST' nor 'ARRAY', so the suffix check
    # is what actually catches the r9 root-cause class (ADVICE r10).
    return [
        f"{name}:{t}"
        for name, t in zip(rel.columns, rel.types)
        if any(b in str(t).upper() for b in _BANNED_ORACLE_TYPES)
        or str(t).upper().rstrip().endswith("]")
    ]


def lint_spark_result_types(spark_df: DataFrame) -> list[str]:
    """Mirror lint on the SPARK result schema: the driver's pandas-based
    hasher cannot sort ArrayType/MapType/StructType cells (unhashable in
    ``sort_values`` — the ``lineitem_fd_violations`` r9 failure), so no
    catalog query may emit one. Schema-only — no job runs.
    """
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


@dataclass
class ParityResult:
    name: str
    ok: bool
    detail: str = ""
    spark_rows: int = 0
    oracle_rows: int = 0
    mismatches: list[str] = field(default_factory=list)


def compare(
    name: str,
    spark_df: DataFrame,
    oracle_sql: str,
    con: duckdb.DuckDBPyConnection,
    max_mismatch_report: int = 5,
) -> ParityResult:
    s_cols = list(spark_df.columns)
    bad_types = lint_oracle_types(con, oracle_sql)
    if bad_types:
        return ParityResult(
            name,
            False,
            "oracle emits driver-unhashable types (CAST to BIGINT/DOUBLE, "
            "serialize nested): " + ", ".join(bad_types),
        )
    bad_spark = lint_spark_result_types(spark_df)
    if bad_spark:
        return ParityResult(
            name,
            False,
            "spark result emits driver-unhashable nested types "
            "(array_join / to_json them): " + ", ".join(bad_spark),
        )
    s_rows = [tuple(r) for r in spark_df.collect()]
    cur = con.execute(oracle_sql)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()

    if sorted(s_cols) != sorted(o_cols):
        return ParityResult(
            name, False, f"schema: spark={sorted(s_cols)} oracle={sorted(o_cols)}",
            len(s_rows), len(o_rows),
        )
    if len(s_rows) != len(o_rows):
        return ParityResult(
            name, False, f"rowcount: spark={len(s_rows)} oracle={len(o_rows)}",
            len(s_rows), len(o_rows),
        )
    s_canon = _canon_rows(s_cols, s_rows)
    o_canon = _canon_rows(o_cols, o_rows)
    if s_canon != o_canon:
        diffs = [
            f"spark={a!r} oracle={b!r}"
            for a, b in zip(s_canon, o_canon)
            if a != b
        ][:max_mismatch_report]
        return ParityResult(
            name, False, "value mismatch", len(s_rows), len(o_rows), diffs
        )
    return ParityResult(name, True, "", len(s_rows), len(o_rows))


def check_catalog(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[ParityResult]:
    # with no explicit names: sweep the CURRENT driver catalog (the
    # gate replica). Explicit names resolve from ALL_SPECS, so queries
    # waiting in the rotation pool can be pre-verified at any SF.
    from hawk_pack_spark.queries import ALL_SPECS, CATALOG

    if names:
        unknown = sorted(set(names) - set(ALL_SPECS))
        if unknown:
            raise ValueError(
                f"unknown query names {unknown} (not in ALL_SPECS; "
                "likely stale rotation names or typos) — no checks were run"
            )
        specs = {n: ALL_SPECS[n] for n in names}
    else:
        specs = CATALOG
    con = duck_connection(sf_dir)
    results = []
    for name, spec in specs.items():
        if names and name not in names:
            continue
        if spec.oracle is None:
            continue
        try:
            results.append(compare(name, spec.fn(spark, sf_dir), spec.oracle, con))
        except Exception as e:  # surface, don't abort the sweep
            results.append(ParityResult(name, False, f"exception: {e}"))
    return results
