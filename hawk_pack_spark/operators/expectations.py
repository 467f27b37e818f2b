"""Data-quality expectations: declarative validation rules over a
table, rendered into the MINIMUM number of Spark jobs.

The pipeline-maintenance complement of `operators/profile.py`: where
profiling describes a table, expectations GATE it (the dbt-test /
Great-Expectations shape). Row-local rules (not-null, range, set
membership, regex) all fold into ONE aggregate pass over the table;
uniqueness adds one groupBy; each foreign-key rule adds one anti-join
against its dimension. Violation COUNTS (not booleans) come back so a
report can rank failures; a 100 TB validation run is therefore
1 scan + (0-1) shuffle + one broadcast anti-join per FK.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation: ``name`` labels the report row; exactly one of
    ``predicate`` (row-local: violation when FALSE), ``unique_cols``,
    or (``fk_col``, ``fk_dim``, ``fk_dim_col``) is set."""

    name: str
    predicate: Column | None = None
    unique_cols: Sequence[str] | None = None
    fk_col: str | None = None
    fk_dim: DataFrame | None = None
    fk_dim_col: str | None = None


def not_null(name: str, col: str) -> Rule:
    return Rule(name, predicate=F.col(col).isNotNull())


def in_range(name: str, col: str, lo, hi) -> Rule:
    return Rule(
        name, predicate=(F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    )


def accepted_values(name: str, col: str, values: Sequence) -> Rule:
    return Rule(name, predicate=F.col(col).isin(list(values)))


def matches(name: str, col: str, pattern: str) -> Rule:
    return Rule(name, predicate=F.col(col).rlike(pattern))


def unique(name: str, *cols: str) -> Rule:
    return Rule(name, unique_cols=list(cols))


def foreign_key(name: str, col: str, dim: DataFrame, dim_col: str) -> Rule:
    return Rule(name, fk_col=col, fk_dim=dim, fk_dim_col=dim_col)


def check_expectations(df: DataFrame, rules: Sequence[Rule]) -> DataFrame:
    """Evaluate all rules; returns (rule, n_violations) — one report row
    per rule, violation counts exact.

    Null semantics: a row-local predicate evaluating to NULL (e.g. a
    range check on a NULL value) counts as a violation — an unknown
    value cannot SATISFY an expectation. Uniqueness counts every row
    beyond the first per duplicated key. FK counts child rows whose key
    has no parent (NULL keys violate too, orphans by definition).
    """
    parts: list[DataFrame] = []
    row_local = [r for r in rules if r.predicate is not None]
    if row_local:
        aggs = [
            F.sum(
                F.when(r.predicate, F.lit(0)).otherwise(F.lit(1))
            ).alias(r.name)
            for r in row_local
        ]
        wide = df.agg(*aggs)  # ONE pass for every row-local rule
        stack = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r.name).alias("rule"),
                        F.col(r.name).alias("n_violations"),
                    )
                    for r in row_local
                ]
            )
        ).alias("kv")
        parts.append(wide.select(stack).select("kv.rule", "kv.n_violations"))
    for r in rules:
        if r.unique_cols:
            dups = (
                df.groupBy(*r.unique_cols)
                .agg(F.count(F.lit(1)).alias("_n"))
                .agg(
                    F.coalesce(
                        F.sum(F.col("_n") - 1), F.lit(0)
                    ).alias("n_violations")
                )
                .select(F.lit(r.name).alias("rule"), "n_violations")
            )
            parts.append(dups)
        elif r.fk_col:
            orphans = (
                df.join(
                    r.fk_dim.select(
                        F.col(r.fk_dim_col).alias(r.fk_col)
                    ).distinct(),
                    r.fk_col,
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).alias("n_violations"))
                .select(F.lit(r.name).alias("rule"), "n_violations")
            )
            parts.append(orphans)
    return reduce(lambda a, b: a.unionByName(b), parts)
