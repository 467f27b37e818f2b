"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (exact kNN over the embeddings
fixture — the LinearDb-port oracle of SURVEY.md §2.5) at sf0.001.
``queries()`` exposes every implemented operator from SURVEY.md §2;
``oracle_sql()`` the DuckDB-equivalent SQL for each (omitted only for
genuinely non-SQL-expressible ops, which get a rows-only check).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from hawk_pack_spark.queries import CATALOG  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _configure(spark: SparkSession) -> SparkSession:
    """Apply session conf the engine relies on (the driver builds its own
    SparkSession, so mirror hawk_pack_spark.session.get_spark here)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # immutable at runtime on some builds; events loader re-checks
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _configure(spark)
    return CATALOG["knn_exact_l2"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def bind(name):
        spec = CATALOG[name]

        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _configure(spark)
            return spec.fn(spark, sf_dir)

        run.__name__ = f"query_{name}"
        return run

    return {name: bind(name) for name in CATALOG}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (same column names/aliases)."""
    return {
        name: spec.oracle for name, spec in CATALOG.items() if spec.oracle is not None
    }
