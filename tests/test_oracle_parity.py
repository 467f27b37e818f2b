"""Every catalog query must hash-match its DuckDB oracle at sf0.001.

This is a local replica of the driver's CORRECTNESS gate; if this is
green, the per-round sf0.01 check should be too (verified manually via
tools/check_parity.py at sf0.01).
"""

from __future__ import annotations

import pytest

from hawk_pack_spark.oracle import check_catalog, duck_connection, compare
from hawk_pack_spark.queries import CATALOG


@pytest.fixture(scope="module")
def duck(sf_dir):
    return duck_connection(sf_dir)


@pytest.mark.parametrize("name", [n for n, s in CATALOG.items() if s.oracle])
def test_query_matches_oracle(spark, sf_dir, duck, name):
    spec = CATALOG[name]
    res = compare(name, spec.fn(spark, sf_dir), spec.oracle, duck)
    assert res.ok, f"{res.detail} {res.mismatches}"


def test_rows_only_queries_run(spark, sf_dir):
    for name, spec in CATALOG.items():
        if spec.oracle is None:
            assert spec.fn(spark, sf_dir).count() >= 0, name


def test_no_oracle_emits_hugeint_or_decimal(sf_dir, duck):
    """VERDICT r7 #1: DuckDB types SUM(BIGINT) as HUGEINT, which the
    driver canonicalizes as Arrow decimal128 — hash-mismatching Spark's
    BIGINT even on identical values. Lint EVERY oracle in ALL_SPECS
    (not just the live window) via the lazy type plan so the class of
    bug is dead, not just the two r7 instances."""
    from hawk_pack_spark.oracle import lint_oracle_types
    from hawk_pack_spark.queries import ALL_SPECS

    offenders = {}
    for name, spec in ALL_SPECS.items():
        if spec.oracle is None:
            continue
        bad = lint_oracle_types(duck, spec.oracle)
        if bad:
            offenders[name] = bad
    assert not offenders, f"oracles emitting HUGEINT/DECIMAL: {offenders}"


def test_no_spec_emits_nested_spark_types(spark, sf_dir):
    """VERDICT r9 #1: the driver's pandas hasher cannot sort
    ArrayType/MapType/StructType cells (`lineitem_fd_violations` erred
    before any comparison with `unhashable type: 'list'`). Lint EVERY
    oracle-paired spec's SPARK result schema across ALL_SPECS — schema
    only, no jobs — so the class is dead, not the instance."""
    from hawk_pack_spark.oracle import lint_spark_result_types
    from hawk_pack_spark.queries import ALL_SPECS

    offenders = {}
    for name, spec in ALL_SPECS.items():
        if spec.oracle is None:
            continue
        bad = lint_spark_result_types(spec.fn(spark, sf_dir))
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"specs emitting nested Spark output (array_join/to_json them): "
        f"{offenders}"
    )


def test_check_catalog_unknown_names_raise_descriptive_error(spark, sf_dir):
    """ADVICE r4: a stale rotation name or typo must abort up front with
    the offending names listed, not crash mid-sweep with a bare KeyError
    (and not silently skip)."""
    with pytest.raises(ValueError, match="unknown query names.*no_such_query"):
        check_catalog(spark, sf_dir, names=["no_such_query"])
