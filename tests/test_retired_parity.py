"""Parity for RETIRED catalog queries.

The driver's correctness window records at most ~50 rows per round, so
the catalog holds exactly 50 entries; queries rotated out (superseded,
merged, or scale-retired variants — see NOTES.md) keep their DuckDB
oracles here, swept at sf0.001 so every operator they exercise stays
verified each round even though the driver no longer sees them.
"""

from __future__ import annotations

import pytest

from hawk_pack_spark.oracle import compare, duck_connection
from hawk_pack_spark.queries.catalog import RETIRED

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    return duck_connection(SF_DIR)


@pytest.mark.parametrize("name", sorted(RETIRED))
def test_retired_query_parity(spark, con, name):
    spec = RETIRED[name]
    assert spec.oracle is not None, f"retired query {name} must keep its oracle"
    res = compare(name, spec.fn(spark, SF_DIR), spec.oracle, con)
    assert res.ok, f"{name}: {res.detail} {res.mismatches[:2]}"
