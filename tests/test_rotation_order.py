"""The rotation window is the driver's scorecard — pin its selection rules.

The catalog holds 50 driver rows (44 pinned + rotating slots). Slots go
to the pool names with the OLDEST committed driver row; never-recorded
oracles come first, in explicit debut order (_DEBUT_ORDER), so a block
of rows queued in one round cannot be displaced by later debuts before
earning its first CORRECTNESS row.
"""

from __future__ import annotations

from hawk_pack_spark.queries import catalog


def test_window_is_50_and_partitions_all_specs():
    assert len(catalog.CATALOG) == 50
    assert not set(catalog.CATALOG) & set(catalog.RETIRED)
    assert set(catalog.CATALOG) | set(catalog.RETIRED) == set(catalog._ALL_SPECS)


def test_debut_order_names_exist_and_rotate():
    for n in catalog._DEBUT_ORDER:
        assert n in catalog._ALL_SPECS, f"unknown name in _DEBUT_ORDER: {n}"
        assert n in catalog._ROTATION_POOL, f"{n} is pinned; debut order is moot"


def test_never_recorded_fill_slots_in_debut_order(monkeypatch):
    """With no rows recorded anywhere, the earliest debuts take every slot."""
    monkeypatch.setattr(catalog, "_last_driver_rows", lambda: {})
    cat, _ = catalog._rotate()
    expected = [
        n for n in catalog._DEBUT_ORDER if n in catalog._ROTATION_POOL
    ][: catalog._ROTATING_SLOTS]
    assert set(expected) <= set(cat)


def test_queued_tail_rotates_in_once_front_block_records(monkeypatch):
    """After the front of the debut queue earns its rows, the tail takes
    the freed slots — no debut can starve behind a recorded row."""
    front = catalog._DEBUT_ORDER[: catalog._ROTATING_SLOTS]
    monkeypatch.setattr(
        catalog, "_last_driver_rows", lambda: {n: 6 for n in front}
    )
    cat, _ = catalog._rotate()
    tail = [
        n
        for n in catalog._DEBUT_ORDER[catalog._ROTATING_SLOTS:]
        if n in catalog._ROTATION_POOL
    ][: catalog._ROTATING_SLOTS]
    for n in tail:
        assert n in cat, f"queued debut {n} failed to rotate in"


def test_recorded_rows_cycle_oldest_first(monkeypatch):
    """Once everything has recorded at least once, slots go to the rows
    with the oldest round number (round-robin, ties by name)."""
    stamped = {n: 3 for n in catalog._ROTATION_POOL}
    oldest = sorted(catalog._ROTATION_POOL)[:2]
    for n in oldest:
        stamped[n] = 1
    monkeypatch.setattr(catalog, "_last_driver_rows", lambda: stamped)
    cat, _ = catalog._rotate()
    for n in oldest:
        assert n in cat
