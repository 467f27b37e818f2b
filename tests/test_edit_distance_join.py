"""PassJoin pigeonhole edit-distance join: lossless-candidate contract
on adversarial fixtures (every edit position/type), vs a local
brute-force reference."""

from __future__ import annotations

import itertools

from hawk_pack_spark.operators.dedup import edit_distance_join


def _brute(rows, prefix_len, max_dist):
    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    out = set()
    for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
        d = lev(ta[:prefix_len], tb[:prefix_len])
        if d <= max_dist:
            lo, hi = min(ia, ib), max(ia, ib)
            out.add((lo, hi, d))
    return out


def test_pigeonhole_is_lossless_for_full_length_keys(spark):
    base = "the quick brown fox jumps over a"  # exactly 32 chars
    assert len(base) == 32
    rows = [(0, base)]
    rid = 1
    # substitutions at every position, incl. segment boundaries
    for p in range(32):
        rows.append((rid, base[:p] + "#" + base[p + 1 :])); rid += 1
    # deletions / insertions at varied positions (keys stay >= 32 via pad)
    for p in [0, 5, 11, 12, 21, 22, 23, 31]:
        rows.append((rid, (base[:p] + base[p + 1 :] + "zz")[:34])); rid += 1
        rows.append((rid, (base[:p] + "@" + base[p:])[:34])); rid += 1
    # two-edit combos crossing segments
    rows.append((rid, "#" + base[1:31] + "#")); rid += 1
    rows.append((rid, base[:10] + "##" + base[12:])); rid += 1
    # far-away text that must NOT match
    rows.append((rid, "completely different content here all new")); rid += 1

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], r["edit_dist"])
        for r in edit_distance_join(df, prefix_len=32, max_dist=2).collect()
    }
    assert got == _brute(rows, 32, 2)
    assert got, "fixture should produce matches"


def test_no_cross_join_in_plan(spark):
    rows = [(i, f"document number {i:020d} padding") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    plan = edit_distance_join(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
