"""Streaming Misra-Gries heavy hitters: exact at capacity ≥ distinct
(streamed ≡ batch GROUP BY), and the classic MG guarantees under a
tight capacity (presence of every frequent item, est ≤ true ≤ est +
undercount_bound, summary size ≤ capacity)."""

from __future__ import annotations

from collections import Counter

from hawk_pack_spark.streaming.stateful import streaming_heavy_hitters

_SCHEMA = "g string, item string"


def _write(spark, rows, path):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.parquet(path)


def _run(spark, tmp_path, capacity, name):
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "src/*"))
    )
    q = (
        streaming_heavy_hitters(stream, "g", "item", capacity=capacity)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    # final snapshot per group = rows carrying the group's max n_seen
    last = {}
    for r in rows:
        if r.g not in last or r.n_seen > last[r.g]:
            last[r.g] = r.n_seen
    return [r for r in rows if r.n_seen == last[r.g]]


def _batches():
    b1 = [("a", "x")] * 5 + [("a", "y")] * 2 + [("b", "p")] * 3
    b2 = [("a", "x")] * 4 + [("a", "z")] * 3 + [("b", "q")] * 1
    b3 = [("a", "y")] * 2 + [("a", "w")] * 1 + [("b", "p")] * 2
    return b1, b2, b3


def test_heavy_hitters_exact_when_capacity_suffices(spark, tmp_path):
    b1, b2, b3 = _batches()
    for i, b in enumerate([b1, b2, b3]):
        _write(spark, b, str(tmp_path / f"src/b{i}"))
    final = _run(spark, tmp_path, capacity=10, name="hh_exact")
    truth = Counter((g, it) for g, it in b1 + b2 + b3)
    got = {(r.g, r.item): r for r in final}
    assert {(g, i) for g, i in truth} == set(got)
    for (g, it), c in truth.items():
        r = got[(g, it)]
        assert r.est_count == c  # exact: capacity >= distinct items
        assert r.undercount_bound == 0
    totals = Counter(g for g, _ in b1 + b2 + b3)
    assert all(r.n_seen == totals[r.g] for r in final)


def test_heavy_hitters_mg_guarantees_under_tight_capacity(spark, tmp_path):
    b1, b2, b3 = _batches()
    for i, b in enumerate([b1, b2, b3]):
        _write(spark, b, str(tmp_path / f"src/b{i}"))
    cap = 2
    final = _run(spark, tmp_path, capacity=cap, name="hh_tight")
    truth = Counter((g, it) for g, it in b1 + b2 + b3)
    totals = Counter(g for g, _ in b1 + b2 + b3)
    by_group = {}
    for r in final:
        by_group.setdefault(r.g, []).append(r)
    for g, rows in by_group.items():
        assert len(rows) <= cap
        d = rows[0].undercount_bound
        assert d <= totals[g] // (cap + 1) + totals[g] % (cap + 1)  # loose
        for r in rows:
            true = truth[(g, r.item)]
            assert r.est_count <= true <= r.est_count + d, (g, r.item)
        # every item with true freq > n/capacity must be present
        present = {r.item for r in rows}
        for (gg, it), c in truth.items():
            if gg == g and c > totals[g] / cap:
                assert it in present, (g, it, c)
