"""Round-8 tail operators: CDC apply, OHLC resample, histogram, BFS,
boolean retrieval, blocked kNN self-join."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# apply_changes (CDC MERGE)


def test_apply_changes_merge_semantics(spark):
    from hawk_pack_spark.operators.diff import apply_changes

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (2, "B", "upsert"),   # update
            (3, None, "delete"),  # delete
            (4, "d", "upsert"),   # insert
        ],
        "k long, v string, op string",
    )
    out = {r.k: r.v for r in apply_changes(snap, changes, ["k"]).collect()}
    assert out == {1: "a", 2: "B", 4: "d"}


def test_apply_changes_is_inverse_of_table_diff(spark):
    """apply(old, diff(old,new)+payload) == new — the roundtrip contract."""
    from hawk_pack_spark.operators.diff import apply_changes, table_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, v string, n long"
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 21), (4, "d", 40)], "k long, v string, n long"
    )
    d = table_diff(old, new, ["k"])
    # build the changeset: removed → delete; added/changed → upsert with
    # the NEW payload
    chg = d.join(new, "k", "left").select(
        "k",
        "v",
        "n",
        F.when(F.col("change") == "removed", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
    )
    got = apply_changes(old, chg, ["k"])
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, new.collect()))


def test_apply_changes_seq_last_writer_wins(spark):
    from hawk_pack_spark.operators.diff import apply_changes

    snap = spark.createDataFrame([(1, "a")], "k long, v string")
    changes = spark.createDataFrame(
        [(1, "x", "upsert", 1), (1, "y", "upsert", 2), (2, "z", "upsert", 1)],
        "k long, v string, op string, seq long",
    )
    out = {r.k: r.v for r in apply_changes(snap, changes, ["k"], seq_col="seq").collect()}
    assert out == {1: "y", 2: "z"}


def test_apply_changes_validates_columns(spark):
    from hawk_pack_spark.operators.diff import apply_changes

    snap = spark.createDataFrame([(1, "a")], "k long, v string")
    chg = spark.createDataFrame([(1, "upsert")], "k long, op string")
    with pytest.raises(ValueError):
        apply_changes(snap, chg.drop("k"), ["k"])
    with pytest.raises(ValueError):
        apply_changes(snap, chg.withColumnRenamed("op", "o"), ["k"])


# ---------------------------------------------------------------------------
# resample_ohlc


def test_ohlc_deterministic_under_ts_ties(spark):
    from hawk_pack_spark.operators.analytics import resample_ohlc

    t0 = dt.datetime(2024, 1, 1, 10, 15)
    rows = [
        # two rows with IDENTICAL ts — tiebreak id decides open
        ("a", t0, 1, 5.0),
        ("a", t0, 2, 7.0),
        ("a", dt.datetime(2024, 1, 1, 10, 45), 3, 2.0),
        ("a", dt.datetime(2024, 1, 1, 11, 5), 4, 9.0),
        ("b", t0, 5, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "g string, ts timestamp, eid long, v double"
    )
    out = {
        (r.g, r.bucket_start.hour): r
        for r in resample_ohlc(df, "ts", ["g"], "v", "eid", "1 hour").collect()
    }
    bar = out[("a", 10)]
    assert bar.open_v == 5.0  # eid 1 before eid 2 at the tied ts
    assert bar.high_v == 7.0 and bar.low_v == 2.0
    assert bar.close_v == 2.0
    assert bar.volume == 14.0 and bar.n_rows == 3
    assert out[("a", 11)].open_v == out[("a", 11)].close_v == 9.0
    assert out[("b", 10)].n_rows == 1


# ---------------------------------------------------------------------------
# histogram


def test_histogram_dense_clamped(spark):
    from hawk_pack_spark.operators.analytics import histogram

    df = spark.createDataFrame(
        [("x", -5.0), ("x", 0.0), ("x", 9.99), ("x", 10.0), ("x", 25.0),
         ("x", 99.0), ("x", 200.0), ("y", 50.0)],
        "g string, v double",
    )
    out = histogram(df, "v", bins=10, lo=0.0, hi=100.0, group_cols=["g"])
    rows = {(r.g, r.bin): r for r in out.collect()}
    assert len(rows) == 20  # dense: 2 groups × 10 bins
    assert rows[("x", 0)].n == 3  # -5 clamps in, 0.0, 9.99
    assert rows[("x", 1)].n == 1  # 10.0
    assert rows[("x", 2)].n == 1  # 25.0
    assert rows[("x", 9)].n == 2  # 99 and the 200 clamp
    assert rows[("x", 5)].n == 0
    assert rows[("y", 5)].n == 1
    assert rows[("x", 3)].bin_lo == 30.0 and rows[("x", 3)].bin_hi == 40.0


def test_histogram_validates(spark):
    from hawk_pack_spark.operators.analytics import histogram

    df = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        histogram(df, "v", bins=0, lo=0.0, hi=1.0)
    with pytest.raises(ValueError):
        histogram(df, "v", bins=4, lo=1.0, hi=1.0)


# ---------------------------------------------------------------------------
# bfs_distances


def test_bfs_cycle_and_cap(spark):
    from hawk_pack_spark.operators.graph import bfs_distances

    # 1-2-3-4-5 path plus a 1-3 chord and a 5-1 cycle edge
    und = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 3), (5, 1)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    src = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.dist for r in bfs_distances(edges, src, max_hops=4).collect()}
    assert got == {1: 0, 2: 1, 3: 1, 5: 1, 4: 2}
    # cap: only the source at 0 hops
    got0 = {r.node: r.dist for r in bfs_distances(edges, src, max_hops=0).collect()}
    assert got0 == {1: 0}


def test_bfs_unreachable_absent(spark):
    from hawk_pack_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (8, 9), (9, 8)], "src long, dst long"
    )
    src = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.dist for r in bfs_distances(edges, src, max_hops=5).collect()}
    assert got == {1: 0, 2: 1}  # the 8-9 component never appears


# ---------------------------------------------------------------------------
# boolean retrieval


def test_boolean_retrieval_clauses(spark):
    from hawk_pack_spark.operators.retrieval import (
        boolean_retrieval,
        build_postings,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark join fast"),
            (2, "spark slow scan"),
            (3, "join table spark"),
            (4, "vector stream table"),
        ],
        "doc_id long, text string",
    )
    postings = build_postings(docs)
    queries = spark.createDataFrame(
        [
            (1, ["spark"], [], []),              # plain AND of one term
            (2, ["spark"], ["join", "scan"], []),  # OR clause
            (3, ["spark"], [], ["slow"]),          # NOT clause
            (4, ["table"], ["vector"], ["join"]),  # all three
            (5, ["missing"], [], []),              # no hits
        ],
        "query_id int, must array<string>, any array<string>, none array<string>",
    )
    got = {
        (r.query_id, r.doc_id)
        for r in boolean_retrieval(postings, queries).collect()
    }
    assert {d for q, d in got if q == 1} == {1, 2, 3}
    assert {d for q, d in got if q == 2} == {1, 2, 3}
    assert {d for q, d in got if q == 3} == {1, 3}
    assert {d for q, d in got if q == 4} == {4}
    assert {d for q, d in got if q == 5} == set()


# ---------------------------------------------------------------------------
# knn_join


def test_knn_join_contract(spark, sf_dir):
    from hawk_pack_spark.operators.knn_exact import knn_exact
    from hawk_pack_spark.operators.similarity import knn_join
    from hawk_pack_spark.sources import load_table

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    k = 10  # the spec's k: NN-descent refinement strengthens with graph
    # degree, so recall at k=5 is measurably lower — keep the test on the
    # configuration the catalog row gates
    g = knn_join(emb, k=k)
    deg = g.groupBy("query_id").agg(F.count(F.lit(1)).alias("d"))
    mn, mx = deg.agg(F.min("d"), F.max("d")).first()
    assert mn == mx == k
    assert g.where(F.col("query_id") == F.col("vec_id")).count() == 0
    # sampled recall vs exact on 32 anchors
    anchors = (
        emb.orderBy(F.xxhash64("vec_id"), "vec_id")
        .limit(32)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    exact = knn_exact(emb, anchors, k=k, metric="l2_sq")
    hit = g.join(
        exact.select("query_id", "vec_id"), ["query_id", "vec_id"], "leftsemi"
    ).count()
    assert hit >= 0.8 * 32 * k


# ---------------------------------------------------------------------------
# trend_slopes


def test_trend_slopes_exact_line(spark):
    from hawk_pack_spark.operators.analytics import trend_slopes

    rows = [("a", x, 2 * x + 3) for x in range(10)] + [("b", x, 7) for x in range(5)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    out = {r.g: r for r in trend_slopes(df, ["g"], F.col("x"), F.col("y")).collect()}
    assert out["a"].slope == 2.0 and out["a"].intercept == 3.0
    assert out["a"].n == 10
    assert out["b"].slope == 0.0 and out["b"].intercept == 7.0


def test_trend_slopes_degenerate_null(spark):
    from hawk_pack_spark.operators.analytics import trend_slopes

    # zero x-variance → NULL slope/intercept, not a division error
    df = spark.createDataFrame([("a", 5, 1), ("a", 5, 9)], "g string, x long, y long")
    r = trend_slopes(df, ["g"], F.col("x"), F.col("y")).first()
    assert r.slope is None and r.intercept is None and r.n == 2


# ---------------------------------------------------------------------------
# join_cardinality


def test_join_cardinality_exact(spark):
    from hawk_pack_spark.operators.profile import join_cardinality

    left = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (None,)], "k long"
    )
    right = spark.createDataFrame(
        [(1,), (2,), (2,), (2,), (4,), (None,)], "k long"
    )
    r = join_cardinality(left, right, "k", "k").first()
    # 1: 2*1, 2: 1*3 → 5 pairs; NULL keys excluded (SQL join semantics)
    assert r.n_pairs == 5.0
    assert r.keys_both == 2
    assert r.keys_left_only == 1   # key 3
    assert r.keys_right_only == 1  # key 4
    assert r.max_left_fanout == 2 and r.max_right_fanout == 3
    # the prediction equals the executed join
    assert left.join(right, "k").count() == 5


# ---------------------------------------------------------------------------
# jaccard_prefix_join


def test_jaccard_prefix_join_lossless_vs_brute(spark):
    from itertools import combinations

    from hawk_pack_spark.operators.dedup import jaccard_prefix_join

    docs = [
        (1, "a b c d e"),
        (2, "a b c d f"),    # jac 4/6 = 0.667 with 1
        (3, "a b c d e"),    # exact dup of 1 → jac 1.0
        (4, "x y z w"),
        (5, "x y z w v u"),  # jac 4/6 = 0.667 with 4
        (6, "p q"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for tau in (0.6, 0.8, 1.0):
        got = {
            (r.id_a, r.id_b)
            for r in jaccard_prefix_join(df, threshold=tau).collect()
        }
        sets = {i: set(t.split()) for i, t in docs}
        want = {
            (a, b)
            for a, b in combinations(sorted(sets), 2)
            if len(sets[a] & sets[b]) / len(sets[a] | sets[b]) >= tau - 1e-12
        }
        assert got == want, f"tau={tau}"


def test_jaccard_prefix_join_gram_mode(spark):
    from hawk_pack_spark.operators.dedup import jaccard_prefix_join

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in jaccard_prefix_join(df, threshold=0.5, gram_n=3).collect()
    }
    # docs 1/2 share 6 of 7 3-grams each → jac 6/8 = 0.75
    assert set(got) == {(1, 2)} and got[(1, 2)] == 0.75


def test_jaccard_prefix_join_validates(spark):
    import pytest as _pytest

    from hawk_pack_spark.operators.dedup import jaccard_prefix_join

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        jaccard_prefix_join(df, threshold=0.0)


# ---------------------------------------------------------------------------
# label_propagation


def test_label_propagation_two_communities(spark):
    from hawk_pack_spark.operators.graph import label_propagation

    # two 4-cliques bridged by one edge
    c1 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a != b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a != b]
    bridge = [(4, 10), (10, 4)]
    edges = spark.createDataFrame(c1 + c2 + bridge, "src long, dst long")
    out = {r.node: r.label for r in label_propagation(edges, iters=4).collect()}
    # each clique converges to ONE label; the two differ
    l1 = {out[n] for n in range(1, 5)}
    l2 = {out[n] for n in range(10, 14)}
    assert len(l1) == 1 and len(l2) == 1 and l1 != l2


def test_label_propagation_deterministic(spark):
    from hawk_pack_spark.operators.graph import label_propagation

    und = [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    a = sorted(map(tuple, label_propagation(edges, iters=3).collect()))
    b = sorted(map(tuple, label_propagation(edges.repartition(7), iters=3).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# l2_sq_unrolled ≡ l2_sq (bit identity)


def test_l2_sq_unrolled_bit_identical(spark, sf_dir):
    from hawk_pack_spark.functions.distance import l2_sq, l2_sq_unrolled
    from hawk_pack_spark.sources import load_table

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    ).limit(60)
    a = emb.select(F.col("vec_id").alias("ia"), F.col("e").alias("ea"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("e").alias("eb"))
    pairs = a.crossJoin(b)
    bad = pairs.where(
        l2_sq(F.col("ea"), F.col("eb"))
        != l2_sq_unrolled(F.col("ea"), F.col("eb"), 64)
    ).count()
    assert bad == 0  # same left-to-right fold → same doubles, every pair


# ---------------------------------------------------------------------------
# top_event_paths


def test_top_event_paths_order_and_count(spark):
    from hawk_pack_spark.operators.analytics import top_event_paths

    rows = [
        (1, "d1", "a", 1), (1, "d1", "b", 2), (1, "d1", "c", 3),
        (2, "d1", "a", 1), (2, "d1", "b", 2), (2, "d1", "c", 3),
        (3, "d1", "b", 1), (3, "d1", "a", 2),
        # user 4: more than max_steps events — truncated to first 2
        (4, "d1", "a", 1), (4, "d1", "b", 2), (4, "d1", "x", 3),
    ]
    df = spark.createDataFrame(rows, "u long, day string, t string, ts long")
    out = {
        r.path: (r.n_entities, r.rank)
        for r in top_event_paths(
            df, ["u", "day"], "t", ["ts"], max_steps=2, k=10
        ).collect()
    }
    assert out["a>b"] == (3, 1)   # users 1, 2, 4 (truncated)
    assert out["b>a"] == (1, 2)   # user 3 alone


def test_top_event_paths_partition_invariant(spark):
    from hawk_pack_spark.operators.analytics import top_event_paths

    rows = [(u, "d", t, s) for u in range(20) for s, t in enumerate("abcd")]
    df = spark.createDataFrame(rows, "u long, day string, t string, ts long")
    a = sorted(map(tuple, top_event_paths(df, ["u", "day"], "t", ["ts"], 4, 5).collect()))
    b = sorted(map(tuple, top_event_paths(df.repartition(13), ["u", "day"], "t", ["ts"], 4, 5).collect()))
    assert a == b and a[0][0] == "a>b>c>d" and a[0][1] == 20


# ---------------------------------------------------------------------------
# ewma


def test_ewma_matches_pandas(spark):
    import pandas as pd

    from hawk_pack_spark.operators.analytics import ewma

    vals = [1.0, 5.0, 2.0, 8.0, 3.0, 9.0, 4.0, 7.0, 6.0, 0.0]
    rows = [("g", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, i long, v double")
    got = {
        r.i: r.ewma
        for r in ewma(df, ["g"], "v", ["i"], alpha=0.5, span=len(vals)).collect()
    }
    want = pd.Series(vals).ewm(alpha=0.5, adjust=True).mean()
    for i in range(len(vals)):
        assert abs(got[i] - want[i]) < 1e-6, i


def test_ewma_validates(spark):
    from hawk_pack_spark.operators.analytics import ewma

    df = spark.createDataFrame([("g", 1, 1.0)], "g string, i long, v double")
    with pytest.raises(ValueError):
        ewma(df, ["g"], "v", ["i"], alpha=0.0)
    with pytest.raises(ValueError):
        ewma(df, ["g"], "v", ["i"], alpha=0.5, span=0)


# ---------------------------------------------------------------------------
# inclusion_profile


def test_inclusion_profile(spark):
    from hawk_pack_spark.operators.profile import inclusion_profile

    child = spark.createDataFrame([(1,), (1,), (2,), (3,), (None,)], "k long")
    parent = spark.createDataFrame([(1,), (2,), (9,)], "k long")
    r = inclusion_profile([(child, "c", "k", parent, "p", "k")]).first()
    assert r.n_child_distinct == 3  # NULL excluded
    assert r.n_shared == 2          # 1 and 2
    assert r.inclusion == round(2 / 3, 6)  # operator rounds at 6
    assert r.child == "c.k" and r.parent == "p.k"


# ---------------------------------------------------------------------------
# mmr_rerank


def test_mmr_rerank_greedy_contract(spark):
    import numpy as np

    from hawk_pack_spark.operators.retrieval import mmr_rerank

    # 1 query, 4 candidates: two near-duplicates with top relevance, one
    # orthogonal mid-relevance, one weak
    cand = [
        (1, 10, 1.00, [1.0, 0.0, 0.0]),
        (1, 11, 0.99, [0.999, 0.01, 0.0]),   # near-dup of 10
        (1, 12, 0.60, [0.0, 1.0, 0.0]),      # orthogonal
        (1, 13, 0.10, [0.0, 0.9, 0.1]),
    ]
    df = spark.createDataFrame(
        cand, "query_id long, vec_id long, rel double, embedding array<double>"
    )
    got = [
        (r.vec_id, r.mmr_rank)
        for r in mmr_rerank(df, k=3, lam=0.5).orderBy("mmr_rank").collect()
    ]
    # pick 1: argmax rel = 10; pick 2: the near-dup 11 is crushed by the
    # similarity penalty → orthogonal 12 wins; pick 3: 11 vs 13
    assert got[0] == (10, 1)
    assert got[1] == (12, 2)
    ids = [g[0] for g in got]
    assert len(ids) == 3 and len(set(ids)) == 3


def test_mmr_rerank_validates(spark):
    from hawk_pack_spark.operators.retrieval import mmr_rerank

    df = spark.createDataFrame(
        [(1, 1, 1.0, [1.0])],
        "query_id long, vec_id long, rel double, embedding array<double>",
    )
    with pytest.raises(ValueError):
        mmr_rerank(df, k=1, lam=1.5)


# ---------------------------------------------------------------------------
# tfidf_top_terms


def test_tfidf_top_terms(spark):
    import math

    from hawk_pack_spark.operators.bm25 import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "apple apple banana common common"),
            (2, "banana cherry common"),
            (3, "cherry cherry common common"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.rank): (r.term, r.tf, r.score)
        for r in tfidf_top_terms(docs, k=2).collect()
    }
    # doc 1: apple tf=2 df=1 → 2·ln(3); banana tf=1 df=2 → ln(1.5);
    # common tf=2 df=3 → 0
    assert out[(1, 1)][0] == "apple"
    assert out[(1, 1)][2] == round(2 * math.log(3.0), 6)
    assert out[(1, 2)][0] == "banana"
    # doc 3: cherry tf=2 df=2 → 2·ln(1.5) beats common (0)
    assert out[(3, 1)][0] == "cherry"


# ---------------------------------------------------------------------------
# item_similarity


def test_item_similarity_cosine(spark):
    from hawk_pack_spark.operators.graph import item_similarity

    # baskets: items 1,2 co-occur twice; item 1 in 3 baskets, 2 in 2,
    # 3 in 2 (co-occurs once with 1 — below min_support)
    rows = [
        (100, 1), (100, 2),
        (200, 1), (200, 2),
        (300, 1), (300, 3),
        (400, 3),
    ]
    df = spark.createDataFrame(rows, "b long, i long")
    out = {
        (r.item, r.other): (r.n_ab, r.sim)
        for r in item_similarity(df, "b", "i", min_support=2, k=5).collect()
    }
    import math

    assert out[(1, 2)] == (2, round(2 / math.sqrt(3 * 2), 6))
    assert out[(2, 1)] == out[(1, 2)]  # symmetric
    assert (1, 3) not in out  # below support


# ---------------------------------------------------------------------------
# plan pins (the iterative / broadcast scale shapes)


def test_bfs_plan_has_no_parquet_scans(spark, tmp_path):
    """bfs_distances follows the pagerank checkpoint discipline: the
    returned plan joins checkpointed RDDs only — the parquet edge list
    is read exactly once (at checkpoint time), independent of hops."""
    from hawk_pack_spark.operators.graph import bfs_distances

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 0), (2, 1), (3, 2), (4, 3)]
    path = str(tmp_path / "edges.parquet")
    spark.createDataFrame(edges, "src long, dst long").write.parquet(path)
    df = spark.read.parquet(path)
    src = spark.createDataFrame([(0,)], "node long")
    plan = (
        bfs_distances(df, src, max_hops=3)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "parquet" not in plan.lower(), plan


def test_label_propagation_plan_has_no_parquet_scans(spark, tmp_path):
    from hawk_pack_spark.operators.graph import label_propagation

    und = [(1, 2), (2, 3), (3, 1)]
    path = str(tmp_path / "edges.parquet")
    spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    ).write.parquet(path)
    df = spark.read.parquet(path)
    plan = (
        label_propagation(df, iters=3)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "parquet" not in plan.lower(), plan


def test_boolean_retrieval_broadcasts_query_terms(spark, sf_dir):
    """The corpus-sized postings must meet the query terms in a
    BroadcastHashJoin probe — the postings side never shuffles for the
    term match."""
    from hawk_pack_spark.operators.retrieval import (
        boolean_retrieval,
        build_postings,
    )
    from hawk_pack_spark.sources import load_table

    docs = load_table(spark, "documents", sf_dir)
    queries = spark.createDataFrame(
        [(1, ["spark"], [], ["slow"])],
        "query_id int, must array<string>, any array<string>, none array<string>",
    )
    plan = (
        boolean_retrieval(build_postings(docs), queries)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan, plan
