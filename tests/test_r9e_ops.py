"""Round-9 batch 4: link prediction, schema profiling, serial/robust
statistics, readability, leakage-safe splits — closed-form checks."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_link_prediction_hand_graph(spark):
    from hawk_pack_spark.operators.graph import link_prediction

    # path graph 1-2-3 plus 1-4, 3-4: non-adjacent pair (1,3) shares
    # neighbors {2, 4}; (2, 4) shares {1, 3}.
    und = [(1, 2), (2, 3), (1, 4), (3, 4)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    rows = {
        (r.node_a, r.node_b): r
        for r in link_prediction(edges, min_common=1).collect()
    }
    assert set(rows) == {(1, 3), (2, 4)}
    r = rows[(1, 3)]
    assert r.common_neighbors == 2
    assert r.degree_a == 2 and r.degree_b == 2
    # Jaccard = 2 / (2 + 2 - 2) = 1.0
    assert r.jaccard == 1.0
    # AA = 1/ln(deg 2) + 1/ln(deg 4) = 2/ln(2)
    assert abs(r.adamic_adar - round(2 / math.log(2), 6)) < 1e-9


def test_link_prediction_hub_cap_excludes_wedges(spark):
    from hawk_pack_spark.operators.graph import link_prediction

    # star around hub 100 (degree 3) — with the cap below 3 no wedge
    # can be generated through it.
    und = [(1, 100), (2, 100), (3, 100)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    assert link_prediction(edges, min_common=1, max_hub_degree=2).count() == 0
    assert link_prediction(edges, min_common=1).count() == 3


def test_candidate_keys_counts(spark):
    from hawk_pack_spark.operators.profile import candidate_keys

    df = spark.createDataFrame(
        [(1, "a", None), (2, "a", 5.0), (3, "b", 5.0)],
        "id long, cat string, v double",
    )
    out = {r.column_name: r for r in candidate_keys(df, ["id", "cat", "v"]).collect()}
    assert out["id"].is_candidate_key and out["id"].n_distinct == 3
    assert not out["cat"].is_candidate_key and out["cat"].n_distinct == 2
    assert out["v"].n_nulls == 1 and out["v"].n_non_null == 2
    assert out["v"].n_distinct == 1 and not out["v"].is_candidate_key
    assert out["cat"].uniqueness == round(2 / 3, 6)


def test_fd_violations_detects_and_clears(spark):
    from hawk_pack_spark.operators.profile import fd_violations

    df = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "z"), (2, "z"), (None, "q")],
        "det long, dep string",
    )
    rows = fd_violations(df, "det", "dep").collect()
    assert len(rows) == 1
    (r,) = rows
    assert r.determinant == 1 and r.n_dependents == 2
    assert r.examples == ["x", "y"]
    holds = spark.createDataFrame([(1, "x"), (2, "y")], "det long, dep string")
    assert fd_violations(holds, "det", "dep").count() == 0


def test_acf_matches_numpy_pearson(spark):
    import numpy as np

    from hawk_pack_spark.operators.analytics import acf

    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]
    df = spark.createDataFrame(
        [("a", i, x) for i, x in enumerate(xs)], "g string, t long, x long"
    )
    out = {r.lag: r for r in acf(df, ["g"], "t", "x", max_lag=2).collect()}
    a = np.array(xs, dtype=float)
    for k in (1, 2):
        r_np = np.corrcoef(a[k:], a[:-k])[0, 1]
        assert out[k].n_pairs == len(xs) - k
        assert abs(out[k].acf - round(r_np, 6)) < 1e-6


def test_acf_constant_series_dropped(spark):
    from hawk_pack_spark.operators.analytics import acf

    df = spark.createDataFrame(
        [("c", i, 7) for i in range(10)], "g string, t long, x long"
    )
    # zero variance -> d1 = d2 = 0 -> no row (correlation undefined)
    assert acf(df, ["g"], "t", "x", max_lag=1).count() == 0


def test_theil_sen_robust_to_outlier(spark):
    from hawk_pack_spark.operators.analytics import theil_sen

    # y = 2x except one wild outlier; Theil-Sen should stay at 2.
    pts = [(i, 2 * i) for i in range(10)] + [(10, 1000)]
    df = spark.createDataFrame(
        [("g", x, y) for x, y in pts], "g string, x long, y long"
    )
    (row,) = theil_sen(df, ["g"], "x", "y").collect()
    assert row.slope == 2.0
    assert row.intercept == 0.0
    assert row.n_points == 11 and row.n_pairs == 55


def test_theil_sen_median_is_nearest_rank(spark):
    from hawk_pack_spark.operators.analytics import theil_sen

    # slopes between consecutive distinct points: 1, 3 (and 2 for the
    # skip pair) -> lower median of [1.0, 2.0, 3.0] = 2.0
    df = spark.createDataFrame(
        [("g", 0, 0), ("g", 1, 1), ("g", 2, 4)], "g string, x long, y long"
    )
    (row,) = theil_sen(df, ["g"], "x", "y").collect()
    assert row.slope == 2.0 and row.n_pairs == 3


def test_readability_hand_counts(spark):
    from hawk_pack_spark.functions.text import readability

    df = spark.createDataFrame(
        [(1, "The cat sat. The dog ran!")], "id long, text string"
    )
    feats = readability(F.col("text"))
    (r,) = df.select(
        *[v.alias(k) for k, v in feats.items()]
    ).collect()
    assert r.n_words == 6
    assert r.n_sentences == 2
    # per-word vowel runs (floor 1): the=1 cat=1 sat=1 the=1 dog=1 ran=1
    assert r.n_syllables == 6
    expected = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert abs(r.flesch - expected) < 1e-9


def test_leakage_safe_split_groups_duplicates(spark):
    from hawk_pack_spark.functions.curation import leakage_safe_split

    df = spark.createDataFrame(
        [(i, "dup text" if i % 3 == 0 else f"unique {i}") for i in range(30)],
        "doc_id long, text string",
    )
    out = leakage_safe_split(df).collect()
    assert len(out) == 30
    dup_splits = {r.split for r in out if r.doc_id % 3 == 0}
    assert len(dup_splits) == 1  # every duplicate lands in ONE split
    reps = {r.group_rep_id for r in out if r.doc_id % 3 == 0}
    assert reps == {0}
    # derandomized: second run is identical
    again = leakage_safe_split(df).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
