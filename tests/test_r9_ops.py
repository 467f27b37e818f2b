"""Round-9 operators: association rules, rolling median, MAD outliers,
PMI collocations — local-reference checks (the catalog rows carry the
DuckDB parity)."""

from __future__ import annotations

import math
import statistics

from pyspark.sql import functions as F


def test_association_rules_closed_form(spark):
    from hawk_pack_spark.operators.graph import association_rules

    # baskets: {1:ab, 2:ab, 3:a, 4:bc, 5:c}
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (4, "b"),
            (4, "c"), (5, "c")]
    df = spark.createDataFrame(rows, "basket long, item string")
    out = {
        (r.antecedent, r.consequent): r
        for r in association_rules(df, "basket", "item", min_support=2).collect()
    }
    r = out[("a", "b")]
    # n_a=3, n_b=3, n_ab=2, N=5
    assert r.n_ab == 2 and r.n_a == 3 and r.n_b == 3
    assert r.confidence == round(2 / 3, 6)
    assert r.lift == round((2 / 3) / (3 / 5), 6)
    assert ("b", "a") in out  # directional, both orientations
    assert ("b", "c") not in out  # support 1 < min_support


def test_rolling_median_matches_local(spark):
    from hawk_pack_spark.operators.analytics import rolling_median

    vals = [5.0, 1.0, 9.0, 3.0, 7.0, 2.0, 8.0]
    rows = [("k", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    got = {
        r.i: r.rolling_median
        for r in rolling_median(df, ["k"], ["i"], "v", window_rows=3).collect()
    }
    for i in range(len(vals)):
        lo = max(0, i - 2)
        want = statistics.median([round(v * 100) for v in vals[lo:i + 1]]) / 100
        assert got[i] == want, (i, got[i], want)


def test_mad_outliers_resists_masking(spark):
    from hawk_pack_spark.operators.analytics import (
        mad_outliers,
        zscore_outliers,
    )

    # 50 values ~10, one at 500 and one at 100: the 500 inflates sigma
    # enough that z-score(100) shrinks; MAD flags both
    rows = [("g", float(10 + (i % 3))) for i in range(50)]
    rows += [("g", 500.0), ("g", 100.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = sorted(r.v for r in mad_outliers(df, ["g"], "v", k=10.0).collect())
    assert got == [100.0, 500.0]


def test_mad_outliers_zero_mad_group_flags_nothing(spark):
    from hawk_pack_spark.operators.analytics import mad_outliers

    # >half identical values -> MAD 0: the guard must not divide or flag
    rows = [("g", 5.0)] * 10 + [("g", 9.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    assert mad_outliers(df, ["g"], "v", k=3.0).count() == 0


def test_pmi_pairs_collocation_beats_common_pair(spark):
    from hawk_pack_spark.operators.bm25 import pmi_pairs

    # 'new york' always together (10 docs); 'the' everywhere (40 docs);
    # pmi(new,york) = ln(10*40/(10*10)) = ln 4; pmi(new,the) = ln 1 = 0
    docs = []
    for i in range(10):
        docs.append((i, "new york the"))
    for i in range(10, 40):
        docs.append((i, "the filler words"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        (r.term_a, r.term_b): r
        for r in pmi_pairs(df, min_pairs=5, k=20).collect()
    }
    ny = out[("new", "york")]
    assert ny.n_ab == 10 and ny.n_a == 10 and ny.n_b == 10
    assert ny.pmi == round(math.log(10 * 40 / 100), 6)
    assert out[("new", "the")].pmi == 0.0
    # ranking: the genuine collocation outranks the background pair
    assert ny.rank < out[("new", "the")].rank


def test_pmi_pairs_cap_bounds_fanout(spark):
    from hawk_pack_spark.operators.bm25 import pmi_pairs

    # one pathological doc with 30 distinct terms, cap 5: pairs from
    # that doc alone can involve only its 5 most frequent terms
    text = " ".join(f"t{i:02d}" for i in range(30))
    df = spark.createDataFrame(
        [(i, text) for i in range(6)], "doc_id long, text string"
    )
    out = pmi_pairs(df, min_pairs=5, max_terms_per_doc=5, k=100).collect()
    # all tf equal -> cap keeps lexicographically first 5 terms
    terms = {t for r in out for t in (r.term_a, r.term_b)}
    assert terms == {"t00", "t01", "t02", "t03", "t04"}
    assert len(out) == 10  # C(5,2)
