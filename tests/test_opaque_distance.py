"""Comparison-only opaque DistanceRef (reference src/traits.rs:29-32):
ordering must flow ONLY through the less_than relation — never through
the token bytes — and the catalog row must match a brute-force
comparator driven by the hidden order."""

from __future__ import annotations

from pyspark.sql import functions as F

from hawk_pack_spark.operators.opaque import (
    CODEBOOK,
    comparison_topk,
    less_than_relation,
    opaque_token,
)


def _brute(pairs_rows, k):
    """Driver-side comparison-only top-k: sort key is (hidden index,
    id) — the ONLY place the hidden order is allowed to exist."""
    hidden = {t: i for i, t in enumerate(CODEBOOK)}
    by_q = {}
    for q, v, t in pairs_rows:
        by_q.setdefault(q, []).append((v, t))
    out = set()
    for q, cands in by_q.items():
        cands.sort(key=lambda c: (hidden[c[1]], c[0]))
        for r, (v, t) in enumerate(cands[:k]):
            out.add((q, v, t, r))
    return out


def _mkpairs(spark, n_q=4, n_c=60):
    ids = spark.range(n_c).select(F.col("id").alias("vec_id"))
    qs = spark.range(n_q).select(F.col("id").alias("query_id"))
    return qs.crossJoin(ids).select(
        "query_id",
        "vec_id",
        opaque_token(F.col("query_id") * 31 + F.col("vec_id")).alias("tok"),
    )


def test_comparison_topk_matches_hidden_order(spark):
    pairs = _mkpairs(spark)
    got = {
        (r.query_id, r.vec_id, r.tok, r.rnk)
        for r in comparison_topk(pairs, less_than_relation(spark), 7).collect()
    }
    want = _brute(
        [(r.query_id, r.vec_id, r.tok) for r in pairs.collect()], 7
    )
    assert got == want


def test_hidden_order_disagrees_with_lexicographic(spark):
    """The proof the engine never sorts token bytes: ranking by
    lexicographic token order produces a DIFFERENT top-k, so agreement
    with the hidden order (above) can only come from the relation."""
    pairs = _mkpairs(spark)
    rows = [(r.query_id, r.vec_id, r.tok) for r in pairs.collect()]
    lex = set()
    by_q = {}
    for q, v, t in rows:
        by_q.setdefault(q, []).append((v, t))
    for q, cands in by_q.items():
        cands.sort(key=lambda c: (c[1], c[0]))  # token BYTES
        for r, (v, t) in enumerate(cands[:7]):
            lex.add((q, v, t, r))
    assert lex != _brute(rows, 7)
    # and the codebook itself is maximally non-lexicographic: no token
    # sits at its lexicographic rank
    srt = sorted(CODEBOOK)
    assert all(srt.index(t) != i for i, t in enumerate(CODEBOOK))


def test_no_global_window_no_token_sort(spark):
    """Plan pins: the only Window is PARTITIONED by (query, token) and
    ordered by the id handle; no sort order anywhere keys on the token
    column itself."""
    pairs = _mkpairs(spark)
    df = comparison_topk(pairs, less_than_relation(spark), 7)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for chunk in plan.split("Window [")[1:]:
        head = chunk[:400]
        part = head.split("]", 2)[1]
        assert "query_id" in part and "tok" in part, head
        order = head.split("]", 3)[2]
        assert "vec_id" in order and "tok" not in order, head


def test_register_metric_accepts_opaque_expression(spark):
    """register_metric is the plug-in surface for eval_distance; an
    opaque metric registers like any other, its column is a STRING, and
    its consumer is comparison_topk (the less_than path) — nothing in
    the registration assumes numeric distance."""
    from pyspark.sql.types import StringType

    from hawk_pack_spark.functions.distance import METRICS, distance_expr, register_metric

    try:
        register_metric(
            "opaque_demo",
            lambda a, b: opaque_token(
                F.crc32(F.concat_ws(",", a.cast("array<string>")))
                + F.crc32(F.concat_ws(",", b.cast("array<string>")))
            ),
        )
        df = spark.createDataFrame(
            [([1.0, 2.0], [3.0, 4.0])], "a array<double>, b array<double>"
        ).select(distance_expr("opaque_demo", F.col("a"), F.col("b")).alias("d"))
        assert isinstance(df.schema["d"].dataType, StringType)
        assert df.collect()[0].d in CODEBOOK
    finally:
        METRICS.pop("opaque_demo", None)
