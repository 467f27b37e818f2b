"""Plan-shape pins for round-10 operators: the docstrings make scale
claims (TakeOrdered top-k, no cartesian candidates, distributed rank) —
these tests make the executed plan keep them."""

from __future__ import annotations


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_key_skew_top_k_is_take_ordered(spark):
    """key_skew_profile claims its top-k is a TakeOrderedAndProject
    (distributed partial top-k), never a full global sort of the key
    counts."""
    from hawk_pack_spark.operators.profile import key_skew_profile

    df = spark.createDataFrame(
        [(i % 7,) for i in range(200)], "k long"
    )
    plan = _plan(key_skew_profile(df, "k", top_k=3))
    assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_js_divergence_vocab_cut_is_take_ordered(spark):
    """js_divergence's vocabulary cut claims the oov_rate discipline:
    orderBy+limit must plan as TakeOrderedAndProject — a one-partition
    sort of the term-frequency table would serialize at corpus
    vocabulary scale."""
    from hawk_pack_spark.operators.bm25 import js_divergence

    docs = spark.createDataFrame(
        [(1, "A", "x y z"), (2, "B", "x q r")],
        "doc_id long, source string, text string",
    )
    plan = _plan(js_divergence(docs, "source", "text", vocab_size=2))
    assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_cosine_prefix_join_never_cartesian(spark):
    """cosine_prefix_join claims candidates come from a prefix-postings
    equi-join — no CartesianProduct or BroadcastNestedLoopJoin may
    appear anywhere in the plan."""
    from hawk_pack_spark.operators.dedup import cosine_prefix_join

    docs = spark.createDataFrame(
        [(i, f"w{i % 4} common{i % 2} x{i}") for i in range(12)],
        "doc_id long, text string",
    )
    plan = _plan(cosine_prefix_join(docs, threshold=0.6))
    assert "CartesianProduct" not in plan, plan[:2000]
    # the only nested-loop joins allowed are the 1-ROW doc-count
    # broadcasts (crossJoin(broadcast(n_docs)) — every such line must
    # reference the _nd count column, i.e. never a corpus x corpus loop
    for line in plan.splitlines():
        if "BroadcastNestedLoopJoin" in line:
            assert "_nd#" in line, line


def test_mann_whitney_rank_has_no_single_partition_window(spark):
    """mann_whitney_u ranks through the distributed two-phase rank —
    every Window in its plan must sit on a hash/range-partitioned
    exchange, never Exchange SinglePartition over the data stream."""
    from hawk_pack_spark.operators.analytics import mann_whitney_u

    df = spark.createDataFrame(
        [("A" if i % 2 else "B", float(i % 13)) for i in range(100)],
        "grp string, v double",
    )
    plan = _plan(mann_whitney_u(df, "grp", "v"))
    for chunk in plan.split("Window ")[1:]:
        head = chunk[:400]
        assert (
            "rangepartitioning" in head
            or "hashpartitioning" in head
            or "Sort" in head
        ), head


def test_seasonal_decompose_single_window_sort(spark):
    """seasonal_decompose claims ONE (key, day) window sort shared by
    the trend frame — the plan must not contain more than one
    rangepartitioning-or-window sort over the daily stream plus the
    small phase aggregation exchanges. Budget: <= 4 exchanges."""
    import datetime as dt

    from hawk_pack_spark.operators.analytics import seasonal_decompose

    d0 = dt.date(2024, 1, 1)
    df = spark.createDataFrame(
        [("k", d0 + dt.timedelta(days=i), i * 10) for i in range(14)],
        "g string, day date, v long",
    )
    plan = _plan(seasonal_decompose(df, ["g"], "day", "v"))
    n = plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
    assert n <= 4, f"{n} exchanges\n{plan[:2000]}"
