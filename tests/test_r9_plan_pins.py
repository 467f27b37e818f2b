"""Plan-shape pins for round-9 operators: the docstrings make claims
("shuffle-free", "one groupBy") — these tests make the executed plan
keep them."""

from __future__ import annotations


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_phrase_search_plan_is_shuffle_free(spark):
    """phrase_search claims a single narrow projection over the scan —
    no Exchange may appear anywhere in its plan."""
    from hawk_pack_spark.operators.retrieval import phrase_search

    docs = spark.createDataFrame(
        [(i, "fast sort rules") for i in range(10)],
        "doc_id long, text string",
    )
    plan = _plan(phrase_search(docs, "fast sort"))
    assert "Exchange" not in plan, plan[:1500]


def test_dup_ngram_plan_exchange_budget(spark):
    """dup_ngram_spans claims two high-cardinality shuffles (gram
    groupBy + per-doc window) plus the final doc join — the plan must
    not grow extra corpus-wide exchanges behind our back. Budget: the
    distinct physical Exchange operators stay <= 6 (count-distinct
    expands to two, window sort one, joins re-use partitioning)."""
    from hawk_pack_spark.operators.dedup import dup_ngram_spans

    docs = spark.createDataFrame(
        [(i, "a b c d e f g h i j") for i in range(6)],
        "doc_id long, text string",
    )
    plan = _plan(dup_ngram_spans(docs, n=4))
    n_exchanges = plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
    assert n_exchanges <= 6, f"{n_exchanges} exchanges\n{plan[:2000]}"


def test_binary_quant_prefilter_stays_in_codegen(spark):
    """The XOR+popcount Hamming prefilter must run inside a
    WholeStageCodegen span (the whole point of packing into BIGINT
    words), not as an interpreted expression stage."""
    from hawk_pack_spark.operators.similarity import binary_quant_knn

    vecs = spark.createDataFrame(
        [(i, [float(i % 3), -1.0, 2.0, 0.5] * 16) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    qs = vecs.where("vec_id < 2").selectExpr(
        "vec_id as query_id", "embedding as query_vec"
    )
    out = binary_quant_knn(vecs, qs, k=3, dim=64)
    out.collect()  # AQE: codegen spans appear only in the FINAL plan
    plan = _plan(out)
    # AQE's final plan renders WholeStageCodegen spans as "*(n)"
    # operator prefixes; the projection computing the Hamming distance
    # (_hd) must carry one — the unrolled XOR+popcount stays compiled
    # (the zip_with HOF form ran interpreted and lost the star).
    hd_lines = [
        ln for ln in plan.splitlines() if "Project" in ln and "_hd" in ln
    ]
    assert hd_lines, plan[:2000]
    assert any("*(" in ln for ln in hd_lines), hd_lines
    # the prefilter's window group limit must be present (partial
    # top-(k*oversample) before the exchange)
    assert "WindowGroupLimit" in plan, plan[:2000]


def test_oov_vocab_cut_is_take_ordered(spark):
    """oov_rate claims the top-k vocabulary cut plans as
    TakeOrderedAndProject — a full sort of the frequency table would
    be a silent scale regression."""
    from hawk_pack_spark.functions.curation import oov_rate

    docs = spark.createDataFrame(
        [(i, "w x y z") for i in range(8)], "doc_id long, text string"
    )
    plan = _plan(oov_rate(docs, vocab_size=2))
    assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_two_phase_rank_has_no_single_partition_window(spark):
    """equal_frequency_bins' global rank must never plan a
    one-partition window: every Window operator in the plan must be
    preceded by a partitioned exchange, i.e. the plan must not contain
    Exchange SinglePartition feeding a Window."""
    from hawk_pack_spark.operators.analytics import equal_frequency_bins

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "id long, v double"
    )
    plan = _plan(equal_frequency_bins(df, "v", n_bins=5, tiebreak_col="id"))
    # the only SinglePartition exchanges allowed are for the tiny
    # offsets/total aggregations (they sit UNDER a broadcast or a
    # 1-row agg, never directly under a Window over the data stream)
    for chunk in plan.split("Window ")[1:]:
        # examine the segment following each Window operator: its
        # immediate child exchange must be hash/range, not single
        head = chunk[:400]
        assert "rangepartitioning" in head or "hashpartitioning" in head or "Sort" in head, head
