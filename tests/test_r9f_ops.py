"""Round-9 batch 5: duplicated n-gram spans, phrase search,
Kaplan-Meier survival — closed-form checks."""

from __future__ import annotations


def test_dup_ngram_spans_hand_corpus(spark):
    from hawk_pack_spark.operators.dedup import dup_ngram_spans

    shared = "a b c d"  # the duplicated 4-gram
    docs = spark.createDataFrame(
        [
            (1, f"{shared} x y z w"),       # dup span covers tokens 1-4 of 8
            (2, f"p q r s {shared}"),       # dup span covers tokens 5-8 of 8
            (3, "m n o e f g h t"),         # nothing shared with 1 or 2
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dup_ngram_spans(docs, n=4, min_docs=2).collect()}
    assert out[1].n_tokens == 8 and out[1].n_grams == 5
    assert out[1].n_dup_grams == 1 and out[1].dup_tokens == 4
    assert out[1].dup_fraction == 0.5
    assert out[2].dup_tokens == 4 and out[2].dup_fraction == 0.5
    assert out[3].n_dup_grams == 0 and out[3].dup_tokens == 0
    assert out[3].dup_fraction == 0.0


def test_dup_ngram_spans_overlap_union_not_double_counted(spark):
    from hawk_pack_spark.operators.dedup import dup_ngram_spans

    # two docs share a 5-token run -> two overlapping 4-grams each;
    # the union of [1,5) and [2,6) is 5 tokens, not 8.
    docs = spark.createDataFrame(
        [(1, "a b c d e x y z"), (2, "a b c d e q r s")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dup_ngram_spans(docs, n=4, min_docs=2).collect()}
    assert out[1].n_dup_grams == 2
    assert out[1].dup_tokens == 5
    assert out[2].dup_tokens == 5


def test_dup_ngram_within_doc_repeat_not_cross_doc(spark):
    from hawk_pack_spark.operators.dedup import dup_ngram_spans

    # the 2-gram "a b" repeats WITHIN doc 1 only -> not duplicated
    # under the distinct-docs >= 2 contract.
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "c d e f")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in dup_ngram_spans(docs, n=2, min_docs=2).collect()}
    assert out[1].dup_tokens == 0 and out[2].dup_tokens == 0


def test_phrase_search_counts_and_positions(spark):
    from hawk_pack_spark.operators.retrieval import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "fast sort is fast sort"),   # matches at 1 and 4
            (2, "sort fast"),                # wrong order
            (3, "FAST   SORT rules"),        # case/extra-space robust
            (4, "fast"),                     # too short
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in phrase_search(docs, "fast sort").collect()}
    assert set(out) == {1, 3}
    assert out[1].n_matches == 2 and out[1].first_pos == 1
    assert out[3].n_matches == 1 and out[3].first_pos == 1


def test_phrase_search_overlapping_matches(spark):
    from hawk_pack_spark.operators.retrieval import phrase_search

    docs = spark.createDataFrame([(1, "a a a")], "doc_id long, text string")
    (r,) = phrase_search(docs, "a a").collect()
    assert r.n_matches == 2 and r.first_pos == 1


def test_kaplan_meier_textbook_example(spark):
    from hawk_pack_spark.operators.analytics import kaplan_meier

    # classic toy: events at t=1 (1 of 5), t=3 (1 of 3); censored at
    # t=2 (one) and t=3 (one survives past -> censored at 3), plus one
    # more censored at 2.
    subj = spark.createDataFrame(
        [(1, True), (2, False), (2, False), (3, True), (3, False)],
        "time long, observed boolean",
    )
    out = {r.time: r for r in kaplan_meier(subj).collect()}
    assert out[1].n_at_risk == 5 and out[1].d == 1 and out[1].c == 0
    assert out[1].survival == round(4 / 5, 6)
    assert out[2].n_at_risk == 4 and out[2].d == 0 and out[2].c == 2
    assert out[2].survival == round(4 / 5, 6)  # censoring leaves S flat
    assert out[3].n_at_risk == 2 and out[3].d == 1 and out[3].c == 1
    assert out[3].survival == round(4 / 5 * 1 / 2, 6)
    assert out[3].hazard == 0.5


def test_kaplan_meier_no_censoring_is_empirical_survival(spark):
    from hawk_pack_spark.operators.analytics import kaplan_meier

    subj = spark.createDataFrame(
        [(t, True) for t in [1, 1, 2, 3]], "time long, observed boolean"
    )
    out = {r.time: r for r in kaplan_meier(subj).collect()}
    assert out[1].survival == 0.5
    assert out[2].survival == 0.25
    assert out[3].survival == 0.0
