"""BM25 ranking vs a from-first-principles python oracle."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hawk_pack_spark.operators.bm25 import bm25_build, bm25_query_text, bm25_search

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a quick brown dog outpaces a quick fox"),
    (2, "the lazy dog sleeps all day"),
    (3, "foxes are quick and dogs are loyal"),
    (4, "completely unrelated text about spark engines"),
]


def _py_bm25(query_terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in DOCS}
    n = len(DOCS)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    scores = {}
    for i, ts in toks.items():
        s = 0.0
        for q in query_terms:
            tf = ts.count(q)
            if tf == 0 or q not in df:
                continue
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(ts) / avgdl))
        if s > 0:
            scores[i] = s
    return scores


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return bm25_build(docs)


def test_bm25_matches_python_oracle(spark, index):
    for qtext in ("quick fox", "lazy dog", "spark", "quick quick dog"):
        expected = _py_bm25(qtext.split())
        got = {
            r.doc_id: r.score
            for r in bm25_query_text(index, spark, qtext, k=10).collect()
        }
        assert set(got) == set(expected), (qtext, got, expected)
        for d, s in expected.items():
            assert abs(got[d] - s) < 1e-9, (qtext, d, got[d], s)


def test_bm25_batch_queries_and_ranks(spark, index):
    qs = spark.createDataFrame(
        [(0, ["quick", "fox"]), (1, ["lazy", "dog"])],
        "query_id long, terms array<string>",
    )
    out = bm25_search(index, qs, k=3)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)
    # top doc sanity: "quick fox" prefers docs with both rare-ish terms
    top0 = min(by_q[0], key=lambda r: r.rank)
    assert top0.doc_id in (1, 3, 0)
    top1 = min(by_q[1], key=lambda r: r.rank)
    assert top1.doc_id == 2  # short doc with both "lazy" and "dog"


def test_bm25_index_tables_shape(index):
    assert set(index) == {"postings", "terms", "corpus"}
    c = index["corpus"].collect()[0]
    assert c.n_docs == 5 and c.avgdl > 0
    # df bounded by corpus size; tf >= 1
    assert index["terms"].where(F.col("df") > 5).isEmpty()
    assert index["postings"].where(F.col("tf") < 1).isEmpty()
