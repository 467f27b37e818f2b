"""BM25 full-text ranking as pure dataflow — the retrieval side of the
text-analysis surface (tokenize → postings → idf → score → top-k).

Okapi BM25 with the Lucene idf variant:

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(q, d) = Σ_{t ∈ q} idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

Everything is built-ins: one explode + two groupBys build the postings
and stats; scoring is a broadcast join of the (small) query-term side
against the postings equi-joined on term, then a per-(query, doc) sum
and a Window top-k. At 100 TB the postings table is the classic
term-partitioned inverted index: the score join shuffles only postings
of query terms (predicate pushdown on the broadcast join key), never
the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hawk_pack_spark.functions.text import tokens
from hawk_pack_spark.operators.topk import topk_rows


def bm25_build(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> dict[str, DataFrame]:
    """Build the BM25 index tables from a document table.

    Returns {"postings": (term, doc_id, tf, dl), "terms": (term, df),
    "corpus": 1-row (n_docs, avgdl)} — three small, mergeable relations
    (the streaming analog unions postings and re-aggregates terms)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    postings = tf.join(dl, "doc_id")
    terms = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    return {"postings": postings, "terms": terms, "corpus": corpus}


def bm25_search(
    index: dict[str, DataFrame],
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    query_id: str = "query_id",
    terms_col: str = "terms",
    score_round: int | None = None,
) -> DataFrame:
    """Batch BM25 top-k: ``queries`` is (query_id, terms ARRAY<STRING>).
    Returns (query_id, doc_id, score, rank), score descending.

    Repeated query terms weight tf-style (each occurrence adds one
    score term), matching the standard bag-of-words query model.

    ``score_round``: round the score to this many decimals BEFORE
    ranking (tie-broken by doc_id). Cross-engine parity checks must
    rank on the same quantity they compare — ranking on the unrounded
    score while the oracle ranks on the rounded one lets two docs whose
    scores differ by < the rounding quantum swap ranks."""
    q = queries.select(
        F.col(query_id).alias("query_id"), F.explode(terms_col).alias("term")
    )
    scored = (
        F.broadcast(q)
        .join(index["postings"], "term")
        .join(F.broadcast(index["terms"]), "term")
        .crossJoin(F.broadcast(index["corpus"]))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "s",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("s").alias("score"))
    )
    if score_round is not None:
        scored = scored.withColumn("score", F.round("score", score_round))
    return topk_rows(
        scored, ["query_id"], "score", k, ascending=False, tie_cols=["doc_id"]
    )


def bm25_query_text(
    index: dict[str, DataFrame],
    spark,
    text: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Single free-text query convenience wrapper."""
    q = spark.createDataFrame([(0, text)], "query_id long, qtext string").select(
        "query_id", tokens("qtext").alias("terms")
    )
    return bm25_search(index, q, k=k, k1=k1, b=b)


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keyword extraction: each document's top-k terms by TF-IDF
    (tf · ln(N/df), the classic smooth-free form — deterministic, no
    tuning constants), ties by term. Returns (doc_id, term, tf, score,
    rank) — the "what is this document about" primitive behind topic
    labeling and index-time boosting.

    Shape: one explode + one (doc, term) count + one term-level df
    groupBy; the df table joins back BY TERM (corpus-sized postings
    equi-join, never a broadcast of anything corpus-sized), then a
    per-doc window top-k. ln is the same double op in both engines;
    the score is one multiply of exact-integer-derived doubles,
    rounded at the output (catalog float discipline).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.select(F.col(id_col)).distinct().count()
    scored = tf.join(df_tbl, "term").select(
        "doc_id",
        "term",
        "tf",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("score"),
    )
    return topk_rows(
        scored, ["doc_id"], "score", k, ascending=False, tie_cols=["term"]
    )
