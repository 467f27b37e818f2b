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

from pyspark.sql import DataFrame, Window
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


def pmi_pairs(
    docs: DataFrame,
    min_pairs: int = 5,
    max_terms_per_doc: int = 128,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k token pairs by pointwise mutual information over
    document-level co-occurrence: pmi(a,b) = ln(n_ab · N / (n_a · n_b))
    with counts at doc granularity — the collocation/phrase-mining
    primitive ("new york" scores high, "the of" scores ~0) behind
    vocabulary curation and phrase-aware tokenization. Returns
    (term_a, term_b, n_ab, n_a, n_b, pmi, rank), term_a < term_b.

    Scale shape: distinct (doc, term) postings [one shuffle]; a
    per-doc term CAP (``max_terms_per_doc``, kept by in-doc frequency
    desc / term asc — deterministic and identically expressible in the
    oracle) bounds the pair fan-out at cap²/2 per doc, which is what
    keeps the self-equi-join ON DOC linear in the corpus instead of
    quadratic in document length; pair counts and term doc-frequencies
    are partial-aggregated groupBys; N is a 1-row aggregate crossJoined
    in. The global top-k is a TakeOrdered (no full sort). Same
    candidate-bounding doctrine as minhash banding and the knn_join
    cell cap: the cap is the documented price of linearity, and rare
    high-PMI pairs below ``min_pairs`` are noise by construction
    (PMI's known low-count pathology).
    """
    toks = docs.select(
        F.col(id_col).alias("_d"), F.explode(tokens(text_col)).alias("term")
    )
    tf = toks.groupBy("_d", "term").agg(F.count(F.lit(1)).alias("_tf"))
    from pyspark.sql import Window

    w = Window.partitionBy("_d").orderBy(
        F.col("_tf").desc(), F.col("term").asc()
    )
    capped = (
        tf.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_terms_per_doc)
        .select("_d", "term")
    )
    n_docs = docs.select(F.col(id_col)).distinct().agg(
        F.count(F.lit(1)).alias("_n_docs")
    )
    df_t = capped.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    a = capped.select("_d", F.col("term").alias("term_a"))
    b = capped.select("_d", F.col("term").alias("term_b"))
    pairs = (
        a.join(b, "_d")
        .where(F.col("term_a") < F.col("term_b"))
        .groupBy("term_a", "term_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_pairs)
    )
    da = df_t.select(F.col("term").alias("term_a"), F.col("_df").alias("n_a"))
    db = df_t.select(F.col("term").alias("term_b"), F.col("_df").alias("n_b"))
    pmi = F.round(
        F.log(
            F.col("n_ab").cast("double")
            * F.col("_n_docs")
            / (F.col("n_a").cast("double") * F.col("n_b"))
        ),
        6,
    )
    scored = (
        pairs.join(da, "term_a")
        .join(db, "term_b")
        .crossJoin(F.broadcast(n_docs))
        .select("term_a", "term_b", "n_ab", "n_a", "n_b", pmi.alias("pmi"))
    )
    ranked = scored.orderBy(
        F.col("pmi").desc(), F.col("term_a").asc(), F.col("term_b").asc()
    ).limit(k)
    from pyspark.sql import Window as _W

    return ranked.withColumn(
        "rank",
        F.row_number().over(
            _W.orderBy(
                F.col("pmi").desc(), F.col("term_a").asc(), F.col("term_b").asc()
            )
        ),
    )


def ctfidf_terms(
    docs: DataFrame,
    class_col: str = "source",
    text_col: str = "text",
    top_k: int = 3,
) -> DataFrame:
    """Class-based TF-IDF keyword extraction (the BERTopic c-TF-IDF
    idea, Grootendorst 2022): treat each class (source/domain/topic)
    as ONE concatenated pseudo-document — score(t, c) = tf(t in c) ·
    ln(n_classes / df_classes(t)) — and keep each class's ``top_k``
    terms. What distinguishes THIS domain from the others, the
    domain-labeling diagnostic a corpus mix review starts from.

    Shape: one (class, term) count reduction, one term-keyed
    class-frequency reduction joined back (both map-side combinable),
    one per-class window top-k (WindowGroupLimit). Score is exact-int
    tf × one ln, rounded 6 dp; ties by term so the top-k is
    deterministic.
    """
    from hawk_pack_spark.functions.text import tokens

    toks = docs.select(
        F.col(class_col).alias("class"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("class", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    # driver-action-free scalar: the class count rides a broadcast
    # 1-row crossJoin instead of a .count() job
    nclasses = docs.agg(
        F.countDistinct(F.col(class_col)).cast("double").alias("_nc")
    )
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df_classes")
    )
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(nclasses))
        .select(
            "class",
            "term",
            "tf",
            "df_classes",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.col("_nc") / F.col("df_classes").cast("double")),
                6,
            ).alias("ctfidf"),
        )
    )
    w = Window.partitionBy("class").orderBy(
        F.col("ctfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("class", "rank", "term", "tf", "df_classes", "ctfidf")
    )


def vocab_overlap(
    docs: DataFrame,
    class_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Pairwise vocabulary overlap between classes (sources/domains):
    |Va ∩ Vb|, |Va ∪ Vb|, and token-set Jaccard for every unordered
    class pair — the corpus-mix diagnostic (two sources with Jaccard
    ~1 are the same distribution wearing different labels; near 0,
    disjoint registers). One (class, token) DISTINCT reduction, one
    token-keyed self-join for intersections (postings-shaped, fan-out
    per token = classes holding it), one class-size join; exact
    integer counts, ONE final division.
    """
    from hawk_pack_spark.functions.text import tokens

    v = (
        docs.select(
            F.col(class_col).alias("_c"),
            F.explode(tokens(F.col(text_col))).alias("_t"),
        )
        .distinct()
    )
    sizes = v.groupBy("_c").agg(F.count(F.lit(1)).cast("bigint").alias("_sz"))
    a = v.select(F.col("_c").alias("class_a"), "_t")
    b = v.select(F.col("_c").alias("class_b"), "_t")
    inter = (
        a.join(b, "_t")
        .where(F.col("class_a") < F.col("class_b"))
        .groupBy("class_a", "class_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_common"))
    )
    out = (
        inter.join(
            sizes.select(F.col("_c").alias("class_a"), F.col("_sz").alias("_sa")),
            "class_a",
        )
        .join(
            sizes.select(F.col("_c").alias("class_b"), F.col("_sz").alias("_sb")),
            "class_b",
        )
    )
    union = F.col("_sa") + F.col("_sb") - F.col("n_common")
    return out.select(
        "class_a",
        "class_b",
        "n_common",
        union.cast("bigint").alias("n_union"),
        F.round(
            F.col("n_common").cast("double") / union.cast("double"), 6
        ).alias("jaccard"),
    )


def js_divergence(
    docs: DataFrame,
    class_col: str = "source",
    text_col: str = "text",
    vocab_size: int = 2000,
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence (nats) between the unigram
    distributions of every class pair — the symmetric, bounded
    ([0, ln 2]) domain-shift measure a mixing pipeline tracks where
    vocab_overlap's set Jaccard ignores frequency and KL blows up on
    disjoint support. JS(P,Q) = ½KL(P‖M) + ½KL(Q‖M), M = (P+Q)/2.

    Scale contract: the distribution support is cut to the corpus'
    top-``vocab_size`` tokens (TakeOrderedAndProject — the oov_rate
    discipline, never a one-partition sort); all remaining mass per
    class collapses into ONE residual bucket (token '' — unreachable
    by real tokens since tokenize drops empties), so per-pair state is
    ≤ vocab_size+1 entries regardless of corpus size, and the measure
    stays a true JS over a (vocab_size+1)-category distribution.
    Per-pair divergence folds over the token-SORTED (term, n1, n2)
    list in fixed operand order (p = n1/t1, q = n2/t2, m = (p+q)/2,
    acc + p·ln(p/m) + q·ln(q/m)) — deterministic IEEE float sums, the
    repo's no-shuffle-order-float-sums rule. Class pairs are
    class-count-bounded; the spine (pairs × vocab) is broadcast-sized.
    """
    from hawk_pack_spark.functions.text import tokens

    tok = docs.select(
        F.col(class_col).alias("_c"),
        F.explode(tokens(F.col(text_col))).alias("_t"),
    )
    vocab = (
        tok.groupBy("_t")
        .agg(F.count(F.lit(1)).alias("_n"))
        .orderBy(F.col("_n").desc(), F.col("_t").asc())
        .limit(vocab_size)
        .select("_t")
    )
    bucketed = (
        tok.join(
            F.broadcast(vocab.withColumn("_in", F.lit(1))), "_t", "left"
        )
        .select(
            "_c",
            F.when(F.col("_in").isNotNull(), F.col("_t"))
            .otherwise(F.lit(""))
            .alias("_t"),
        )
        .groupBy("_c", "_t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_n"))
    )
    totals = bucketed.groupBy("_c").agg(
        F.sum("_n").cast("bigint").alias("_tot")
    )
    classes = totals.select("_c")
    pairs = (
        classes.select(F.col("_c").alias("class_a"))
        .crossJoin(classes.select(F.col("_c").alias("class_b")))
        .where(F.col("class_a") < F.col("class_b"))
    )
    support = bucketed.select("_t").distinct()
    spine = pairs.crossJoin(F.broadcast(support))
    j = (
        spine.join(
            bucketed.select(
                F.col("_c").alias("class_a"), "_t", F.col("_n").alias("_n1")
            ),
            ["class_a", "_t"],
            "left",
        )
        .join(
            bucketed.select(
                F.col("_c").alias("class_b"), "_t", F.col("_n").alias("_n2")
            ),
            ["class_b", "_t"],
            "left",
        )
        .select(
            "class_a",
            "class_b",
            "_t",
            F.coalesce("_n1", F.lit(0)).cast("bigint").alias("_n1"),
            F.coalesce("_n2", F.lit(0)).cast("bigint").alias("_n2"),
        )
    )
    lst = j.groupBy("class_a", "class_b").agg(
        F.array_sort(
            F.collect_list(F.struct("_t", "_n1", "_n2"))
        ).alias("_l")
    )
    out = (
        lst.join(
            totals.select(F.col("_c").alias("class_a"),
                          F.col("_tot").alias("_t1")),
            "class_a",
        )
        .join(
            totals.select(F.col("_c").alias("class_b"),
                          F.col("_tot").alias("_t2")),
            "class_b",
        )
    )

    def _term(x):
        p = x["_n1"].cast("double") / F.col("_t1").cast("double")
        q = x["_n2"].cast("double") / F.col("_t2").cast("double")
        m = (p + q) / F.lit(2.0)
        pt = F.when(x["_n1"] > 0, p * F.log(p / m)).otherwise(F.lit(0.0))
        qt = F.when(x["_n2"] > 0, q * F.log(q / m)).otherwise(F.lit(0.0))
        return pt + qt

    js = F.aggregate(
        F.col("_l"), F.lit(0.0), lambda acc, x: acc + _term(x)
    )
    return out.select(
        "class_a",
        "class_b",
        F.size("_l").alias("n_terms"),
        F.round(F.lit(0.5) * js, 6).alias("js_divergence"),
    )
