"""exact kNN (LinearDb analog) + derived codes

Auto-split from the former single-file queries/catalog.py (round 11,
VERDICT r10 #7) — specs are re-exported through
hawk_pack_spark.queries.catalog; see that module's header for the
cross-engine float-discipline rules every spec follows.
"""

from __future__ import annotations

from hawk_pack_spark.queries._shared import *  # noqa: F401,F403
from hawk_pack_spark.queries._shared import _avg_exact, _charge, _dec_sum, _disc_price



# ---------------------------------------------------------------------------
# vector: exact kNN (LinearDb port) + derived codes


def _embeddings_vectors(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    return emb.select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))


def q_knn_exact_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _embeddings_vectors(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = knn_exact(emb, queries, k=10, metric="l2_sq")
    return out.select(
        "query_id", "vec_id", F.round(F.col("dist"), 6).alias("dist"), "rank"
    )


KNN_L2_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
d AS (
  SELECT query_id, vec_id,
    list_sum(list_transform(range(1, 65), i -> (qv[i] - v[i]) * (qv[i] - v[i]))) AS dist
  FROM q, e
), r AS (
  SELECT query_id, vec_id, dist,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS rank
  FROM d)
SELECT query_id, vec_id, ROUND(dist, 6) AS dist, rank FROM r WHERE rank <= 10
"""


def q_knn_exact_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _embeddings_vectors(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    pairs = emb.crossJoin(F.broadcast(queries))
    scored = pairs.select(
        "query_id",
        "vec_id",
        D.cosine_sim(F.col("query_vec"), F.col("embedding")).alias("sim"),
    )
    top = topk_rows(scored, ["query_id"], "sim", 10, ascending=False, tie_cols=["vec_id"])
    return top.select("query_id", "vec_id", F.round(F.col("sim"), 6).alias("sim"), "rank")


KNN_COS_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
d AS (
  SELECT query_id, vec_id,
    list_sum(list_transform(range(1, 65), i -> qv[i] * v[i]))
      / (sqrt(list_sum(list_transform(qv, x -> x * x)))
         * sqrt(list_sum(list_transform(v, x -> x * x)))) AS sim
  FROM q, e
), r AS (
  SELECT query_id, vec_id, sim,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank
  FROM d)
SELECT query_id, vec_id, ROUND(sim, 6) AS sim, rank FROM r WHERE rank <= 10
"""


def q_knn_exact_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum-inner-product search (MIPS) — the fourth metric flavor
    (ranking by raw dot product, no normalization)."""
    emb = _embeddings_vectors(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    pairs = emb.crossJoin(F.broadcast(queries))
    scored = pairs.select(
        "query_id", "vec_id",
        D.dot(F.col("query_vec"), F.col("embedding")).alias("ip"),
    )
    top = topk_rows(scored, ["query_id"], "ip", 10, ascending=False, tie_cols=["vec_id"])
    return top.select("query_id", "vec_id", F.round(F.col("ip"), 6).alias("ip"), "rank")


KNN_DOT_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
d AS (
  SELECT query_id, vec_id,
    list_sum(list_transform(range(1, 65), i -> qv[i] * v[i])) AS ip
  FROM q, e
), r AS (
  SELECT query_id, vec_id, ip,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ip DESC, vec_id ASC) AS rank
  FROM d)
SELECT query_id, vec_id, ROUND(ip, 6) AS ip, rank FROM r WHERE rank <= 10
"""


def q_range_search_l2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius query — the set-valued relational form of ``is_match``
    (reference src/traits.rs:46-49 tests one pair; this returns every
    stored vector within the threshold, per query). Served through the
    IVF cell-pruned path (`range_search_ivf`): the triangle-inequality
    prune is LOSSLESS, so the row is data-level against the brute-force
    oracle — the clustering seed cannot change the answer, only the
    bytes probed."""
    from hawk_pack_spark.operators.similarity import (
        ivf_build, ivf_cell_stats, range_search_ivf,
    )

    emb = _embeddings_vectors(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    assigned, centers = ivf_build(emb, n_clusters=8)
    # two consumers (radius stats aggregate + the pruned search) would
    # each re-run the k-means assignment UDF otherwise
    assigned = assigned.localCheckpoint()
    radii = ivf_cell_stats(assigned, centers)
    out = range_search_ivf(assigned, centers, radii, queries, radius=1.3)
    return out.select(
        "query_id", "vec_id", F.round(F.col("dist"), 6).alias("dist")
    )


RANGE_SEARCH_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
d AS (
  SELECT query_id, vec_id,
    list_sum(list_transform(range(1, 65), i -> (qv[i] - v[i]) * (qv[i] - v[i]))) AS dist
  FROM q, e)
SELECT query_id, vec_id, ROUND(dist, 6) AS dist FROM d WHERE dist <= 1.3
"""


def q_filtered_knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-filtered vector search: top-5 per query among vectors
    whose ``label`` = 3 — the predicate + top-k serving surface
    (superset; the reference has no filtered search). The selective
    predicate routes to the pre-filter exact path, so the row is
    data-level; the index post-filter path is pytest-gated
    (test_filtered_knn_index_postfilter_recall)."""
    from hawk_pack_spark.operators.knn_exact import filtered_knn

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"), "label"
    )
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = filtered_knn(emb, queries, k=5, predicate=F.col("label") == 3)
    return out.select(
        "query_id", "vec_id", F.round(F.col("dist"), 6).alias("dist"), "rank"
    )


FILTERED_KNN_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
d AS (
  SELECT query_id, e.vec_id,
    list_sum(list_transform(range(1, 65), i -> (qv[i] - v[i]) * (qv[i] - v[i]))) AS dist
  FROM q, e WHERE e.label = 3
), r AS (
  SELECT query_id, vec_id, dist,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS rank
  FROM d)
SELECT query_id, vec_id, ROUND(dist, 6) AS dist, rank FROM r WHERE rank <= 5
"""


def q_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profiling (count / nulls / exact distinct /
    min / max / mean per column) over four lineitem columns — the
    stats-collection operator of a training-data pipeline, folded into
    ONE aggregate job (test_profile_is_one_job pins the single scan).
    Doubles stay out of the parity row (their mean is summation-order-
    nondeterministic — catalog header discipline); integer means are an
    exact integer sum / count, bit-reproducible in both engines."""
    from hawk_pack_spark.operators.profile import profile_table

    li = load_table(spark, "lineitem", sf_dir)
    out = profile_table(
        li,
        ["l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate"],
        exact_distinct=True,
    )
    return out.select(
        F.col("column").alias("col_name"), "n", "n_null", "n_distinct",
        "min_val", "max_val", "mean_val",
    )


PROFILE_SQL = """
SELECT 'l_orderkey' AS col_name, COUNT(*) AS n,
  COUNT(*) - COUNT(l_orderkey) AS n_null,
  COUNT(DISTINCT l_orderkey) AS n_distinct,
  CAST(MIN(l_orderkey) AS VARCHAR) AS min_val,
  CAST(MAX(l_orderkey) AS VARCHAR) AS max_val,
  ROUND(AVG(l_orderkey), 6) AS mean_val
FROM lineitem
UNION ALL
SELECT 'l_linenumber', COUNT(*), COUNT(*) - COUNT(l_linenumber),
  COUNT(DISTINCT l_linenumber), CAST(MIN(l_linenumber) AS VARCHAR),
  CAST(MAX(l_linenumber) AS VARCHAR), ROUND(AVG(l_linenumber), 6)
FROM lineitem
UNION ALL
SELECT 'l_returnflag', COUNT(*), COUNT(*) - COUNT(l_returnflag),
  COUNT(DISTINCT l_returnflag), CAST(MIN(l_returnflag) AS VARCHAR),
  CAST(MAX(l_returnflag) AS VARCHAR), CAST(NULL AS DOUBLE)
FROM lineitem
UNION ALL
SELECT 'l_shipdate', COUNT(*), COUNT(*) - COUNT(l_shipdate),
  COUNT(DISTINCT l_shipdate),
  strftime(MIN(l_shipdate), '%Y-%m-%d %H:%M:%S'),
  strftime(MAX(l_shipdate), '%Y-%m-%d %H:%M:%S'),
  CAST(NULL AS DOUBLE)
FROM lineitem
"""


def q_hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 lexical arm + hash-embedding cosine
    semantic arm, fused by reciprocal-rank fusion (1/(60+rank), Cormack
    et al. 2009). Both arms reuse this catalog's proven oracle
    renderings (BM25_SQL, HASH_EMB_SQL); the fused score is a sum of at
    most two doubles (commutative → bit-reproducible), ranked on
    round-9 score with doc_id ties."""
    from hawk_pack_spark.operators.bm25 import bm25_build, bm25_search
    from hawk_pack_spark.operators.retrieval import rrf_fuse
    from hawk_pack_spark.operators.similarity import hash_embeddings

    docs = load_table(spark, "documents", sf_dir)
    qterms = spark.createDataFrame(
        [(0, ["scan", "merge"]), (1, ["window", "join"])],
        "query_id long, terms array<string>",
    )
    lex = bm25_search(bm25_build(docs), qterms, k=10, score_round=6).select(
        "query_id", "doc_id", "rank"
    )
    qtexts = spark.createDataFrame(
        [(0, "scan merge"), (1, "window join")], "query_id long, text string"
    )
    dvec = hash_embeddings(docs, "doc_id", "text", dim=32)
    qvec = hash_embeddings(qtexts, "query_id", "text", dim=32).select(
        "query_id", F.col("embedding").alias("qv")
    )
    pairs = dvec.crossJoin(F.broadcast(qvec))
    sim = F.round(D.cosine_sim(F.col("qv"), F.col("embedding")), 6)
    sem = topk_rows(
        pairs.select("query_id", "doc_id", sim.alias("sim")),
        ["query_id"], "sim", 10, ascending=False, tie_cols=["doc_id"],
    ).select("query_id", "doc_id", "rank")
    return rrf_fuse([lex, sem], k=10)


HYBRID_RRF_SQL = """
WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS ts
  FROM documents),
ex AS (SELECT doc_id, unnest(ts) AS term FROM toks),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM ex GROUP BY doc_id, term),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM ex GROUP BY doc_id),
corpus AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
dfs AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
q AS (
  SELECT 0 AS query_id, unnest(['scan', 'merge']) AS term
  UNION ALL
  SELECT 1 AS query_id, unnest(['window', 'join']) AS term),
s AS (
  SELECT q.query_id, tf.doc_id,
    ln(1 + (n_docs - df + 0.5) / (df + 0.5))
      * (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS s
  FROM q
  JOIN tf USING (term)
  JOIN dfs USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id, corpus),
sc AS (SELECT query_id, doc_id, ROUND(SUM(s), 6) AS score
       FROM s GROUP BY query_id, doc_id),
lexr AS (SELECT query_id, doc_id, ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
         FROM sc),
v AS (
  SELECT doc_id,
    list_transform(range(0, 32), i -> CAST(len(list_filter(ts,
      t -> CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % 32 = i)) AS DOUBLE)) AS v
  FROM toks),
qt AS (
  SELECT 0 AS query_id, ['scan', 'merge'] AS ts
  UNION ALL
  SELECT 1 AS query_id, ['window', 'join'] AS ts),
qv AS (
  SELECT query_id,
    list_transform(range(0, 32), i -> CAST(len(list_filter(ts,
      t -> CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % 32 = i)) AS DOUBLE)) AS qv
  FROM qt),
d AS (
  SELECT query_id, v.doc_id,
    ROUND(list_sum(list_transform(range(1, 33), i -> qv[i] * v.v[i]))
      / (sqrt(list_sum(list_transform(qv, x -> x * x)))
         * sqrt(list_sum(list_transform(v.v, x -> x * x)))), 6) AS sim
  FROM qv, v),
semr AS (SELECT query_id, doc_id, ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY sim DESC, doc_id ASC) AS rank
         FROM d),
u AS (
  SELECT query_id, doc_id, rank FROM lexr WHERE rank <= 10
  UNION ALL
  SELECT query_id, doc_id, rank FROM semr WHERE rank <= 10),
f AS (SELECT query_id, doc_id, ROUND(SUM(1.0 / (60 + rank)), 9) AS rrf
      FROM u GROUP BY query_id, doc_id),
fr AS (SELECT query_id, doc_id, rrf, CAST(ROW_NUMBER() OVER (
         PARTITION BY query_id ORDER BY rrf DESC, doc_id ASC) AS INT) AS rank
       FROM f)
SELECT query_id, doc_id, rrf, rank FROM fr WHERE rank <= 10
"""


def q_doc_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (sort-based, linear interpolation) of document
    length per language — the distribution-shape row the window's KLL
    sketch (engine-specific, error-bound-tested) cannot hash-check.
    Spark `percentile` and DuckDB `quantile_cont` share the (n−1)·p
    interpolation definition; on integer inputs the interpolated value
    is one double op — bit-reproducible (verified before wiring)."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.round(F.expr(f"percentile(n_chars, {p})"), 6).alias(f"p{int(p * 100)}")
            for p in (0.25, 0.50, 0.75, 0.95)
        ],
    )


DOC_QUANTILES_SQL = """
SELECT lang, COUNT(*) AS n,
  ROUND(quantile_cont(n_chars, 0.25), 6) AS p25,
  ROUND(quantile_cont(n_chars, 0.50), 6) AS p50,
  ROUND(quantile_cont(n_chars, 0.75), 6) AS p75,
  ROUND(quantile_cont(n_chars, 0.95), 6) AS p95
FROM documents GROUP BY lang
"""


def q_table_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (CDC change detection): orders vs a derived
    next-day snapshot — every 97th key dropped (removed), every 101st
    status flipped (changed), every 103rd re-inserted under a shifted
    key (added). The operator joins (key, xxhash64) rows — payload
    never crosses the shuffle; the oracle classifies with column-wise
    IS DISTINCT FROM, so parity also proves the hash classification
    matches exact comparison on this data."""
    from hawk_pack_spark.operators.diff import table_diff

    orders = load_table(spark, "orders", sf_dir)
    changed = F.when(
        F.col("o_orderkey") % 101 == 1, F.lit("X")
    ).otherwise(F.col("o_orderstatus"))
    kept = orders.where(F.col("o_orderkey") % 97 != 0).withColumn(
        "o_orderstatus", changed
    )
    added = orders.where(F.col("o_orderkey") % 103 == 2).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000_000)
    )
    new = kept.unionByName(added)
    return table_diff(orders, new, ["o_orderkey"])


TABLE_DIFF_SQL = """
WITH newsnap AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 101 = 1 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000000, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 103 = 2
), j AS (
  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
    CASE WHEN o.o_orderkey IS NULL THEN 'added'
         WHEN n.o_orderkey IS NULL THEN 'removed'
         WHEN (o.o_custkey IS DISTINCT FROM n.o_custkey)
           OR (o.o_orderstatus IS DISTINCT FROM n.o_orderstatus)
           OR (o.o_totalprice IS DISTINCT FROM n.o_totalprice)
           OR (o.o_orderdate IS DISTINCT FROM n.o_orderdate)
           OR (o.o_orderpriority IS DISTINCT FROM n.o_orderpriority)
         THEN 'changed' END AS change
  FROM orders o FULL OUTER JOIN newsnap n ON o.o_orderkey = n.o_orderkey)
SELECT o_orderkey, change FROM j WHERE change IS NOT NULL
"""


def q_knn_exact_cosine_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k under the two similarity orderings (cosine and raw
    inner product / MIPS) in one result, tagged by a metric column —
    the union keeps both metric flavors driver-checked in one catalog
    slot (the correctness window is 50 entries)."""
    cos = q_knn_exact_cosine(spark, sf_dir).select(
        F.lit("cosine").alias("metric"), "query_id", "vec_id",
        F.col("sim").alias("score"), "rank",
    )
    dot = q_knn_exact_dot(spark, sf_dir).select(
        F.lit("dot").alias("metric"), "query_id", "vec_id",
        F.col("ip").alias("score"), "rank",
    )
    return cos.unionByName(dot)


def _knn_cos_dot_sql() -> str:
    cos = KNN_COS_SQL.strip().replace(
        "SELECT query_id, vec_id, ROUND(sim, 6) AS sim, rank FROM r WHERE rank <= 10",
        "SELECT 'cosine' AS metric, query_id, vec_id, ROUND(sim, 6) AS score, rank"
        " FROM r WHERE rank <= 10",
    )
    dot = KNN_DOT_SQL.strip().replace(
        "SELECT query_id, vec_id, ROUND(ip, 6) AS ip, rank FROM r WHERE rank <= 10",
        "SELECT 'dot' AS metric, query_id, vec_id, ROUND(ip, 6) AS score, rank"
        " FROM r WHERE rank <= 10",
    )
    return f"SELECT * FROM ({cos}) UNION ALL SELECT * FROM ({dot})"


def q_sql_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-API surface: same engine, expressed as spark.sql over
    registered views (Catalyst path identical to the DataFrame API)."""
    from hawk_pack_spark.sources import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT n_name,
          COUNT(DISTINCT c_custkey) AS n_customers,
          COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE o_orderstatus <> 'F'
        GROUP BY n_name
        """
    )


SQL_NATION_SQL = """
SELECT n_name,
  COUNT(DISTINCT c_custkey) AS n_customers,
  COUNT(*) AS n_orders,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderstatus <> 'F'
GROUP BY n_name
"""


def q_simhash_hamming_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming kNN over sign-bit codes — the reference's canonical metric
    (popcount(a XOR b), lazy_memory_store.rs:49-54) applied to codes
    derived from the embedding fixtures."""
    emb = _embeddings_vectors(spark, sf_dir)
    coded = emb.select("vec_id", D.simhash_code("embedding").alias("code"))
    queries = coded.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("code").alias("query_code")
    )
    pairs = coded.crossJoin(F.broadcast(queries))
    scored = pairs.select(
        "query_id",
        "vec_id",
        D.hamming(F.col("query_code"), F.col("code")).cast("int").alias("dist"),
    )
    return topk_rows(scored, ["query_id"], "dist", 5, ascending=True, tie_cols=["vec_id"])


SIMHASH_KNN_SQL = """
WITH c AS (
  SELECT vec_id,
    CAST(list_sum(list_transform(range(0, 63),
      i -> CASE WHEN embedding[i + 1] > 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT) AS code
  FROM embeddings
), q AS (SELECT vec_id AS query_id, code AS qcode FROM c WHERE vec_id < 10),
d AS (
  SELECT query_id, vec_id, CAST(bit_count(xor(qcode, code)) AS INTEGER) AS dist
  FROM q, c
), r AS (
  SELECT query_id, vec_id, dist,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS rank
  FROM d)
SELECT query_id, vec_id, dist, rank FROM r WHERE rank <= 5
"""


def q_hamming_scan_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vectorized LinearDb scan — `hamming_topk_numpy`, the tiled
    XOR + 16-bit-LUT popcount kernel that holds at 100M codes
    (reference linear_db.rs: exact eval_distance over every stored iris
    code) — must return EXACTLY the brute-force SQL answer, boundary
    ties and all. Same codes and queries as simhash_hamming_knn, but
    through the numpy scan path instead of the expression path, so the
    two driver rows pin both implementations of the same contract."""
    from hawk_pack_spark.operators.similarity import hamming_topk_numpy

    emb = _embeddings_vectors(spark, sf_dir)
    coded = emb.select("vec_id", D.simhash_code("embedding").alias("code"))
    queries = coded.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("code").alias("query_vec")
    )
    out = hamming_topk_numpy(coded, queries, k=5)
    return out.select(
        "query_id", "vec_id", F.col("dist").cast("int").alias("dist"), "rank"
    )


# the scan path answers the identical question the expression path does —
# one oracle text, two engine paths
HAMMING_SCAN_SQL = SIMHASH_KNN_SQL


def _l1_expr(a, b):
    """Manhattan distance as a JVM-side fold — the catalog's USER-metric
    exhibit for `register_metric` (never pre-registered in METRICS)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(
            a.cast("array<double>"), b.cast("array<double>"),
            lambda x, y: F.abs(x - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def q_custom_metric_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`register_metric` — the VectorStore trait as the engine's UDF
    surface (reference src/traits.rs:34-52: a store supplies
    eval_distance; is_match and less_than follow for free) — driven
    end-to-end with a metric the engine does NOT ship: L1, registered
    as a codegen-able expression and pulled through the standard
    `distance_expr` plumbing by exact kNN. Data-level oracle: DuckDB
    ranks by the same L1 sums."""
    D.register_metric("l1_catalog", _l1_expr)
    emb = _embeddings_vectors(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = knn_exact(emb, queries, k=10, metric="l1_catalog")
    return out.select(
        "query_id", "vec_id", F.round(F.col("dist"), 6).alias("dist"), "rank"
    )


CUSTOM_METRIC_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 10),
d AS (
  SELECT query_id, vec_id,
    list_sum(list_transform(range(1, 65), i -> abs(qv[i] - v[i]))) AS dist
  FROM q, e
), r AS (
  SELECT query_id, vec_id, dist,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY dist ASC, vec_id ASC) AS rank
  FROM d)
SELECT query_id, vec_id, ROUND(dist, 6) AS dist, rank FROM r WHERE rank <= 10
"""


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine near-duplicate pairs (sim >= 0.3) — `is_match` thresholding
    (traits.rs:44-45) as a similarity self-join."""
    from hawk_pack_spark.operators.similarity import all_pairs_cosine_numpy

    emb = _embeddings_vectors(spark, sf_dir)
    return all_pairs_cosine_numpy(emb, threshold=0.3)


NEAR_DUP_SQL = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    ROUND(list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i]))
      / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
         * sqrt(list_sum(list_transform(b.v, x -> x * x)))), 6) AS sim
  FROM e a, e b
  WHERE a.vec_id < b.vec_id)
SELECT id_a, id_b, sim FROM p WHERE sim >= 0.3
"""


def q_vector_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, "embeddings", sf_dir)
    cnt = F.count(F.lit(1))
    nrm = F.round(D.norm("embedding"), 6)
    return (
        emb.select(
            "label",
            nrm.alias("nrm"),
            F.round(nrm * 1e6).cast("long").alias("nm"),  # exact-summable
        )
        .groupBy("label")
        .agg(
            cnt.alias("n_vecs"),
            F.round(F.sum("nm") / (cnt * F.lit(1e6)), 6).alias("avg_norm"),
            F.max("nrm").alias("max_norm"),
        )
    )


NORM_SQL = """
WITH n AS (
  SELECT label,
    ROUND(sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))), 6) AS nrm
  FROM embeddings)
SELECT label, COUNT(*) AS n_vecs,
  ROUND(CAST(SUM(CAST(ROUND(nrm * 1000000) AS BIGINT)) AS BIGINT)
    / (COUNT(*) * 1000000.0), 6) AS avg_norm,
  MAX(nrm) AS max_norm
FROM n GROUP BY label
"""
