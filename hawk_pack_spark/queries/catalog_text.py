"""text analysis over documents

Auto-split from the former single-file queries/catalog.py (round 11,
VERDICT r10 #7) — specs are re-exported through
hawk_pack_spark.queries.catalog; see that module's header for the
cross-engine float-discipline rules every spec follows.
"""

from __future__ import annotations

from hawk_pack_spark.queries._shared import *  # noqa: F401,F403
from hawk_pack_spark.queries._shared import _avg_exact, _charge, _dec_sum, _disc_price



# ---------------------------------------------------------------------------
# text analysis (documents)


def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    cnt = F.count(F.lit(1))
    return (
        docs.select(
            "lang",
            T.token_count("text").alias("n_tokens"),
            T.bpe_ish_token_count("text").alias("n_bpe"),
            F.col("n_chars"),
        )
        .groupBy("lang")
        .agg(
            cnt.alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.round(F.sum("n_tokens").cast("double") / cnt, 6).alias("avg_tokens"),
            F.sum("n_bpe").alias("sum_bpe_tokens"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


Q_TOKEN_SQL = """
WITH t AS (
  SELECT lang, n_chars,
    len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '')) AS n_tokens,
    len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe
  FROM documents)
SELECT lang, COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
  ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 6) AS avg_tokens,
  CAST(SUM(n_bpe) AS BIGINT) AS sum_bpe_tokens,
  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM t GROUP BY lang
"""


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    cnt = F.count(F.lit(1))
    # sum integer micro-units, not doubles — double summation order is
    # engine-nondeterministic and flips ROUND at boundaries
    micro = F.round(T.quality_score("text") * 1e6).cast("long")
    return (
        docs.select("source", micro.alias("qm"))
        .groupBy("source")
        .agg(
            cnt.alias("n_docs"),
            F.round(F.sum("qm") / (cnt * F.lit(1e6)), 6).alias("avg_quality"),
        )
    )


_SW = "', '".join(T.STOPWORDS)
Q_QUALITY_SQL = f"""
WITH toks AS (
  SELECT source, text,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS ts
  FROM documents
), q AS (
  SELECT source,
    CAST(ROUND(ROUND((
      least(length(text) / 500.0, 1.0)
      + greatest(1.0 - 4.0 * (
          (length(regexp_replace(text, '[^[:punct:]]', '', 'g')) * 1.0 / greatest(length(text), 1))
          + (length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / greatest(length(text), 1))
        ), 0.0)
      + (1.0 - abs((len(list_filter(ts, t -> list_contains(['{_SW}'], t))) * 1.0
                    / greatest(len(ts), 1)) - 0.4))
    ) / 3.0, 6) * 1000000) AS BIGINT) AS qm
  FROM toks)
SELECT source, COUNT(*) AS n_docs,
  ROUND(CAST(SUM(qm) AS BIGINT) / (COUNT(*) * 1000000.0), 6) AS avg_quality
FROM q GROUP BY source
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select(T.lang_id("text").alias("predicted_lang"), "lang")
        .groupBy("predicted_lang", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


_LANG_STRUCTS = ", ".join(
    "{'score': len(list_filter(ts, t -> list_contains([%s], t))), 'lang': '%s'}"
    % (", ".join(f"'{m}'" for m in markers), lang)
    for lang, markers in T.LANG_MARKERS.items()
)
Q_LANG_SQL = f"""
WITH toks AS (
  SELECT lang,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS ts
  FROM documents
), pred AS (
  SELECT lang, list_aggregate([{_LANG_STRUCTS}], 'max').lang AS predicted_lang
  FROM toks)
SELECT predicted_lang, lang, COUNT(*) AS n FROM pred GROUP BY 1, 2
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both fingerprint flavors per source in one row: the order-
    insensitive token-SET fingerprint and the order-SENSITIVE rolling
    hash (a doc with permuted words keeps fp but changes rfp)."""
    docs = load_table(spark, "documents", sf_dir)
    set_fp = (
        docs.select("source", T.doc_fingerprint("text").alias("fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct(F.col("fp")).alias("n_distinct_fp"),
            F.min("fp").alias("min_fp"),
            F.max("fp").alias("max_fp"),
        )
    )
    roll_fp = (
        docs.select("source", T.rolling_hash("text").alias("rfp"))
        .groupBy("source")
        .agg(
            F.count_distinct("rfp").alias("n_distinct_rfp"),
            F.min("rfp").alias("min_rfp"),
            F.max("rfp").alias("max_rfp"),
        )
    )
    return set_fp.join(roll_fp, "source")


Q_FP_SQL = """
WITH fp AS (
  SELECT source,
    CAST(concat('0x', substr(md5(array_to_string(
      list_sort(list_distinct(list_filter(
        regexp_split_to_array(lower(text), '\\s+'), x -> x != ''))), ' ')), 1, 15)) AS BIGINT) AS fp
  FROM documents),
sfp AS (
  SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT fp) AS n_distinct_fp,
    MIN(fp) AS min_fp, MAX(fp) AS max_fp
  FROM fp GROUP BY source),
toks AS (
  SELECT source,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS ts
  FROM documents),
rfp0 AS (
  SELECT source,
    list_reduce(
      list_prepend(0::BIGINT,
        list_transform(ts, t ->
          CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % 2147483647)),
      (acc, h) -> (acc * 131 + h) % 2147483647) AS rfp
  FROM toks),
rfp AS (
  SELECT source, COUNT(DISTINCT rfp) AS n_distinct_rfp,
    MIN(rfp) AS min_rfp, MAX(rfp) AS max_rfp
  FROM rfp0 GROUP BY source)
SELECT sfp.source, n_docs, n_distinct_fp, min_fp, max_fp,
       n_distinct_rfp, min_rfp, max_rfp
FROM sfp JOIN rfp ON sfp.source = rfp.source
"""


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed training-data curation: quality-filter → token-set
    fingerprint dedup (keep lowest doc_id) → per (lang, source) counts
    and surviving token volume. The end-to-end shape of an LLM data
    pipeline, all in one declarative plan."""
    docs = load_table(spark, "documents", sf_dir)
    scored = docs.select(
        "doc_id", "lang", "source",
        T.quality_score("text").alias("q"),
        T.doc_fingerprint("text").alias("fp"),
        T.token_count("text").alias("n_tokens"),
    ).where(F.col("q") >= 0.5)
    # summing doubles is order-nondeterministic across engines; sum exact
    # integer micro-units instead (q is already rounded to 6 decimals)
    scored = scored.withColumn("q_micro", F.round(F.col("q") * 1e6).cast("long"))
    keep = scored.groupBy("fp").agg(F.min("doc_id").alias("keep_id"))
    kept = scored.join(keep, "fp").where(F.col("doc_id") == F.col("keep_id"))
    cnt = F.count(F.lit(1))
    return kept.groupBy("lang", "source").agg(
        cnt.alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.round(F.sum("q_micro") / (cnt * F.lit(1e6)), 6).alias("avg_quality"),
    )


_Q_EXPR_SQL = f"""
    ROUND((
      least(length(text) / 500.0, 1.0)
      + greatest(1.0 - 4.0 * (
          (length(regexp_replace(text, '[^[:punct:]]', '', 'g')) * 1.0 / greatest(length(text), 1))
          + (length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / greatest(length(text), 1))
        ), 0.0)
      + (1.0 - abs((len(list_filter(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != ''), t -> list_contains(['{_SW}'], t))) * 1.0
                    / greatest(len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '')), 1)) - 0.4))
    ) / 3.0, 6)
"""

CURATION_SQL = f"""
WITH scored AS (
  SELECT doc_id, lang, source,
    {_Q_EXPR_SQL} AS q,
    CAST(concat('0x', substr(md5(array_to_string(
      list_sort(list_distinct(list_filter(
        regexp_split_to_array(lower(text), '\\s+'), x -> x != ''))), ' ')), 1, 15)) AS BIGINT) AS fp,
    len(list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '')) AS n_tokens
  FROM documents),
filt AS (SELECT *, CAST(ROUND(q * 1000000) AS BIGINT) AS q_micro
         FROM scored WHERE q >= 0.5),
keep AS (SELECT fp, MIN(doc_id) AS keep_id FROM filt GROUP BY fp),
kept AS (SELECT filt.* FROM filt JOIN keep ON filt.fp = keep.fp AND filt.doc_id = keep.keep_id)
SELECT lang, source, COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
  ROUND(CAST(SUM(q_micro) AS BIGINT) / (COUNT(*) * 1000000.0), 6) AS avg_quality
FROM kept GROUP BY lang, source
"""


def q_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash fingerprints per source (vs the
    set-based doc_fingerprint)."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        docs.select("source", T.rolling_hash("text").alias("rfp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_distinct("rfp").alias("n_distinct"),
            F.min("rfp").alias("min_rfp"),
            F.max("rfp").alias("max_rfp"),
        )
    )


ROLLING_FP_SQL = """
WITH toks AS (
  SELECT source,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS ts
  FROM documents),
fp AS (
  SELECT source,
    list_reduce(
      list_prepend(0::BIGINT,
        list_transform(ts, t ->
          CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % 2147483647)),
      (acc, h) -> (acc * 131 + h) % 2147483647) AS rfp
  FROM toks)
SELECT source, COUNT(*) AS n_docs, COUNT(DISTINCT rfp) AS n_distinct,
  MIN(rfp) AS min_rfp, MAX(rfp) AS max_rfp
FROM fp GROUP BY source
"""


def q_customer_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function breadth: per-customer order sequence with running
    spend (exact decimal), 3-order moving average, and days since the
    previous order (lag)."""
    orders = load_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    last3 = w.rowsBetween(-2, 0)
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    sec = F.unix_timestamp("o_orderdate")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.sum(dec).over(run).cast("double").alias("cum_spend"),
        F.round(
            F.sum(dec).over(last3).cast("double") / F.count(F.lit(1)).over(last3), 6
        ).alias("avg_last3"),
        ((sec - F.lag(sec).over(w)) / F.lit(86400)).cast("long").alias("days_since_prev"),
    )


RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
  ROW_NUMBER() OVER w AS rn,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_spend,
  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
    / COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS avg_last3,
  CAST((CAST(floor(epoch(o_orderdate)) AS BIGINT)
    - CAST(floor(epoch(lag(o_orderdate) OVER w)) AS BIGINT)) / 86400 AS BIGINT)
    AS days_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def q_doc_hash_embedding_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → hashed bag-of-words vectors → exact cosine top-3
    neighbors per query doc: the text→vector featurization bridge into
    the similarity operators, end to end."""
    from hawk_pack_spark.operators.similarity import hash_embeddings

    docs = load_table(spark, "documents", sf_dir)
    vecs = hash_embeddings(docs, "doc_id", "text", dim=32).select(
        F.col("doc_id").alias("vec_id"), "embedding"
    )
    queries = vecs.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    pairs = vecs.crossJoin(F.broadcast(queries)).where(
        F.col("query_id") != F.col("vec_id")
    )
    sim = D.cosine_sim(F.col("query_vec"), F.col("embedding"))
    scored = pairs.select("query_id", "vec_id", F.round(sim, 6).alias("sim"))
    return topk_rows(scored, ["query_id"], "sim", 3, ascending=False, tie_cols=["vec_id"])


HASH_EMB_SQL = """
WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS ts
  FROM documents),
v AS (
  SELECT doc_id AS vec_id,
    list_transform(range(0, 32), i -> CAST(len(list_filter(ts,
      t -> CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % 32 = i)) AS DOUBLE)) AS v
  FROM toks),
q AS (SELECT vec_id AS query_id, v AS qv FROM v WHERE vec_id < 5),
d AS (
  SELECT query_id, a.vec_id,
    ROUND(list_sum(list_transform(range(1, 33), i -> qv[i] * a.v[i]))
      / (sqrt(list_sum(list_transform(qv, x -> x * x)))
         * sqrt(list_sum(list_transform(a.v, x -> x * x)))), 6) AS sim
  FROM q, v a WHERE a.vec_id <> query_id),
r AS (
  SELECT query_id, vec_id, sim,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) AS rank
  FROM d)
SELECT query_id, vec_id, sim, rank FROM r WHERE rank <= 3
"""


def q_exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text: keep lowest doc_id per md5 group
    (LinearDb::insert dedup semantics, reference linear_db.rs:17-25,
    applied to documents). Returns survivors per lang."""
    docs = load_table(spark, "documents", sf_dir)
    keyed = docs.select("lang", "doc_id", F.md5(F.lower(F.col("text"))).alias("h"))
    # one shuffle: rank within hash group instead of groupBy + join-back
    w = Window.partitionBy("h").orderBy("doc_id")
    kept = keyed.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1)
    return kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))


Q_DEDUP_SQL = """
WITH keyed AS (SELECT lang, doc_id, md5(lower(text)) AS h FROM documents),
keep AS (SELECT h, MIN(doc_id) AS keep_id FROM keyed GROUP BY h)
SELECT lang, COUNT(*) AS n_kept
FROM keyed JOIN keep ON keyed.h = keep.h AND keyed.doc_id = keep.keep_id
GROUP BY lang
"""
