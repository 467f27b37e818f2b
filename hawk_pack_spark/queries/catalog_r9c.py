"""round-9 tail rows

Auto-split from the former single-file queries/catalog.py (round 11,
VERDICT r10 #7) — specs are re-exported through
hawk_pack_spark.queries.catalog; see that module's header for the
cross-engine float-discipline rules every spec follows.
"""

from __future__ import annotations

from hawk_pack_spark.queries._shared import *  # noqa: F401,F403
from hawk_pack_spark.queries._shared import _avg_exact, _charge, _dec_sum, _disc_price
from hawk_pack_spark.queries.catalog_vector import _embeddings_vectors  # noqa: F401



def q_label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-geometry diagnostic (linalg.label_centroid_similarity):
    pairwise cosine between per-label centroid embeddings — exact
    decimal per-(label,dim) sums, dim-sorted cosine folds, bounded
    labels² pair join. Data-level, one row per unordered label
    pair."""
    from hawk_pack_spark.operators.linalg import label_centroid_similarity

    emb = _embeddings_vectors(spark, sf_dir).join(
        load_table(spark, "embeddings", sf_dir).select("vec_id", "label"),
        "vec_id",
    )
    # bounded pair count for the driver row: 8 labels -> 28 pairs
    sub = emb.where(F.col("label") < 8)
    return label_centroid_similarity(sub, "label", "embedding")


CENTROID_SIM_SQL = """
WITH e AS (
  SELECT label, embedding::DOUBLE[] AS v FROM embeddings WHERE label < 8),
pd AS (
  SELECT label, i.d AS d,
         CAST(SUM(CAST(ROUND(v[i.d] * 1000000) AS BIGINT) ) AS BIGINT)
           AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM e, (SELECT UNNEST(range(1, 65)) AS d) i
  GROUP BY 1, 2),
m AS (
  SELECT label,
         list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) ORDER BY d) AS ml
  FROM pd GROUP BY 1),
p AS (
  SELECT a.label AS label_a, b.label AS label_b, a.ml AS ma, b.ml AS mb
  FROM m a JOIN m b ON a.label < b.label)
SELECT label_a, label_b,
  ROUND(
    list_reduce(list_prepend(0.0,
      list_transform(range(1, 65), i -> ma[i] * mb[i])), (x, y) -> x + y)
    / (SQRT(list_reduce(list_prepend(0.0,
         list_transform(ma, x -> x * x)), (x, y) -> x + y))
       * SQRT(list_reduce(list_prepend(0.0,
           list_transform(mb, x -> x * x)), (x, y) -> x + y))), 6)
    AS cosine
FROM p
"""


def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (analytics.rfm_segments): every ordering
    customer scored 1-5 per dimension against nearest-rank quintile
    thresholds (broadcast 12-value row, comparison projection),
    segment = 100R+10F+M. Exact integer days/counts/cents.
    Data-level, one row per customer."""
    from hawk_pack_spark.operators.analytics import rfm_segments

    orders = load_table(spark, "orders", sf_dir)
    gmax = orders.agg(F.max(F.to_date("o_orderdate")).alias("_g"))
    per_cust = (
        orders.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max(F.to_date("o_orderdate")).alias("_last"),
            F.count(F.lit(1)).cast("bigint").alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .cast("bigint")
            .alias("monetary"),
        )
        .crossJoin(F.broadcast(gmax))
        .select(
            "custkey",
            F.datediff("_g", "_last").cast("bigint").alias("recency"),
            "frequency",
            "monetary",
        )
    )
    return rfm_segments(per_cust, "custkey", "recency", "frequency", "monetary")


RFM_SQL = """
WITH g AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS gm FROM orders),
pc AS (
  SELECT o_custkey AS custkey,
         CAST(g.gm - MAX(CAST(o_orderdate AS DATE)) AS BIGINT) AS recency,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS monetary
  FROM orders, g GROUP BY 1, g.gm),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pc),
th AS (
  SELECT
    MAX(CASE WHEN rr = GREATEST(1, CAST(CEIL(20 * n.n / 100.0) AS BIGINT)) THEN recency END) AS r20,
    MAX(CASE WHEN rr = GREATEST(1, CAST(CEIL(40 * n.n / 100.0) AS BIGINT)) THEN recency END) AS r40,
    MAX(CASE WHEN rr = GREATEST(1, CAST(CEIL(60 * n.n / 100.0) AS BIGINT)) THEN recency END) AS r60,
    MAX(CASE WHEN rr = GREATEST(1, CAST(CEIL(80 * n.n / 100.0) AS BIGINT)) THEN recency END) AS r80,
    MAX(CASE WHEN rf = GREATEST(1, CAST(CEIL(20 * n.n / 100.0) AS BIGINT)) THEN frequency END) AS f20,
    MAX(CASE WHEN rf = GREATEST(1, CAST(CEIL(40 * n.n / 100.0) AS BIGINT)) THEN frequency END) AS f40,
    MAX(CASE WHEN rf = GREATEST(1, CAST(CEIL(60 * n.n / 100.0) AS BIGINT)) THEN frequency END) AS f60,
    MAX(CASE WHEN rf = GREATEST(1, CAST(CEIL(80 * n.n / 100.0) AS BIGINT)) THEN frequency END) AS f80,
    MAX(CASE WHEN rm = GREATEST(1, CAST(CEIL(20 * n.n / 100.0) AS BIGINT)) THEN monetary END) AS m20,
    MAX(CASE WHEN rm = GREATEST(1, CAST(CEIL(40 * n.n / 100.0) AS BIGINT)) THEN monetary END) AS m40,
    MAX(CASE WHEN rm = GREATEST(1, CAST(CEIL(60 * n.n / 100.0) AS BIGINT)) THEN monetary END) AS m60,
    MAX(CASE WHEN rm = GREATEST(1, CAST(CEIL(80 * n.n / 100.0) AS BIGINT)) THEN monetary END) AS m80
  FROM (SELECT pc.*,
          ROW_NUMBER() OVER (ORDER BY recency, custkey) AS rr,
          ROW_NUMBER() OVER (ORDER BY frequency, custkey) AS rf,
          ROW_NUMBER() OVER (ORDER BY monetary, custkey) AS rm
        FROM pc), n),
s AS (
  SELECT pc.custkey, pc.recency, pc.frequency, pc.monetary,
    1 + CAST(recency < r20 AS INT) + CAST(recency < r40 AS INT)
      + CAST(recency < r60 AS INT) + CAST(recency < r80 AS INT) AS rs,
    1 + CAST(frequency > f20 AS INT) + CAST(frequency > f40 AS INT)
      + CAST(frequency > f60 AS INT) + CAST(frequency > f80 AS INT) AS fs,
    1 + CAST(monetary > m20 AS INT) + CAST(monetary > m40 AS INT)
      + CAST(monetary > m60 AS INT) + CAST(monetary > m80 AS INT) AS ms
  FROM pc, th)
SELECT custkey, recency, frequency, monetary,
       CAST(rs AS INTEGER) AS r_score, CAST(fs AS INTEGER) AS f_score,
       CAST(ms AS INTEGER) AS m_score,
       CAST(rs * 100 + fs * 10 + ms AS INTEGER) AS segment
FROM s
"""


def q_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mix diagnostic (bm25.vocab_overlap): pairwise
    token-vocabulary Jaccard between sources — one (class, token)
    DISTINCT reduction, token-keyed self-join, exact integer counts.
    Data-level, one row per unordered source pair."""
    from hawk_pack_spark.operators.bm25 import vocab_overlap

    docs = load_table(spark, "documents", sf_dir)
    return vocab_overlap(docs, "source")


VOCAB_OVERLAP_SQL = r"""
WITH v AS MATERIALIZED (
  SELECT DISTINCT source AS c,
         UNNEST(list_filter(regexp_split_to_array(lower(text), '\s+'),
                t -> t != '')) AS t
  FROM documents),
sz AS MATERIALIZED (SELECT c, CAST(COUNT(*) AS BIGINT) AS sz
                    FROM v GROUP BY 1),
i AS (
  SELECT a.c AS class_a, b.c AS class_b, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM v a JOIN v b ON a.t = b.t AND a.c < b.c
  GROUP BY 1, 2)
SELECT i.class_a, i.class_b, i.n_common,
       sa.sz + sb.sz - i.n_common AS n_union,
       ROUND(CAST(i.n_common AS DOUBLE)
             / CAST(sa.sz + sb.sz - i.n_common AS DOUBLE), 6) AS jaccard
FROM i JOIN sz sa ON i.class_a = sa.c JOIN sz sb ON i.class_b = sb.c
"""


def q_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (asof.asof_join_forward): for every error
    event, the value of the same user's NEXT purchase at-or-after it
    (NULL if none) — the look-ahead dual of asof_last_purchase, same
    union + ordered-window carry (one shuffle, no range crossJoin).
    Data-level, one row per error event."""
    from hawk_pack_spark.operators.asof import asof_join_forward

    ev = load_table(spark, "events", sf_dir)
    errors = ev.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    out = asof_join_forward(errors, purchases, "user_id")
    return out.select(
        "event_id", "user_id", F.round("asof_value", 6).alias("asof_value")
    )


# Tie-explicit (ADVICE r9): asof_join_forward deterministically picks the
# SMALLEST value tuple among equal-(key, ts) right rows, while DuckDB's
# native ASOF leaves duplicate-right-timestamp ties unspecified. Reducing
# the right side to MIN(value) per (user_id, ts) BEFORE the ASOF join makes
# the oracle's tie rule identical to the operator's without changing which
# timestamp matches — parity no longer depends on the fixture having
# unique (user_id, ts) purchases.
ASOF_FWD_SQL = """
SELECT e.event_id, e.user_id, ROUND(p.value, 6) AS asof_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (SELECT user_id, ts, MIN(value) AS value FROM events
                WHERE event_type = 'purchase' GROUP BY user_id, ts) p
  ON e.user_id = p.user_id AND p.ts >= e.ts
"""
