"""Round-12 rows: the comparison-only opaque DistanceRef demo
(VERDICT r11 #5 — reference src/traits.rs:29-32, the one semantic of
the reference with no analog until now: a distance the engine may only
clone and compare, never inspect numerically).

Specs are re-exported through hawk_pack_spark.queries.catalog; see that
module's header for the cross-engine float-discipline rules.
"""

from __future__ import annotations

from hawk_pack_spark.queries._shared import *  # noqa: F401,F403

from hawk_pack_spark.operators.opaque import (
    CODEBOOK,
    comparison_topk,
    less_than_relation,
    opaque_token,
)

_N_QUERIES = 8
_K = 10


def q_opaque_distance_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Comparison-only top-k over an OPAQUE distance (operators/
    opaque.py): each (query, candidate) pair gets a token from a
    16-entry codebook whose hidden order is its index — and whose
    lexicographic order disagrees with it — so the ranking is correct
    ONLY if ordering flows through the ``less_than`` relation, never
    through the token bytes. Candidates are the embeddings ids; rank =
    (#strictly-less tokens in the query, via the relation) + id-order
    position among same-token peers. No ORDER BY on the token, no
    numeric cast anywhere (pinned in tests/test_opaque_distance.py).
    Scale shape: per-candidate work is one groupBy + one broadcast
    codebook join + one (query, token)-PARTITIONED window; the only
    pairwise term is |codebook|². Data-level."""
    ids = load_table(spark, "embeddings", sf_dir).select("vec_id")
    queries = spark.range(_N_QUERIES).select(F.col("id").alias("query_id"))
    pairs = queries.crossJoin(ids).select(
        "query_id",
        "vec_id",
        opaque_token(F.col("query_id") * 31 + F.col("vec_id")).alias("tok"),
    )
    return comparison_topk(
        pairs, less_than_relation(spark), _K
    ).select("query_id", "vec_id", "tok", "rnk")


def _opaque_sql() -> str:
    code_vals = ", ".join(
        f"({i}, '{t}')" for i, t in enumerate(CODEBOOK)
    )
    q_vals = ", ".join(f"({i})" for i in range(_N_QUERIES))
    return f"""
WITH code(idx, tok) AS (VALUES {code_vals}),
lt AS (
  SELECT a.tok AS ta, b.tok AS tb FROM code a, code b WHERE a.idx < b.idx
),
q(query_id) AS (VALUES {q_vals}),
pairs AS (
  SELECT CAST(q.query_id AS BIGINT) AS query_id, e.vec_id, c.tok
  FROM q CROSS JOIN embeddings e
  JOIN code c ON c.idx = (q.query_id * 31 + e.vec_id) % {len(CODEBOOK)}
),
cnt AS (
  SELECT query_id, tok, CAST(COUNT(*) AS BIGINT) AS n
  FROM pairs GROUP BY 1, 2
),
less AS (
  SELECT x.query_id, x.tok, CAST(SUM(y.n) AS BIGINT) AS less_n
  FROM cnt x
  JOIN cnt y ON x.query_id = y.query_id
  JOIN lt ON lt.ta = y.tok AND lt.tb = x.tok
  GROUP BY 1, 2
),
ranked AS (
  SELECT p.query_id, p.vec_id, p.tok,
         CAST(COALESCE(l.less_n, 0)
              + ROW_NUMBER() OVER (
                  PARTITION BY p.query_id, p.tok ORDER BY p.vec_id
                ) - 1 AS BIGINT) AS rnk
  FROM pairs p
  LEFT JOIN less l ON l.query_id = p.query_id AND l.tok = p.tok
)
SELECT query_id, vec_id, tok, rnk FROM ranked WHERE rnk < {_K}
"""


OPAQUE_DISTANCE_SQL = _opaque_sql()
