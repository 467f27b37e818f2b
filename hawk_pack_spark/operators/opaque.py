"""Comparison-only distances — the reference's opaque ``DistanceRef``
made concrete (reference src/traits.rs:29-32: "a reference to a
distance… Example: an encrypted distance" — a value the engine may
CLONE and COMPARE via the store's ``less_than`` but never inspect
numerically).

Everywhere else in this engine a metric materializes a real column and
``less_than`` is the native ``<`` (functions/distance.py). This module
demonstrates the OTHER half of the trait's contract: a distance whose
values are opaque tokens drawn from a finite codebook, whose order is
defined ONLY by a ``less_than`` relation (a keyed lookup table), and a
top-k that consumes it through comparisons alone — no ORDER BY on the
token, no numeric cast, no arithmetic. The reference's FurthestQueue
needs nothing but ``less_than`` (src/hnsw/queue.rs:27-47); this is that
discipline, distributed.

Scale shape: the only pairwise work is token×token within a query —
bounded by the CODEBOOK size squared, not the candidate count. Per-
candidate work is one groupBy, one broadcast join against the ``lt``
relation, and one window PARTITIONED by (query, token) (id-ordered —
ids are handles, not distances). O(n) + |codebook|² at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# The demo codebook: 16 opaque tokens. The HIDDEN total order is the
# list index; the tokens are chosen so LEXICOGRAPHIC order disagrees
# with it everywhere it can — any code path that sorts the tokens
# natively produces a visibly different ranking (pinned in tests).
CODEBOOK = [
    "zq", "qa", "mx", "aa", "tt", "ba", "zz", "ca",
    "ka", "ac", "ya", "bb", "da", "ab", "ea", "az",
]


def less_than_relation(spark) -> DataFrame:
    """The ``less_than`` oracle as data: (ta, tb) rows meaning
    ta < tb under the hidden order. This relation — not the token
    bytes — is the ONLY source of ordering downstream."""
    rows = [
        (CODEBOOK[i], CODEBOOK[j])
        for i in range(len(CODEBOOK))
        for j in range(len(CODEBOOK))
        if i < j
    ]
    return spark.createDataFrame(rows, "ta string, tb string")


def opaque_token(expr) -> "F.Column":
    """``eval_distance`` for the demo metric: map an integer key to an
    opaque codebook token. The engine sees only the token."""
    arr = F.array(*[F.lit(t) for t in CODEBOOK])
    return F.element_at(arr, (expr % len(CODEBOOK) + 1).cast("int"))


def comparison_topk(
    pairs: DataFrame,
    lt: DataFrame,
    k: int,
    query_col: str = "query_id",
    id_col: str = "vec_id",
    tok_col: str = "tok",
) -> DataFrame:
    """Top-k candidates per query by an OPAQUE distance token, using
    only the ``lt`` comparison relation for ordering.

    rank(candidate) = (#candidates in the query whose token is
    strictly less under ``lt``) + (position among same-token peers,
    id-ascending). Equality of opaque handles is PartialEq (allowed by
    the trait); order never touches the token bytes. Returns
    (query, id, tok, rnk) with rnk 0-based, rnk < k.
    """
    cnt = pairs.groupBy(query_col, tok_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_n")
    )
    x = cnt.select(query_col, tok_col)
    y = cnt.select(
        query_col,
        F.col(tok_col).alias("_ytok"),
        F.col("_n").alias("_yn"),
    )
    less = (
        x.join(y, query_col)
        .join(
            F.broadcast(lt),
            (F.col("ta") == F.col("_ytok")) & (F.col("tb") == F.col(tok_col)),
            "inner",
        )
        .groupBy(query_col, tok_col)
        .agg(F.sum("_yn").alias("_less"))
    )
    base = (
        cnt.join(less, [query_col, tok_col], "left")
        .select(
            query_col,
            tok_col,
            F.coalesce(F.col("_less"), F.lit(0)).cast("bigint").alias("_less"),
        )
    )
    w = Window.partitionBy(query_col, tok_col).orderBy(id_col)
    ranked = pairs.join(base, [query_col, tok_col]).select(
        query_col,
        id_col,
        tok_col,
        (F.col("_less") + F.row_number().over(w) - 1)
        .cast("bigint")
        .alias("rnk"),
    )
    return ranked.where(F.col("rnk") < k)
