"""Hybrid retrieval — reciprocal-rank fusion of heterogeneous rankers.

The modern serving recipe: a lexical arm (BM25) and a semantic arm
(embedding kNN) each produce a per-query top-k, and RRF fuses them on
RANK alone — ``score(d) = Σ_r 1/(rrf_k + rank_r(d))`` (Cormack et al.,
SIGIR 2009) — so the arms' incomparable score scales never need
calibration. Spark shape: union the (query, doc, rank) lists, one
groupBy-sum, one top-k window; the fused candidate set is at most
``arms × k`` rows per query, so the fusion cost is negligible next to
the arms themselves, at any corpus size.

The reference has no retrieval surface — superset, composed from the
repo's own BM25 and hash-embedding arms.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hawk_pack_spark.operators.topk import topk_rows


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    rrf_k: int = 60,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    score_round: int = 9,
) -> DataFrame:
    """Fuse per-query rankings into one top-k. Each input needs
    (query_id, doc_id, rank); returns (query_id, doc_id, rrf, rank).

    With ≤2 arms the fused score is a sum of at most two doubles —
    commutative, so bit-reproducible regardless of aggregation order
    (the catalog float discipline)."""
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [r.select(query_id, doc_id, "rank") for r in rankings]
    u = reduce(lambda a, b: a.unionByName(b), parts)
    contrib = F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("rank"))
    scored = u.groupBy(query_id, doc_id).agg(
        F.round(F.sum(contrib), score_round).alias("rrf")
    )
    return topk_rows(
        scored, [query_id], "rrf", k, ascending=False, tie_cols=[doc_id]
    )


def hard_negatives(
    vectors: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    metric: str = "l2_sq",
    vec_id: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    anchor_id: str = "anchor_id",
    anchor_vec: str = "anchor_vec",
    anchor_label: str = "anchor_label",
    index_df: DataFrame | None = None,
    overfetch: int = 4,
    max_rounds: int = 3,
    decision_out: dict | None = None,
    **ann_kwargs,
) -> DataFrame:
    """Contrastive hard-negative mining: per anchor, the k NEAREST
    vectors whose label differs from the anchor's — the negatives that
    sit right at the decision boundary, which is what an embedding /
    reranker trainer actually wants (random negatives are too easy).

    Without an index (exact — also the recall oracle): anchors
    broadcast against the distributed vector table, the per-anchor
    dynamic label predicate fuses into the scan, a Window keeps the
    top-k per anchor (ties on vec_id). The corpus side never shuffles.

    With ``index_df`` (an HNSW index over the vectors): ANN over-fetch
    — `ann_search` with k·overfetch, drop same-label hits, double the
    fetch for starved anchors only (up to ``max_rounds``), then an
    exact completeness fallback for any anchor still short. Same
    dispatch discipline as `filtered_knn` (knn_exact.py), except the
    predicate is PER-ANCHOR (label ≠ anchor's), so pre-filtering the
    index is never an option — post-filter is the only index path.

    Returns (anchor_id, vec_id, label, dist, rank).
    """
    from hawk_pack_spark.functions.distance import distance_expr
    from hawk_pack_spark.operators.topk import topk_rows

    def exact(a: DataFrame) -> DataFrame:
        pairs = vectors.crossJoin(F.broadcast(a)).where(
            F.col(label_col) != F.col(anchor_label)
        )
        return topk_rows(
            pairs.select(
                F.col(anchor_id),
                F.col(vec_id),
                F.col(label_col).alias("label"),
                distance_expr(
                    metric, F.col(anchor_vec), F.col(vec_col)
                ).alias("dist"),
            ),
            [anchor_id], "dist", k, ascending=True, tie_cols=[vec_id],
        )

    if index_df is None:
        if decision_out is not None:
            decision_out["path"] = "exact"
        return exact(anchors)

    from hawk_pack_spark.operators.hnsw import ann_search

    if decision_out is not None:
        decision_out["path"] = "index_postfilter"
    labels = vectors.select(F.col(vec_id), F.col(label_col).alias("label"))
    a_labels = anchors.select(F.col(anchor_id), F.col(anchor_label).alias("_alab"))
    pending = anchors
    kept_parts: list[DataFrame] = []
    fetch = k * overfetch
    for _ in range(max_rounds):
        hits = ann_search(
            index_df,
            pending.select(anchor_id, anchor_vec),
            k=fetch, metric=metric,
            query_id=anchor_id, query_col=anchor_vec, **ann_kwargs,
        )
        if anchor_id != "query_id":  # ann_search emits literal query_id
            hits = hits.withColumnRenamed("query_id", anchor_id)
        surv = (
            hits.join(labels, vec_id)
            .join(F.broadcast(a_labels), anchor_id)
            .where(F.col("label") != F.col("_alab"))
            .select(anchor_id, vec_id, "label", "dist")
        )
        got = surv.groupBy(anchor_id).agg(F.count(F.lit(1)).alias("_got"))
        full_q = got.where(F.col("_got") >= k).select(anchor_id)
        kept_parts.append(surv.join(full_q, anchor_id, "leftsemi"))
        pending = pending.join(full_q, anchor_id, "leftanti")
        if pending.limit(1).count() == 0:
            pending = None
            break
        fetch *= 2
    if pending is not None and pending.limit(1).count() > 0:
        # completeness fallback: the starved remainder goes exact
        kept_parts.append(exact(pending).drop("rank"))
    out = kept_parts[0]
    for p in kept_parts[1:]:
        out = out.unionByName(p)
    return topk_rows(
        out.select(anchor_id, vec_id, "label", "dist"),
        [anchor_id], "dist", k, ascending=True, tie_cols=[vec_id],
    )


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted index: distinct (term, doc) postings from whitespace
    tokens. Corpus-sized, partitioned by term after the groupBy — the
    layout every lexical query below probes. Build is one explode +
    one distinct (map-side combined)."""
    from hawk_pack_spark.functions import text as T

    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(T.tokens(F.col(text_col))).alias("term"),
        ).distinct()
    )


def boolean_retrieval(
    postings: DataFrame,
    queries: DataFrame,
    query_id: str = "query_id",
    must_col: str = "must",
    any_col: str = "any",
    not_col: str = "none",
) -> DataFrame:
    """Boolean AND/OR/NOT retrieval over an inverted index: per query,
    docs containing EVERY ``must`` term, AT LEAST ONE ``any`` term (an
    empty array waives the clause), and NO ``not`` term. Returns
    (query_id, doc_id).

    Spark shape: the query terms explode into a tiny (query, term,
    kind) table that BROADCASTS against the corpus-sized postings —
    one broadcast-hash probe of the index, one groupBy on (query,
    doc) counting matched must/any/not terms, one broadcast join back
    to the per-query must-counts. The corpus never shuffles more than
    once and never crosses with the query set; NOT is decided by a
    count in the same aggregate, not a separate anti-join pass.

    A query needs at least one positive (must/any) term: docs enter the
    aggregate only by matching SOME query term, so a NOT-only query can
    never mean "all docs lacking the not terms" here — it raises at
    execution time instead of silently returning nothing. Duplicate
    terms inside ``must`` are fine: the match count compares against
    the DISTINCT must-term count (the exploded terms are deduped).
    """
    q = queries.select(
        F.col(query_id).alias("_qid"),
        F.col(must_col).alias("_must"),
        F.col(any_col).alias("_any"),
        F.col(not_col).alias("_not"),
    )
    need = q.select(
        "_qid",
        # postings hits are deduped below, so the target count must be
        # the DISTINCT must-term count — with F.size a repeated must
        # term made _m == _n_must unsatisfiable (ADVICE r8)
        F.size(F.array_distinct("_must")).alias("_n_must"),
        (F.size("_any") > 0).alias("_has_any"),
    ).where(
        F.assert_true(
            (F.size("_must") + F.size("_any")) > 0,
            "boolean_retrieval: query has no positive (must/any) terms — "
            "NOT-only queries are unsupported (docs matching no query "
            "term never enter the aggregate)",
        ).isNull()
    )
    terms = q.select(
        "_qid", F.explode("_must").alias("term"), F.lit("must").alias("_kind")
    ).unionByName(
        q.select("_qid", F.explode("_any").alias("term"), F.lit("any").alias("_kind"))
    ).unionByName(
        q.select("_qid", F.explode("_not").alias("term"), F.lit("not").alias("_kind"))
    ).distinct()
    hits = (
        postings.join(F.broadcast(terms), "term")
        .groupBy("_qid", "doc_id")
        .agg(
            F.sum(F.when(F.col("_kind") == "must", 1).otherwise(0)).alias("_m"),
            F.sum(F.when(F.col("_kind") == "any", 1).otherwise(0)).alias("_a"),
            F.sum(F.when(F.col("_kind") == "not", 1).otherwise(0)).alias("_x"),
        )
    )
    return (
        hits.join(F.broadcast(need), "_qid")
        .where(
            (F.col("_m") == F.col("_n_must"))
            & (~F.col("_has_any") | (F.col("_a") > 0))
            & (F.col("_x") == 0)
        )
        .select(F.col("_qid").alias(query_id), "doc_id")
    )


def mmr_rerank(
    candidates: DataFrame,
    k: int,
    lam: float = 0.5,
    query_id: str = "query_id",
    doc_id: str = "vec_id",
    rel_col: str = "rel",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR'98): greedily pick k of each query's candidates maximizing
    λ·relevance − (1−λ)·max cosine similarity to the already-selected
    set — the diversity pass between retrieval and display (or between
    ANN and a training-batch sampler). Returns (query_id, doc_id,
    mmr_rank, mmr_score).

    Greedy selection is inherently sequential IN k but independent
    ACROSS queries, and the candidate list per query is bounded (top-N
    from a retrieval arm) — so the Spark shape is applyInPandas per
    query group: one shuffle on query_id, a few-hundred-row numpy
    problem per group, no cross-query state. Deterministic: every
    argmax tie breaks on the smaller doc id.
    """
    import numpy as np
    import pandas as pd

    if not (0.0 <= lam <= 1.0):
        raise ValueError("lam must be in [0, 1]")

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(doc_id).reset_index(drop=True)
        V = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0] = 1.0
        U = V / norms[:, None]
        sim = U @ U.T
        rel = pdf[rel_col].to_numpy(dtype=np.float64)
        n = len(pdf)
        chosen: list[int] = []
        scores: list[float] = []
        avail = np.ones(n, dtype=bool)
        for _ in range(min(k, n)):
            if chosen:
                penal = sim[:, chosen].max(axis=1)
            else:
                penal = np.zeros(n)
            mmr = lam * rel - (1.0 - lam) * penal
            mmr_masked = np.where(avail, mmr, -np.inf)
            best = int(np.argmax(mmr_masked))  # ties → lowest index == lowest id
            chosen.append(best)
            scores.append(float(mmr_masked[best]))
            avail[best] = False
        out = pdf.iloc[chosen][[query_id, doc_id]].copy()
        out["mmr_rank"] = np.arange(1, len(chosen) + 1, dtype=np.int32)
        out["mmr_score"] = np.round(scores, 6)
        return out

    schema = f"{query_id} long, {doc_id} long, mmr_rank int, mmr_score double"
    return (
        candidates.select(query_id, doc_id, rel_col, vec_col)
        .groupBy(query_id)
        .applyInPandas(pick, schema)
    )


def eval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Retrieval evaluation — the measurement half every ranking
    operator in this repo (BM25, ANN, RRF, MMR) needs: per-query
    recall@k, precision@k, reciprocal rank (MRR term), and nDCG@k
    against a relevance-judgments table `qrels` (query, doc, graded
    rel ≥ 0; binary = 0/1). Standard definitions (TREC):
    RR = 1/rank of the first relevant hit (0 if none in top-k);
    DCG@k = Σ rel_i/log2(i+1) over result ranks i = 1..k;
    IDCG@k from the ideal ordering of THE QUERY'S judged docs.

    Shape: results are cut to rank ≤ k, LEFT-joined to qrels on
    (query, doc) — one co-partitioned equi-join, never a fan-out —
    then ONE groupBy per query; the ideal DCG is an independent
    per-query aggregate over qrels (top-k rels via sorted-slice
    inside the aggregate, no second shuffle family). Float
    discipline: each DCG is a fold over the RANK-SORTED term list
    (deterministic IEEE order, the group_entropy discipline), and
    every term is rel/log2(i+1) with integer rel and integer rank —
    identical single ops in any engine; the final metrics are single
    divisions rounded to 6 dp.

    Queries with no judged-relevant docs are dropped (recall/nDCG are
    undefined there — TREC convention), reported via the `n_judged`
    column on surviving rows.
    """
    hits = (
        results.where(F.col(rank_col) <= k)
        .select(
            F.col(query_col).alias("_q"),
            F.col(doc_col).alias("_d"),
            F.col(rank_col).alias("_r"),
        )
        .join(
            qrels.select(
                F.col(query_col).alias("_q"),
                F.col(doc_col).alias("_d"),
                F.col(rel_col).cast("long").alias("_rel"),
            ),
            ["_q", "_d"],
            "left",
        )
        .select(
            "_q", "_r", F.coalesce("_rel", F.lit(0)).alias("_rel")
        )
    )
    per_q = hits.groupBy(F.col("_q").alias(query_col)).agg(
        F.count(F.lit(1)).alias("_n_ret"),
        F.sum((F.col("_rel") > 0).cast("long")).alias("_n_rel_ret"),
        F.min(F.when(F.col("_rel") > 0, F.col("_r"))).alias("_first"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("_r", "_rel"))),
            F.lit(0.0),
            lambda acc, x: acc
            + x["_rel"].cast("double")
            / F.log2(x["_r"].cast("double") + 1),
        ).alias("_dcg"),
    )
    ideal = qrels.groupBy(F.col(query_col)).agg(
        F.count(F.lit(1)).alias("n_judged"),
        F.sum((F.col(rel_col) > 0).cast("long")).alias("_n_rel"),
        F.aggregate(
            F.slice(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col(rel_col).cast("long")).alias("_nr"),
                            F.col(doc_col).alias("_doc"),
                        )
                    )
                ),
                1,
                k,
            ),
            F.struct(
                F.lit(0.0).alias("acc"), F.lit(1).cast("long").alias("i")
            ),
            lambda st, x: F.struct(
                (
                    st["acc"]
                    + (-x["_nr"]).cast("double")
                    / F.log2(st["i"].cast("double") + 1)
                ).alias("acc"),
                (st["i"] + 1).alias("i"),
            ),
            lambda st: st["acc"],
        ).alias("_idcg"),
    )
    j = per_q.join(ideal, query_col).where(F.col("_n_rel") > 0)
    return j.select(
        query_col,
        "n_judged",
        F.round(
            F.col("_n_rel_ret").cast("double")
            / F.col("_n_rel").cast("double"),
            6,
        ).alias(f"recall_at_{k}"),
        F.round(
            F.col("_n_rel_ret").cast("double") / F.lit(float(k)), 6
        ).alias(f"precision_at_{k}"),
        F.round(
            F.coalesce(
                F.lit(1.0) / F.col("_first").cast("double"), F.lit(0.0)
            ),
            6,
        ).alias("reciprocal_rank"),
        F.round(
            F.when(F.col("_idcg") > 0, F.col("_dcg") / F.col("_idcg"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias(f"ndcg_at_{k}"),
    )


def phrase_search(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase search (positional matching): documents containing
    the token sequence `phrase` (whitespace-tokenized, lowercased),
    with the match count and the first match position — what a
    positional inverted index answers, rendered SHUFFLE-FREE: each
    document checks its own token array with a filtered position scan
    (`F.filter` over `sequence` + `slice` equality), so the plan is a
    single narrow projection over the corpus scan — no explode, no
    join, no aggregation. At 100 TB this is scan-bound by design;
    repeated-query workloads build the inverted index instead
    (boolean_retrieval / bm25).

    Returns (id, n_matches, first_pos) for matching docs only;
    positions are 1-based token offsets. Overlapping matches count
    separately (positions 'a a a' match 'a a' twice).
    """
    from hawk_pack_spark.functions.text import tokens

    toks = [t for t in phrase.lower().split() if t]
    if not toks:
        raise ValueError("phrase_search: empty phrase")
    m = len(toks)
    lit_arr = F.array(*[F.lit(t) for t in toks])
    w = tokens(F.col(text_col))
    hits = F.filter(
        F.sequence(F.lit(1), F.size(w) - m + 1),
        lambda i: F.slice(w, i, F.lit(m)) == lit_arr,
    )
    out = docs.where(F.size(w) >= m).select(
        F.col(id_col),
        F.size(hits).cast("bigint").alias("n_matches"),
        F.array_min(hits).cast("bigint").alias("first_pos"),
    )
    return out.where(F.col("n_matches") > 0)


def rank_biased_overlap(
    ranking_a: DataFrame,
    ranking_b: DataFrame,
    k: int = 10,
    p: float = 0.9,
    query_id: str = "query_id",
    doc_id: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Rank-biased overlap (Webber, Moffat & Zobel, TOIS 2010) between
    two per-query rankings, truncated at depth ``k`` with the standard
    extrapolation: RBO = (1−p)·Σ_{d=1..k} p^{d−1}·A_d + p^k·A_k, where
    A_d is the overlap fraction of the two depth-d prefixes. The
    top-weighted "do these two retrieval arms agree" measure — RRF
    fusion adds arms blindly; RBO says whether they are redundant
    (≈1) or complementary (≈0).

    Shape: each arm's top-k collapses to ONE ordered doc array per
    query (top-k-bounded state), one (query) join, and a fixed
    k-term fold — every float product in fixed operand order, so the
    value is engine-portable. Queries present in only one arm are
    dropped (overlap is undefined); depth-d prefixes shorter than d
    (arms returning < k docs) use the actual prefix, per the paper's
    uneven-list treatment.
    """
    if not (0.0 < p < 1.0):
        raise ValueError("p must be in (0, 1)")

    def _arr(r: DataFrame, name: str) -> DataFrame:
        return (
            r.where(F.col(rank_col) <= k)
            .groupBy(query_id)
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col(rank_col).alias("r"),
                                F.col(doc_id).alias("d"),
                            )
                        )
                    ),
                    lambda x: x["d"],
                ).alias(name)
            )
        )

    j = _arr(ranking_a, "_la").join(_arr(ranking_b, "_lb"), query_id)
    depth = F.sequence(F.lit(1), F.lit(k))
    a_d = lambda d: (  # noqa: E731 — overlap fraction at depth d
        F.size(
            F.array_intersect(
                F.slice(F.col("_la"), 1, d), F.slice(F.col("_lb"), 1, d)
            )
        ).cast("double")
        / d.cast("double")
    )
    series = F.aggregate(
        depth,
        F.lit(0.0),
        lambda acc, d: acc + F.pow(F.lit(p), d.cast("double") - F.lit(1.0)) * a_d(d),
    )
    rbo = (
        F.lit(1.0 - p) * series
        + F.pow(F.lit(p), F.lit(float(k))) * a_d(F.lit(k))
    )
    return j.select(
        query_id,
        F.round(rbo, 6).alias("rbo"),
    )
