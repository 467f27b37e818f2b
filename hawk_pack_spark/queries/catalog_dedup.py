"""dedup & similarity joins (SURVEY 2.12)

Auto-split from the former single-file queries/catalog.py (round 11,
VERDICT r10 #7) — specs are re-exported through
hawk_pack_spark.queries.catalog; see that module's header for the
cross-engine float-discipline rules every spec follows.
"""

from __future__ import annotations

from hawk_pack_spark.queries._shared import *  # noqa: F401,F403
from hawk_pack_spark.queries._shared import _avg_exact, _charge, _dec_sum, _disc_price
from hawk_pack_spark.queries.catalog_vector import _embeddings_vectors  # noqa: F401



# ---------------------------------------------------------------------------
# dedup & similarity joins (SURVEY §2.12 north-star operators)

_HASH64 = "CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"
_TOKS = (
    "list_distinct(list_filter(regexp_split_to_array(lower(text), '\\s+'),"
    " x -> x != ''))"
)


def q_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup with the SCALE defaults: LSH buckets larger
    than max_bucket are dropped BEFORE the candidate self-join (a bucket
    of b docs emits b²/2 pairs — on a degenerate corpus the uncapped
    sweep is quadratic; dropped buckets are the no-signal ones). The cap
    is applied identically in the oracle, so parity holds at every SF.
    The uncapped variant lives in RETIRED (pytest parity only)."""
    from hawk_pack_spark.operators.dedup import minhash_near_dup

    docs = load_table(spark, "documents", sf_dir)
    return minhash_near_dup(
        docs, num_hashes=8, bands=4, threshold=0.9, max_bucket=20
    )


def q_minhash_near_dup_uncapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hawk_pack_spark.operators.dedup import minhash_near_dup

    docs = load_table(spark, "documents", sf_dir)
    return minhash_near_dup(docs, num_hashes=8, bands=4, threshold=0.9)


def _minhash_sql() -> str:
    sig_cols = ",\n    ".join(
        "min(" + _HASH64.format(expr=f"'{s}|' || tok") + f") AS h{s}" for s in range(8)
    )
    band_rows = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, {b} AS band, md5(concat_ws(',', h{2*b}::VARCHAR, h{2*b+1}::VARCHAR)) AS band_key FROM sig"
        for b in range(4)
    )
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS ts FROM documents),
ex AS (SELECT doc_id, unnest(ts) AS tok FROM toks),
sig AS (SELECT doc_id, {sig_cols} FROM ex GROUP BY doc_id),
bands AS (
  {band_rows}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band, band_key)
  WHERE a.doc_id < b.doc_id),
ver AS (
  SELECT id_a, id_b,
    ROUND(len(list_intersect(ta.ts, tb.ts)) * 1.0
      / len(list_distinct(list_concat(ta.ts, tb.ts))), 6) AS jaccard
  FROM cand
  JOIN toks ta ON ta.doc_id = id_a
  JOIN toks tb ON tb.doc_id = id_b)
SELECT id_a, id_b, jaccard FROM ver WHERE jaccard >= 0.9
"""


def _minhash_capped_sql(max_bucket: int = 20) -> str:
    base = _minhash_sql()
    return base.replace(
        """cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b USING (band, band_key)""",
        f"""bands_capped AS (
  SELECT * FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY band, band_key) AS bsize FROM bands)
  WHERE bsize <= {max_bucket}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands_capped a JOIN bands_capped b USING (band, band_key)""",
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup retention decision: MinHash-LSH pairs (scale-capped, same
    as minhash_near_dup) → connected components → per-doc (rep, keep).
    Pointer-jumping min-label propagation; oracle = recursive-CTE
    transitive closure over the identically-capped pair set."""
    from hawk_pack_spark.operators.components import dedup_clusters
    from hawk_pack_spark.operators.dedup import minhash_near_dup

    docs = load_table(spark, "documents", sf_dir)
    pairs = minhash_near_dup(
        docs, num_hashes=8, bands=4, threshold=0.9, max_bucket=20
    )
    return dedup_clusters(pairs, docs.select("doc_id"))


def _dedup_clusters_sql() -> str:
    minhash = _minhash_capped_sql().strip().rstrip()
    return f"""
WITH RECURSIVE pairs AS ({minhash}),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b AS a, id_a AS b FROM pairs
),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
comp AS (
  SELECT a AS node, LEAST(MIN(b), a) AS component FROM reach GROUP BY a
)
SELECT d.doc_id,
  COALESCE(comp.component, d.doc_id) AS rep,
  (d.doc_id = COALESCE(comp.component, d.doc_id)) AS keep
FROM documents d LEFT JOIN comp ON d.doc_id = comp.node
"""


def q_simhash_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hawk_pack_spark.operators.dedup import simhash_groups

    docs = load_table(spark, "documents", sf_dir)
    return simhash_groups(docs)


def _simhash_sql(nbits: int = 60) -> str:
    h = _HASH64.format(expr="tok")
    bit_cols = ",\n    ".join(
        f"SUM(CASE WHEN (hv >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(nbits)
    )
    terms = "\n    + ".join(
        f"(CASE WHEN b{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for i in range(nbits)
    )
    return f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS ts FROM documents),
ex AS (SELECT doc_id, unnest(ts) AS tok FROM toks),
h AS (SELECT doc_id, {h} AS hv FROM ex),
bits AS (SELECT doc_id, {bit_cols} FROM h GROUP BY doc_id),
coded0 AS (SELECT doc_id, {terms} AS code FROM bits),
coded AS (
  SELECT d.doc_id, COALESCE(c.code, CAST(0 AS BIGINT)) AS code
  FROM documents d LEFT JOIN coded0 c USING (doc_id))
SELECT code, COUNT(*) AS n_docs, MIN(doc_id) AS min_id FROM coded GROUP BY code
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard similarity join with the SCALE default: grams whose
    document frequency exceeds max_df are dropped before the self-join
    (a gram in d docs emits d²/2 pairs; ubiquitous grams carry no
    similarity signal — the stop-gram analog of stopwords). The cap is
    mirrored in the oracle. Uncapped variant in RETIRED."""
    from hawk_pack_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, "documents", sf_dir)
    return ngram_jaccard_pairs(docs, n=3, threshold=0.01, max_df=20)


def q_ngram_jaccard_uncapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hawk_pack_spark.operators.dedup import ngram_jaccard_pairs

    docs = load_table(spark, "documents", sf_dir)
    return ngram_jaccard_pairs(docs, n=3, threshold=0.01)


NGRAM_JACCARD_SQL = """
WITH toks AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x != '') AS ts
  FROM documents),
g AS (
  SELECT doc_id,
    list_distinct(CASE WHEN len(ts) >= 3
      THEN list_transform(range(1, len(ts) - 1),
           i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2])
      ELSE [] END) AS gs
  FROM toks),
e AS (SELECT doc_id, len(gs) AS ng, unnest(gs) AS gram FROM g),
shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.ng AS na, b.ng AS nb,
    COUNT(*) AS inter
  FROM e a JOIN e b USING (gram)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4),
j AS (
  SELECT id_a, id_b,
    ROUND(inter * 1.0 / (na + nb - inter), 6) AS jaccard
  FROM shared)
SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.01
"""


def q_lsh_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hawk_pack_spark.operators.similarity import lsh_hamming_near_pairs

    emb = _embeddings_vectors(spark, sf_dir)
    # 8-bit bands: on random sign codes, 16-bit bands essentially never
    # collide (0 candidate pairs = no check at all); 8 bands of 8 bits
    # yield a deterministic non-empty candidate set
    return lsh_hamming_near_pairs(emb, max_dist=22, band_bits=8, n_bands=8)


LSH_HAMMING_SQL = """
WITH c AS (
  SELECT vec_id,
    CAST(list_sum(list_transform(range(0, 63),
      i -> CASE WHEN embedding[i + 1] > 0 THEN (1::BIGINT << i) ELSE 0::BIGINT END)) AS BIGINT) AS code
  FROM embeddings),
bands AS (
  SELECT vec_id, code, b.band, (code >> (b.band * 8)) & 255 AS band_val
  FROM c, (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS band) b),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
    a.code AS code_a, b.code AS code_b
  FROM bands a JOIN bands b USING (band, band_val)
  WHERE a.vec_id < b.vec_id),
d AS (
  SELECT id_a, id_b, CAST(bit_count(xor(code_a, code_b)) AS INTEGER) AS dist
  FROM cand)
SELECT id_a, id_b, dist FROM d WHERE dist <= 22
"""
