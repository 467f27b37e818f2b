"""Round-11 rows: the composed streaming curation pipeline (the chain a
user deploys end-to-end, VERDICT r10 #6).

Specs are re-exported through hawk_pack_spark.queries.catalog; see that
module's header for the cross-engine float-discipline rules.
"""

from __future__ import annotations

from hawk_pack_spark.queries._shared import *  # noqa: F401,F403
from hawk_pack_spark.queries._shared import (
    _avg_exact, _charge, _dec_sum, _disc_price,
)


@low_stream_shuffle
def q_streaming_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED streaming pipeline (streaming/pipeline.py): one
    checkpointed readStream chain — exact record dedup
    (dropDuplicatesWithinWatermark on doc_id, unbounded horizon),
    canonical-text near-dup gate against a durable seen store,
    idempotent per-epoch windowed aggregation, and the serving readout
    — must equal the batch composition the oracle runs. Documents
    stream as three id-ordered thirds; batch 2 replays ten batch-1
    records verbatim (stage-1 food), batch 3 carries five exact-text
    copies and five case/punctuation-mangled near-dups under fresh ids
    (gate food). Output: per (day, source) accepted count, char mass,
    and the top accepted doc (max n_chars, min doc_id tiebreak).
    Checkpoint-restart ≡ continuation and epoch-replay idempotence are
    pinned in tests/test_streaming_pipeline.py. Data-level."""
    import os
    import shutil
    import tempfile

    from hawk_pack_spark.streaming.pipeline import start_curation_pipeline

    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id", "text", "source", "n_chars"
    )
    n = docs.count()
    k1, k2 = n // 3, 2 * n // 3
    replays = docs.where(F.col("doc_id") < 10)
    copies = docs.where(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        "text", "source", "n_chars",
    )
    neardups = docs.where(
        (F.col("doc_id") >= 5) & (F.col("doc_id") < 10)
    ).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        F.concat(F.upper(F.col("text")), F.lit("!!")).alias("text"),
        "source", "n_chars",
    )
    b0 = docs.where(F.col("doc_id") < k1)
    b1 = docs.where(
        (F.col("doc_id") >= k1) & (F.col("doc_id") < k2)
    ).unionByName(replays)
    b2 = docs.where(F.col("doc_id") >= k2).unionByName(copies).unionByName(
        neardups
    )
    tmp = tempfile.mkdtemp(prefix="hps_q_pipeline_")
    try:
        for i, b in enumerate([b0, b1, b2]):
            b.coalesce(1).write.parquet(f"{tmp}/src/b{i}")
            # FileStreamSource orders by modification time; pin each
            # batch a minute apart so epoch order == id order by
            # CONSTRUCTION, not by write-timing luck (ADVICE r11 —
            # the near-dup gate is first-arrival-wins, and the oracle's
            # global MIN(doc_id) matches only under this arrival order)
            for root, _dirs, files in os.walk(f"{tmp}/src/b{i}"):
                for f_ in files:
                    os.utime(
                        os.path.join(root, f_), (1704067200 + 60 * i,) * 2
                    )
        q, pipe = start_curation_pipeline(
            spark,
            f"{tmp}/src/*",
            "doc_id long, text string, source string, n_chars long",
            store_dir=f"{tmp}/store",
            checkpoint_dir=f"{tmp}/ckpt",
        )
        if not q.awaitTermination(600):
            q.stop()
            raise TimeoutError("streaming_curation_pipeline exceeded 600s")
        return pipe.serve().localCheckpoint()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


STREAMING_PIPELINE_SQL = """
WITH raw AS (
  SELECT doc_id, text, source, n_chars FROM documents
  UNION ALL
  SELECT doc_id, text, source, n_chars FROM documents WHERE doc_id < 10
  UNION ALL
  SELECT doc_id + 10000000, text, source, n_chars
  FROM documents WHERE doc_id < 5
  UNION ALL
  SELECT doc_id + 20000000, upper(text) || '!!', source, n_chars
  FROM documents WHERE doc_id >= 5 AND doc_id < 10),
uniq AS (
  SELECT doc_id, MIN(text) AS text, MIN(source) AS source,
         MIN(n_chars) AS n_chars
  FROM raw GROUP BY doc_id),
canon AS (
  SELECT *, trim(regexp_replace(regexp_replace(lower(text),
    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS ckey
  FROM uniq),
keep AS (SELECT ckey, MIN(doc_id) AS kid FROM canon GROUP BY ckey),
acc AS (
  SELECT c.doc_id, c.source, c.n_chars,
         CAST(c.doc_id // 1440 AS BIGINT) AS day_id
  FROM canon c JOIN keep k ON c.ckey = k.ckey AND c.doc_id = k.kid),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY day_id, source
    ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM acc),
agg AS (
  SELECT day_id, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS sum_chars
  FROM acc GROUP BY 1, 2)
SELECT a.day_id, a.source, a.n_docs, a.sum_chars,
       r.doc_id AS top_doc_id
FROM agg a JOIN ranked r
  ON a.day_id = r.day_id AND a.source = r.source AND r.rn = 1
"""
