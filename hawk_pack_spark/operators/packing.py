"""Greedy sequence packing: assign documents to fixed-token-budget bins.

The last pre-tokenization stage of a training pipeline: documents are
concatenated into context-window-sized sequences, and the packing
decision ("does this doc still fit in the open bin?") is inherently
sequential within a stream. The standard scale practice is to pack
WITHIN each shard/stream independently (perfect global packing is a
bin-packing problem nobody solves at corpus scale; per-stream greedy
loses a few percent of fill and parallelizes embarrassingly).

Spark rendering: ``applyInPandas`` over the stream key — the per-group
recurrence runs as a vectorized-ingest Python kernel (Arrow batches in,
one pass over a sorted numpy array), while groups themselves fan out
across executors. This is the documented use-case where built-in
DataFrame ops genuinely cannot express the semantics (a running total
with conditional reset is not a window function).

Greedy rule (order fixed by ``order_col``): keep an open bin with
``fill`` tokens; a doc of ``t`` tokens joins it when ``fill + t <=
budget``, else closes it and opens a new bin holding the doc (docs
longer than the budget therefore occupy a bin alone — callers chunk
oversized docs upstream if truncation is not acceptable).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    budget: int,
    group_col: str = "lang",
    order_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """(group, order, tokens) -> same rows + ``bin_id`` (1-based per group).

    Input must carry an integer ``token_col``; output preserves the three
    input columns and appends ``bin_id``.
    """
    schema = (
        f"{group_col} string, {order_col} long, {token_col} long, bin_id long"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        toks = pdf[token_col].to_numpy()
        bins = []
        fill = 0
        b = 0
        for t in toks:
            if b == 0 or fill + t > budget:
                b += 1
                fill = int(t)
            else:
                fill += int(t)
            bins.append(b)
        out = pdf[[group_col, order_col, token_col]].copy()
        out["bin_id"] = bins
        return out

    sel = docs.select(group_col, order_col, token_col)
    return sel.groupBy(group_col).applyInPandas(pack, schema=schema)


def pack_reference(rows: Iterable[tuple[int, int]], budget: int) -> list[int]:
    """Plain-python greedy oracle for tests: [(order, tokens)] -> bin ids
    in order-sorted sequence. Mirrors ``pack`` exactly."""
    bins = []
    fill = 0
    b = 0
    for _, t in sorted(rows):
        if b == 0 or fill + t > budget:
            b += 1
            fill = t
        else:
            fill += t
        bins.append(b)
    return bins


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int,
    overlap: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-size token-window chunking with optional overlap — the
    windowing stage BEFORE packing: long documents become
    ``chunk_tokens``-sized pieces whose starts step by
    ``chunk_tokens − overlap``, so consecutive chunks share ``overlap``
    tokens of context (the standard pretraining / RAG-ingest split).

    Pure column algebra, zero Python: tokenize once, explode a
    `sequence()` of chunk starts (stride arithmetic — no window
    function, no per-row UDF), `slice` + `array_join` per chunk. The
    fan-out per document is ceil(n_tokens/stride) rows — bounded by
    document length, never corpus size, so the operator is a flat map
    at 100 TB. A document shorter than one chunk yields exactly one
    chunk (itself); the final partial chunk is kept (standard:
    truncation is the packer's decision, not the chunker's).

    Returns (id, chunk_id, chunk_text, n_tokens) with chunk_id 0-based
    in token order; deterministic for oracle hashing.
    """
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})"
        )
    from hawk_pack_spark.functions.text import tokens

    stride = chunk_tokens - overlap
    toks = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_ts")
    ).withColumn("_n", F.size("_ts"))
    # chunk starts: 0, stride, 2*stride, …, while start ≤ n−overlap−1 —
    # the −overlap excludes a trailing chunk that would be fully
    # contained in its predecessor (every chunk must contribute ≥1 new
    # token); the greatest(…, 0) keeps empty docs as one empty chunk
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.col("_n") - overlap - 1, F.lit(0)),
        F.lit(stride),
    )
    exploded = toks.select(
        F.col(id_col), "_ts", "_n",
        F.posexplode(starts).alias("chunk_id", "_start"),
    )
    piece = F.slice(F.col("_ts"), F.col("_start") + 1, F.lit(chunk_tokens))
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.least(
            F.lit(chunk_tokens), F.col("_n") - F.col("_start")
        ).cast("long").alias("n_tokens"),
    )
