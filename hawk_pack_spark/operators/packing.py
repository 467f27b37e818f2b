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
