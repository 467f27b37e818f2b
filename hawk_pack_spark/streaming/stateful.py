"""Custom stateful streaming operators via applyInPandasWithState.

The reference's engine holds per-entity state (the evolving graph)
behind async store calls; Structured Streaming's arbitrary-state API is
the Spark rendering for per-key custom state. Two operators:

- running_user_stats: per-user cumulative event count / value sum,
  emitting one updated row per key per micro-batch.
- stateful_seen_filter: per-key exact dedup across the whole stream —
  only first-seen payloads pass (the streaming form of
  insert-unless-match with threshold 0).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _running_stats_fn(
    key, pdfs: Iterable[pd.DataFrame], state: GroupState
):
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_value": [round(total, 6)]}
    )


def running_user_stats(events_stream):
    """events(user_id, value) stream → per-user cumulative (n, sum)."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _running_stats_fn,
        outputStructType="user_id long, n_events long, sum_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _seen_filter_fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
    (code,) = key
    first_seen = not state.exists
    n_new = 0
    for pdf in pdfs:
        n_new += len(pdf)
    if first_seen:
        state.update((1,))
        yield pd.DataFrame({"code": [code], "n_dropped_dups": [n_new - 1]})
    else:
        state.update((1,))
        yield pd.DataFrame(columns=["code", "n_dropped_dups"]).astype(
            {"code": "int64", "n_dropped_dups": "int64"}
        )


def stateful_seen_filter(codes_stream):
    """codes(code) stream → first-seen codes only, with a count of the
    duplicates dropped alongside (exact streaming dedup)."""
    return codes_stream.groupBy("code").applyInPandasWithState(
        _seen_filter_fn,
        outputStructType="code long, n_dropped_dups long",
        stateStructType="seen int",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
