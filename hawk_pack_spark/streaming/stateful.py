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


def _pack_fn_factory(budget: int, order_col: str, token_col: str):
    def pack_fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (stream_key,) = key
        b, fill = state.get if state.exists else (0, 0)
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            state.update((b, fill))
            yield pd.DataFrame(
                columns=["stream", order_col, token_col, "bin_id"]
            ).astype(
                {"stream": "object", order_col: "int64",
                 token_col: "int64", "bin_id": "int64"}
            )
            return
        pdf = pd.concat(frames).sort_values(order_col, kind="mergesort")
        bins = []
        for t in pdf[token_col].to_numpy():
            if b == 0 or fill + t > budget:
                b += 1
                fill = int(t)
            else:
                fill += int(t)
            bins.append(b)
        state.update((b, fill))
        out = pdf[[order_col, token_col]].copy()
        out.insert(0, "stream", stream_key)
        out["bin_id"] = bins
        yield out

    return pack_fn


def streaming_pack(docs_stream, budget: int = 128,
                   order_col: str = "doc_id", token_col: str = "n_tokens"):
    """Streaming greedy sequence packing: docs(stream, doc_id, n_tokens)
    → same rows + bin_id, where the OPEN bin (id, fill) survives across
    micro-batches as per-key state — a restart resumes filling the same
    bin instead of fragmenting at batch boundaries. Within a batch, docs
    pack in order_col order; across batches, in arrival order (the
    streaming contract — there is no global order to sort by).

    Same greedy recurrence as operators/packing.pack_sequences, so a
    single-batch stream reproduces the batch operator exactly."""
    return docs_stream.groupBy("stream").applyInPandasWithState(
        _pack_fn_factory(budget, order_col, token_col),
        outputStructType=(
            f"stream string, {order_col} long, {token_col} long, bin_id long"
        ),
        stateStructType="bin long, fill long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _mg_fold(counters: dict, item, w: int, cap: int) -> tuple[dict, int]:
    """Weighted Misra-Gries add: insert-then-rebalance. Subtracting the
    minimum from EVERY counter when the summary overflows charges that
    minimum against all items uniformly, so the classic guarantee
    holds: true_count − undercount ≤ estimate ≤ true_count, with the
    global undercount bounded by total_decrements (≤ n/capacity)."""
    counters[item] = counters.get(item, 0) + w
    dec = 0
    while len(counters) > cap:
        m = min(counters.values())
        counters = {k: v - m for k, v in counters.items() if v - m > 0}
        dec += m
    return counters, dec


def _heavy_hitters_fn_factory(item_col: str, capacity: int, key_names):
    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            items, counts, n, d = state.get
            counters = dict(zip(list(items), list(counts)))
        else:
            counters, n, d = {}, 0, 0
        for pdf in pdfs:
            if not len(pdf):
                continue
            # NULL items are excluded by contract (documented in
            # streaming_heavy_hitters): value_counts(dropna=True) would
            # drop them from counters but a naive n_seen += len(pdf)
            # would still count them — keep both sides NULL-free so the
            # batch GROUP BY oracle (WHERE item IS NOT NULL) matches.
            vc = pdf[item_col].dropna().astype("string").value_counts()
            # deterministic per-batch fold order (MG is order-sensitive)
            for it in sorted(vc.index):
                w = int(vc[it])
                counters, dec = _mg_fold(counters, str(it), w, capacity)
                n += w
                d += dec
        ordered = sorted(counters.items())
        state.update((
            [k for k, _ in ordered], [v for _, v in ordered], n, d
        ))
        out = pd.DataFrame(
            {
                **{kn: [kv] * len(ordered) for kn, kv in zip(key_names, key)},
                "item": [k for k, _ in ordered],
                "est_count": [v for _, v in ordered],
                "n_seen": [n] * len(ordered),
                "undercount_bound": [d] * len(ordered),
            }
        )
        yield out

    return fn


def streaming_heavy_hitters(
    stream,
    group_col: str,
    item_col: str,
    capacity: int = 100,
    group_type: str = "string",
):
    """Streaming heavy hitters per group via the Misra-Gries summary
    (Misra & Gries 1982): at most ``capacity`` counters per group,
    every item with true frequency > n/capacity guaranteed present,
    and estimates within the emitted ``undercount_bound`` (total
    decrements, ≤ n/capacity) of the true count. With ``capacity`` ≥
    the group's distinct-item count the summary is EXACT (zero
    decrements) — the property the catalog row checks against the
    batch GROUP BY; the approximation bounds are pinned in pytest.

    NULL items are EXCLUDED from both the counters and ``n_seen``
    (documented contract; the paired batch oracle filters
    ``item IS NOT NULL`` to match — ADVICE r10 latent-NULL class).

    State per key is O(capacity) regardless of stream length — the
    100 TB-safe shape for "top items per key, forever". Each
    micro-batch emits the group's FULL current summary (update mode);
    the final snapshot is the rows carrying the group's maximum
    ``n_seen``. The per-batch fold processes items in sorted order, so
    a replay from the same batch splits reproduces the summary
    bit-for-bit.
    """
    fn = _heavy_hitters_fn_factory(item_col, capacity, [group_col])
    return stream.groupBy(group_col).applyInPandasWithState(
        fn,
        outputStructType=(
            f"{group_col} {group_type}, item string, est_count long, "
            "n_seen long, undercount_bound long"
        ),
        stateStructType=(
            "items array<string>, counts array<long>, n long, d long"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
