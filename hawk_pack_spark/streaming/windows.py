"""Event-time windowed aggregation and sessionization with watermarks.

The reference engine is an online store whose writes arrive as an
unbounded op stream (reference src/coroutine.rs:21-39); `ingest.py` and
`serve.py` render the write/read halves of that loop. This module adds
the remaining Structured-Streaming surface a 100 TB event pipeline
needs: EVENT-TIME analytics over the stream itself, with the late-data
contract made explicit.

- `windowed_event_counts`: tumbling/sliding window aggregation behind
  `withWatermark`. In append mode a window emits exactly once, when the
  watermark passes its end. Late-data contract (two-watermark semantics,
  Spark >= 3.4): a row is dropped once it is older than the PREVIOUS
  micro-batch's watermark (`watermarkForLateEvents`); eviction uses the
  current batch's watermark — so a late row landing in the very batch
  that finalizes its window is still merged, and is only guaranteed
  dropped from the next batch on (verified both ways by
  tests/test_streaming_windows.py).
- `sessionize_stream`: gap-based sessionization as a CUSTOM stateful
  operator (`applyInPandasWithState` + `EventTimeTimeout`). Sessions
  close either when a later event of the same key proves the gap, or
  when the event-time timeout fires (watermark passed last-event + gap)
  — the per-key state is the open session only, so state size is
  O(active keys), never O(events).

Scale notes (100 TB): watermarking is what BOUNDS state — window state
is evicted the moment the watermark passes, and session state holds one
open session per key. Both operators shuffle once on their grouping key
(window+group / user) with map-side partial aggregation for the window
path; there is no driver-side collection anywhere.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# double sums are shuffle-order-nondeterministic; the engine-wide
# discipline (queries/catalog.py float conventions) is to sum integer
# micro-units instead
_MICRO = 1_000_000


def windowed_event_counts(
    events_stream: DataFrame,
    *,
    time_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Watermarked event-time window counts + micro-unit value sums.

    Emits (win_start, win_end, *group_cols, n_events, sum_value_micro)
    with the window bounds as epoch seconds (parity-friendly). Run with
    `outputMode("append")`: each window row is final when emitted."""
    win = F.window(time_col, window, slide or window)
    return (
        events_stream.withWatermark(time_col, watermark)
        .groupBy(win.alias("win"), *[F.col(c) for c in group_cols])
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(
                F.round(F.col(value_col) * _MICRO).cast("long")
            ).alias("sum_value_micro"),
        )
        .select(
            F.col("win.start").cast("long").alias("win_start"),
            F.col("win.end").cast("long").alias("win_end"),
            *group_cols,
            "n_events",
            "sum_value_micro",
        )
    )


def _sessionize_fn_factory(gap_ms: int):
    def fn(key, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (user_id,) = key
        out_cols = {
            "user_id": "int64", "sess_start": "int64",
            "sess_end": "int64", "n_events": "int64",
        }

        def emit(rows):
            if not rows:
                return pd.DataFrame(
                    {c: pd.Series(dtype=t) for c, t in out_cols.items()}
                )
            return pd.DataFrame(rows, columns=list(out_cols))

        if state.hasTimedOut:
            start_ms, end_ms, n = state.get
            state.remove()
            yield emit([(user_id, start_ms // 1000, end_ms // 1000, n)])
            return

        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            yield emit([])
            return
        pdf = pd.concat(frames).sort_values("ts", kind="mergesort")
        # epoch millis; floor to seconds to match the batch oracle's
        # floor(epoch(ts)) gap arithmetic exactly
        ts_ms = (
            pdf["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
            // 1_000_000_000
            * 1000
        )
        sessions = []
        if state.exists:
            start_ms, end_ms, n = state.get
        else:
            start_ms, end_ms, n = ts_ms[0], ts_ms[0], 0
        # Admitted-late events (watermark > 0): an event with
        # t <= end_ms arrived after a later event was already folded
        # into the open session. It MERGES into the open session —
        # end_ms never regresses and the gap test runs against the
        # session's true max end (ADVICE r6: `end_ms = t`
        # unconditionally moved the open session's end BACKWARDS, so a
        # subsequent event could be wrongly split into a new session).
        # An in-horizon late event that preceded the open session's
        # start merges too (start extends back): retro-splitting a
        # closed-gap prefix would need buffering the whole horizon in
        # state; within a watermark's slack this matches batch
        # semantics, which sort all events before gap-scanning.
        for t in ts_ms:
            if n > 0 and t - end_ms > gap_ms:
                sessions.append(
                    (user_id, start_ms // 1000, end_ms // 1000, n)
                )
                start_ms, end_ms, n = t, t, 0
            start_ms = min(start_ms, t)
            end_ms = max(end_ms, t)
            n += 1
        state.update((int(start_ms), int(end_ms), int(n)))
        # the open session closes when the watermark passes its end +
        # gap; the timestamp must stay ahead of the current watermark
        # (keys whose last event is already older than wm - gap close
        # at the next batch boundary)
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(int(end_ms) + gap_ms, wm + 1))
        yield emit(sessions)

    return fn


def sessionize_stream(
    events_stream: DataFrame,
    *,
    time_col: str = "ts",
    key_col: str = "user_id",
    gap_seconds: int = 1800,
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming gap-sessionization: events(user_id, ts, ...) →
    closed sessions (user_id, sess_start, sess_end, n_events), epoch
    seconds. A single-pass stream whose watermark ends past every
    event + gap reproduces batch gap-sessionization exactly
    (tests/test_streaming_windows.py).

    Late-data contract (``watermark`` > 0): an admitted-late event
    merges into the key's OPEN session — extending its start backwards
    if needed, never regressing its end — exactly what batch
    sessionization (which sorts before gap-scanning) would do when the
    late event falls inside the open session's span. A late event that
    would retro-split an already-emitted earlier session is beyond any
    single-pass stream (append-mode rows are final); events older than
    the watermark are dropped by Spark before the state function."""
    stream = events_stream.select(
        F.col(key_col).alias("user_id"), F.col(time_col).alias("ts")
    ).withWatermark("ts", watermark)
    return stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn_factory(gap_seconds * 1000),
        outputStructType=(
            "user_id long, sess_start long, sess_end long, n_events long"
        ),
        stateStructType="start_ms long, end_ms long, n long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
