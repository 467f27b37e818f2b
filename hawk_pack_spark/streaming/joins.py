"""Stream-stream interval join and watermarked streaming exact dedup.

Completes the event-time streaming surface (ingest/serve/stateful/
windows) with the two remaining relational shapes a 100 TB event
pipeline runs online:

- `attribution_join_stream`: the streaming form of the batch binned
  range join (operators/range_join.py, catalog
  `purchase_window_attribution`) — follow-up events joined to the
  purchase that precedes them within an attribution window, then
  aggregated per purchase. Spark's stream-stream inner join keeps BOTH
  sides' state bounded because the join condition bounds event time in
  both directions (pt_ts in [p_ts, p_ts + window)), so each side's
  buffer evicts as the watermark passes; the downstream per-purchase
  aggregation is keyed on an event-time window of the purchase
  timestamp, making this a CHAINED stateful pipeline (join -> windowed
  agg) emitted exactly once in append mode.
- `dedup_exact_stream`: `dropDuplicatesWithinWatermark` over arbitrary
  key columns — the streaming half of exact dedup (operators/dedup.py
  `exact_dedup`): replayed/duplicated records within the watermark
  horizon are dropped; state holds one entry per key and evicts with
  the watermark, so memory is O(keys inside the horizon), never
  O(stream).

Timestamps are second-floored (`date_trunc`) BEFORE the join so the
range arithmetic matches the batch oracle's floor(epoch(ts)) exactly —
sub-second components would otherwise flip boundary rows between the
engines. Value sums are integer micro-units (the engine-wide float
discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MICRO = 1_000_000


def attribution_join_stream(
    events_stream: DataFrame,
    *,
    time_col: str = "ts",
    user_col: str = "user_id",
    point_types: tuple[str, ...] = ("click", "view"),
    purchase_type: str = "purchase",
    window_s: int = 900,
    watermark: str = "30 minutes",
    agg_window: str = "15 minutes",
    value_col: str = "value",
) -> DataFrame:
    """Per-purchase follow-up attribution as a chained stateful stream.

    Emits (purchase_id, n_follow, sum_value_micro): for every purchase,
    the count and micro-unit value sum of the same user's point events
    (clicks/views) with second-floored timestamps in
    [purchase_sec, purchase_sec + window_s). Purchases with no
    follow-ups do not emit (inner join) — identical to the batch
    range-join row. Run with outputMode("append")."""
    pts = (
        events_stream.where(F.col("event_type").isin(*point_types))
        .select(
            F.col(user_col).alias("pt_user"),
            F.date_trunc("second", F.col(time_col)).alias("pt_ts"),
            F.round(F.col(value_col) * _MICRO).cast("long").alias("v_micro"),
        )
        .withWatermark("pt_ts", watermark)
    )
    pur = (
        events_stream.where(F.col("event_type") == purchase_type)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col(user_col).alias("p_user"),
            F.date_trunc("second", F.col(time_col)).alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    joined = pts.join(
        pur,
        (F.col("pt_user") == F.col("p_user"))
        & (F.col("pt_ts") >= F.col("p_ts"))
        & (F.col("pt_ts") < F.col("p_ts") + F.expr(f"INTERVAL {window_s} SECONDS")),
    )
    return (
        joined.groupBy(
            F.window("p_ts", agg_window).alias("pw"), F.col("purchase_id")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_follow"),
            F.sum("v_micro").alias("sum_value_micro"),
        )
        .select("purchase_id", "n_follow", "sum_value_micro")
    )


def dedup_exact_stream(
    stream: DataFrame,
    key_cols: tuple[str, ...],
    *,
    time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked streaming exact dedup: the first record per key
    within the watermark horizon survives, replays are dropped. Dedup
    state evicts as the watermark passes (dropDuplicatesWithinWatermark
    — duplicates are only guaranteed dropped while their key is inside
    the horizon; size the watermark to the replay window)."""
    return stream.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        list(key_cols)
    )
