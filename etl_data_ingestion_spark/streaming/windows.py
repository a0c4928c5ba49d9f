"""Streaming window transformations (SURVEY.md §2.5 streaming row).

Each function is mode-agnostic: pass a batch DataFrame and it runs as
a normal aggregation (the registry's oracle-checked path); pass a
``readStream`` DataFrame and the same plan runs incrementally with
watermark-managed state (exercised in tests/test_streaming.py).

This is the engine's replacement for the reference's at-most-once
INBOX-label commit (main.py:630-645): checkpointed streaming gives
exactly-once state updates, and the watermark bounds how much state a
100 TB/day stream accumulates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def tumbling_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts/sums per event_type. Late rows beyond the
    watermark are dropped instead of reopening finalized windows."""
    src = events
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window_len).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window_len: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding windows: each event lands in len/slide overlapping
    windows — state is len/slide × tumbling, which is why slide should
    stay a small fraction of length at scale."""
    src = events
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window_len, slide).alias("win"))
        .agg(F.count(F.lit(1)).alias("events"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.date_format("win.end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
            "events",
        )
    )


def session_aggregate(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Data-driven session windows per user: a session absorbs events
    arriving within ``gap`` of its current end; state closes once the
    watermark passes the gap."""
    src = events
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("events_in_session"))
        .select(
            "user_id",
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "events_in_session",
        )
    )


def dedup_first_event(
    events: DataFrame,
    keys: list[str] = ("user_id", "event_type"),
    watermark: str = "2 hours",
) -> DataFrame:
    """First event per key.

    Streaming mode: dropDuplicatesWithinWatermark — bounded state,
    arrival-order "first", the streaming analogue of the reference's
    process-once INBOX-label commit. Batch mode: the deterministic
    event-time first via row_number (dropDuplicates' kept row is
    arbitrary under parallel scan — never rely on it for parity).
    """
    keys = list(keys)
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            keys
        )
    w = Window.partitionBy(*keys).orderBy("ts", "event_id")
    return (
        events.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def purchase_view_interval_join(
    purchases: DataFrame, views: DataFrame, window_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream interval join: each purchase joined to the same
    user's view events in the preceding window. In streaming mode BOTH
    sides carry watermarks and the time-bound condition — that pair is
    what lets the state store evict buffered rows (an unbounded
    stream-stream join would hold both streams forever). Batch mode:
    identical plan semantics, ordinary range join."""
    p = purchases.select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    v = views.select(
        F.col("event_id").alias("v_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    if p.isStreaming:
        p = p.withWatermark("p_ts", watermark)
    if v.isStreaming:
        v = v.withWatermark("v_ts", watermark)
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {window_minutes} MINUTES"))
    )
    return p.join(v, cond).select("p_id", "p_user", "p_ts", "v_id", "v_ts")


def static_enriched_spend(
    events: DataFrame,
    customer: DataFrame,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static enrichment: join the (possibly streaming) event
    stream to the STATIC customer dimension (broadcast — stream-static
    joins never shuffle the stream side on the join key), then
    windowed per-nation spend. Works identically on a batch frame,
    which is how the oracle checks it; tests/test_streaming.py drives
    the genuine incremental execution."""
    src = events
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    dim = customer.select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    return (
        src.join(F.broadcast(dim), "user_id")
        .groupBy(F.window("ts", "1 day").alias("win"), "c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


def windowed_topk(
    events: DataFrame,
    k: int = 3,
    window_len: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Top-k event types per tumbling window by count.

    Streaming mode returns the per-(window, type) counts — rank over
    a streaming aggregate is not expressible in append mode, so the
    k-selection runs on FINALIZED windows downstream (foreachBatch /
    sink-side; tests/test_streaming.py drives exactly that split and
    checks it equals the batch plan). Batch mode applies the rank
    in-plan with a full deterministic tie-break; state per window is
    |event types|, so streaming state is domain-bounded regardless
    of throughput.
    """
    src = events
    if src.isStreaming:
        src = src.withWatermark("ts", watermark)
    counts = (
        src.groupBy(F.window("ts", window_len).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("events"))
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "events",
        )
    )
    if events.isStreaming:
        return counts
    return rank_topk(counts, k)


def rank_topk(counts: DataFrame, k: int = 3) -> DataFrame:
    """The finalize step of windowed_topk: rank finalized per-window
    counts and keep the top k (count desc, event_type tiebreak)."""
    w = Window.partitionBy("window_start").orderBy(
        F.desc("events"), "event_type"
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("window_start", "event_type", "events", F.col("rnk").cast("long").alias("rnk"))
    )


def purchase_view_interval_join_outer(
    purchases: DataFrame, views: DataFrame, window_minutes: int = 30,
    watermark: str = "1 hour",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every purchase emits —
    with its in-window views, or with NULL view columns once the
    watermark proves no view can still arrive. The outer variant is
    the one that answers 'which purchases had NO preceding view?'
    (the inner join silently drops them). In streaming mode the
    unmatched row can only be emitted when the watermark passes
    p_ts + 0 (the end of the join window): state eviction IS the
    completeness proof. Batch mode: ordinary left range join."""
    p = purchases.select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    v = views.select(
        F.col("event_id").alias("v_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
    )
    if p.isStreaming:
        p = p.withWatermark("p_ts", watermark)
    if v.isStreaming:
        v = v.withWatermark("v_ts", watermark)
    cond = (
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (
            F.col("v_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {window_minutes} MINUTES")
        )
    )
    return p.join(v, cond, "left_outer").select(
        "p_id", "p_user", "p_ts", "v_id", "v_ts"
    )
