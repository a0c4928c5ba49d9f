"""Registry entries for the streaming transformations, run in batch
mode over the events fixture so the DuckDB oracle can check the same
plan the streaming tests run incrementally (tests/test_streaming.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from etl_data_ingestion_spark.catalog import load_table
from etl_data_ingestion_spark.plans.registry import register
from etl_data_ingestion_spark.streaming import (
    dedup_first_event,
    session_aggregate,
    sliding_counts,
    tumbling_counts,
)

TUMBLING_ORACLE = """
SELECT STRFTIME(TIME_BUCKET(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS events,
       ROUND(SUM(value), 2) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


@register("stream_tumbling_hourly", oracle=TUMBLING_ORACLE)
def stream_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return tumbling_counts(events)


SLIDING_ORACLE = """
WITH assigned AS (
  SELECT TIME_BUCKET(INTERVAL 30 MINUTE, ts) - k.off * INTERVAL 30 MINUTE AS wstart
  FROM events
  CROSS JOIN (VALUES (0), (1)) AS k(off)
)
SELECT STRFTIME(wstart, '%Y-%m-%d %H:%M:%S') AS window_start,
       STRFTIME(wstart + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,
       COUNT(*) AS events
FROM assigned
GROUP BY wstart
ORDER BY wstart
"""


@register("stream_sliding_hourly_30m", oracle=SLIDING_ORACLE)
def stream_sliding_hourly_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1h windows sliding every 30m: each event belongs to exactly 2
    windows; the oracle materializes that assignment explicitly."""
    events = load_table(spark, sf_dir, "events")
    return sliding_counts(events)


SESSION_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id,
       STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       COUNT(*) AS events_in_session
FROM numbered
GROUP BY user_id, session_no
ORDER BY user_id, session_start
"""


@register("stream_session_window_30m", oracle=SESSION_ORACLE)
def stream_session_window_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window(gap=30m) per user; the oracle is the equivalent
    gaps-and-islands rewrite (a new session starts when the gap from
    the previous event reaches the 30m gap — session_window treats an
    event exactly at the session end as outside it)."""
    events = load_table(spark, sf_dir, "events")
    return session_aggregate(events)


DEDUP_ORACLE = """
SELECT event_id, user_id, event_type
FROM (
  SELECT event_id, user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY event_id
"""


@register("stream_dedup_first_event", oracle=DEDUP_ORACLE)
def stream_dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        dedup_first_event(events)
        .select("event_id", "user_id", "event_type")
    )


STATEFUL_SESSIONS_ORACLE = """
-- Batch-equivalence oracle for the stateful streaming sessionizer:
-- gaps-and-islands sessions (30-min gap, gap measured from the
-- session's LAST event, strict >). Emitted = every session CLOSED by
-- a later event, plus each user's final session IF the event-time
-- timeout fired for it — i.e. its timeout timestamp (last event +
-- gap) fell strictly below the final watermark (global max ts - 2h
-- watermark delay). Final sessions still open at end-of-replay stay
-- in state and are not emitted.
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), sess AS (
  SELECT user_id, ts,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
), agg AS (
  SELECT user_id, sid,
         MIN(ts) AS session_start, MAX(ts) AS session_end,
         COUNT(*) AS n_events
  FROM sess GROUP BY user_id, sid
)
SELECT user_id,
       STRFTIME(session_start, '%Y-%m-%d %H:%M:%S') AS session_start,
       STRFTIME(session_end, '%Y-%m-%d %H:%M:%S') AS session_end,
       n_events
FROM agg
WHERE sid < (SELECT MAX(sid) FROM agg a2 WHERE a2.user_id = agg.user_id)
   OR session_end + INTERVAL 30 MINUTE
      < (SELECT MAX(ts) - INTERVAL 2 HOUR FROM events)
ORDER BY user_id, session_start
"""


@register("stream_stateful_sessions", oracle=STATEFUL_SESSIONS_ORACLE)
def stream_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState session tracker, driven END-TO-END as a
    real incremental stream (readStream → stateful op → memory sink,
    availableNow trigger) and returned as the materialized result.
    The one queries() entry that exercises actual streaming execution
    + state store, not a batch analogue. The oracle is the
    gaps-and-islands batch equivalent restricted to CLOSED sessions
    (see STATEFUL_SESSIONS_ORACLE)."""
    import os

    from etl_data_ingestion_spark.operators.sources_scan import _scratch
    from etl_data_ingestion_spark.streaming import sessionize_stateful

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    src = _scratch(sf_dir, "events_us")
    # _SUCCESS marker, not bare existence: a crashed partial write
    # must not be reused as a source
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        events.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        sessionize_stateful(stream, gap_minutes=30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("stream_stateful_sessions_out")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return (
        spark.table("stream_stateful_sessions_out")
        .select(
            "user_id",
            F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )


INTERVAL_JOIN_ORACLE = """
SELECT p.event_id AS p_id,
       p.user_id  AS p_user,
       STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS p_ts,
       v.event_id AS v_id,
       STRFTIME(v.ts, '%Y-%m-%d %H:%M:%S') AS v_ts
FROM events p
JOIN events v
  ON p.event_type = 'purchase' AND v.event_type = 'view'
 AND p.user_id = v.user_id
 AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 30 MINUTE
ORDER BY p_id, v_id
"""


@register("stream_interval_join", oracle=INTERVAL_JOIN_ORACLE)
def stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase↔view interval join — the batch face of the
    watermarked stream-stream join (same function runs incrementally
    in tests/test_streaming.py::test_stream_stream_interval_join with
    state eviction via the watermark + time-bound pair)."""
    from etl_data_ingestion_spark.streaming import purchase_view_interval_join

    events = load_table(spark, sf_dir, "events")
    joined = purchase_view_interval_join(
        events.filter(F.col("event_type") == "purchase"),
        events.filter(F.col("event_type") == "view"),
    )
    return joined.select(
        "p_id",
        "p_user",
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("p_ts"),
        "v_id",
        F.date_format("v_ts", "yyyy-MM-dd HH:mm:ss").alias("v_ts"),
    )


LATE_DATA_ORACLE = """
-- Watermark late-data accounting, batch analogue: arrival order is
-- the event_id sequence within each event_type (the per-partition
-- ordering a log source guarantees); the watermark trails the
-- running-max event time by 30 minutes; a row older than the
-- watermark at its arrival is late and would be dropped by a
-- streaming aggregate. The real behavior (GLOBAL watermark at
-- micro-batch granularity) is proven against an actual
-- withWatermark stream in tests/test_streaming.py; this row-level
-- analogue is the audit query a pipeline runs to size its watermark
-- delay against observed out-of-orderness.
WITH arrivals AS (
  -- the fixture stream is perfectly ordered (zero late rows), which
  -- would leave the late path untested; plant deterministic
  -- stragglers: every 97th event re-arrives at the END of the stream
  -- (event_id + 10000000) carrying its ORIGINAL event time
  SELECT event_id, event_type, ts FROM events
  UNION ALL
  SELECT event_id + 10000000, event_type, ts FROM events
  WHERE event_id % 97 = 0
), seq AS (
  SELECT event_type, ts,
         MAX(ts) OVER (PARTITION BY event_type ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS high_water
  FROM arrivals
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN ts < high_water - INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       ROUND(SUM(CASE WHEN ts < high_water - INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4) AS late_frac
FROM seq
GROUP BY event_type
"""


@register("stream_late_data_accounting", oracle=LATE_DATA_ORACLE)
def stream_late_data_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data accounting under a 30-minute watermark: per
    event_type, how many rows arrived behind the running-max event
    time by more than the delay — i.e. would be DROPPED by the
    streaming aggregate — and the late fraction. This is the query
    that answers "is 30 minutes enough watermark for this source?"
    from history. One shuffle (window on event_type) + one aggregate
    on the same key, so the second aggregate needs no exchange. At
    100 TB the per-key sort is the cost; the streaming engine itself
    tracks the watermark in O(1) state (streaming/windows.py) — this
    batch analogue exists for delay sizing and audits."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts"
    )
    stragglers = events.filter(F.col("event_id") % 97 == 0).select(
        (F.col("event_id") + 10000000).alias("event_id"), "event_type", "ts"
    )
    arrivals = events.unionByName(stragglers)
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    high_water = F.max("ts").over(w)
    late = F.col("ts") < high_water - F.expr("INTERVAL 30 MINUTES")
    flagged = arrivals.select(
        "event_type", F.when(late, 1).otherwise(0).alias("is_late")
    )
    n, nl = F.count(F.lit(1)), F.sum("is_late")
    return flagged.groupBy("event_type").agg(
        n.alias("n_events"),
        nl.cast("long").alias("n_late"),
        F.round(nl / n, 4).alias("late_frac"),
    )


STATIC_ENRICH_ORACLE = """
-- Stream-static enrichment: events joined to the static customer
-- dimension (user_id = c_custkey), daily windowed spend per nation.
-- The Spark transform is shared verbatim between this batch-analogue
-- and the genuine readStream drive in tests/test_streaming.py, so
-- the driver value-checks the same logic the stream executes.
SELECT STRFTIME(date_trunc('day', e.ts), '%Y-%m-%d') AS day,
       c.c_nationkey,
       COUNT(*)                  AS events,
       ROUND(SUM(e.value), 2)    AS total_value
FROM events e JOIN customer c ON c.c_custkey = e.user_id
GROUP BY 1, 2
ORDER BY day, c_nationkey
"""


@register("stream_static_enrichment", oracle=STATIC_ENRICH_ORACLE)
def stream_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static dimension enrichment (the lookup-join every
    streaming pipeline runs): static side broadcasts, so the stream
    is never shuffled on the join key; windowed aggregation follows.
    Batch-analogue of streaming/windows.py::static_enriched_spend —
    the SAME function handles the streaming frame (watermarked) and
    this batch frame; test_streaming.py proves incremental execution
    matches batch."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    from etl_data_ingestion_spark.streaming.windows import (
        static_enriched_spend,
    )

    out = static_enriched_spend(events, customer)
    return out.select(
        F.date_format(F.col("win.start"), "yyyy-MM-dd").alias("day"),
        "c_nationkey",
        "events",
        "total_value",
    )


WINDOWED_TOPK_ORACLE = """
-- Top-3 event types per tumbling hour by count, deterministic
-- tie-break — the leaderboard pattern every ops dashboard streams.
-- In streaming mode the per-(window,type) aggregate is the
-- watermark-bounded state (domain-sized per window) and the rank
-- runs on finalized windows; this batch registration checks the
-- identical end-to-end composition.
WITH counts AS (
  SELECT STRFTIME(TIME_BUCKET(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S')
           AS window_start,
         event_type, COUNT(*) AS events
  FROM events GROUP BY 1, 2
), ranked AS (
  SELECT window_start, event_type, events,
         ROW_NUMBER() OVER (PARTITION BY window_start
                            ORDER BY events DESC, event_type) AS rnk
  FROM counts
)
SELECT window_start, event_type, events, CAST(rnk AS BIGINT) AS rnk
FROM ranked WHERE rnk <= 3
ORDER BY window_start, rnk
"""


@register("stream_windowed_topk", oracle=WINDOWED_TOPK_ORACLE)
def stream_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly top-3 event-type leaderboard: streaming tumbling
    counts (bounded state: |event types| rows per open window)
    composed with a finalized-window rank — batch-registered here so
    the oracle checks the same composition the streaming test drives
    incrementally (tests/test_streaming.py::test_windowed_topk)."""
    from etl_data_ingestion_spark.streaming import windowed_topk

    ev = load_table(spark, sf_dir, "events")
    return windowed_topk(ev, k=3).orderBy("window_start", "rnk")


OUTER_INTERVAL_ORACLE = """
-- LEFT OUTER interval join, batch analogue: per-purchase count of
-- same-user views in the preceding 30 minutes, histogrammed — the
-- n_views = 0 bucket is exactly the population the inner interval
-- join silently drops (purchases with no preceding view), which is
-- the question the outer variant exists to answer. The streaming
-- face (watermarked left-outer stream-stream join with NULL
-- emission on watermark passage) runs in
-- tests/test_streaming.py::test_stream_stream_left_outer_join.
WITH p AS (
  SELECT event_id AS p_id, user_id AS p_user, ts AS p_ts
  FROM events WHERE event_type = 'purchase'
), v AS (
  SELECT user_id AS v_user, ts AS v_ts
  FROM events WHERE event_type = 'view'
), per_purchase AS (
  SELECT p.p_id, COUNT(v.v_ts) AS n_views
  FROM p LEFT JOIN v
    ON v.v_user = p.p_user
   AND v.v_ts <= p.p_ts
   AND v.v_ts >= p.p_ts - INTERVAL 30 MINUTE
  GROUP BY p.p_id
)
SELECT CAST(n_views AS BIGINT) AS n_views,
       COUNT(*) AS n_purchases
FROM per_purchase
GROUP BY n_views
ORDER BY n_views
"""


@register("stream_outer_interval_join", oracle=OUTER_INTERVAL_ORACLE)
def stream_outer_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER purchase<-view interval join (batch face), reduced
    to the per-purchase view-count histogram: the n_views = 0 bucket
    is the population the INNER interval join silently drops. The
    same helper runs as a watermarked left-outer stream-stream join
    (NULL emission gated on watermark passage — state eviction is
    the completeness proof) in tests/test_streaming.py.

    Plan: both sides one events pass; the range join shuffles on
    user_id (co-partitioned); the histogram is two tiny rollups. At
    100 TB the per-user view lists bound the join fan-out, and the
    streaming face holds only the 30-minute window + 1 hour
    watermark of state per user."""
    from etl_data_ingestion_spark.streaming import (
        purchase_view_interval_join_outer,
    )

    events = load_table(spark, sf_dir, "events")
    joined = purchase_view_interval_join_outer(
        events.filter(F.col("event_type") == "purchase"),
        events.filter(F.col("event_type") == "view"),
    )
    return (
        joined.groupBy("p_id")
        .agg(F.count("v_ts").alias("n_views"))
        .groupBy("n_views")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
        .orderBy("n_views")
    )
