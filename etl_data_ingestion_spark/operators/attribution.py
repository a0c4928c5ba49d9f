"""Marketing-attribution and interval-coverage analytics over the
events stream — the remaining two workhorse behavioral shapes after
funnels/retention/transitions (funnel.py) and paths/streaks/RFM
(windows.py, aggregates.py): "which touch gets credit for this
purchase" and "how much wall-clock was each user actually active".

Both are single-shuffle window plans: the fact table exchanges ONCE
on user_id and every later step is frame arithmetic on the sorted
partition — no self-joins, no per-pair blowup, which is what keeps
them linear at 100 TB (the naive purchase×touch join is quadratic in
per-user event count).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from etl_data_ingestion_spark.catalog import load_table
from etl_data_ingestion_spark.plans.registry import register

LAST_TOUCH_ORACLE = """
-- Last-touch attribution: every purchase credits the user's most
-- recent STRICTLY-EARLIER non-purchase event, but only if that touch
-- happened within the 3-day lookback; otherwise the purchase is
-- 'unattributed'. Equal-timestamp touches do NOT qualify (the touch
-- must precede the decision), enforced by ordering purchases BEFORE
-- same-ts touches so the preceding-rows frame excludes them.
WITH ordered AS (
  SELECT user_id, ts, event_type, value,
         event_type = 'purchase' AS is_p,
         LAST_VALUE(
           CASE WHEN event_type <> 'purchase'
                THEN struct_pack(t_ts := ts, t_type := event_type) END
           IGNORE NULLS
         ) OVER (
           PARTITION BY user_id
           ORDER BY ts, (event_type = 'purchase') DESC, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS last_touch
  FROM events
), attributed AS (
  SELECT CASE
           WHEN last_touch IS NULL THEN 'unattributed'
           WHEN ts - last_touch.t_ts > INTERVAL 3 DAY THEN 'unattributed'
           ELSE last_touch.t_type
         END AS touch_type,
         value
  FROM ordered WHERE is_p
)
SELECT touch_type,
       COUNT(*) AS n_purchases,
       ROUND(SUM(value), 2) AS attributed_value
FROM attributed
GROUP BY touch_type
ORDER BY touch_type
"""


@register("events_attribution_last_touch", oracle=LAST_TOUCH_ORACLE)
def events_attribution_last_touch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Last-touch attribution in ONE user_id exchange: pack
    (touch_ts, touch_type) into a struct, take last(ignorenulls)
    over the preceding-rows frame, then a tiny |touch types|-sized
    aggregate. The frame orders purchases BEFORE equal-ts touches
    (ts ASC, is_purchase DESC, event_id) so a same-instant touch is
    outside the purchase's frame — "strictly earlier" holds even on
    ties, the as-of-join lesson from ADVICE round 4 applied from the
    start. The purchase×touch join formulation this replaces is
    O(per-user-events²); this is O(n log n) sort per partition and
    at 100 TB the single Exchange is the whole cost."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").asc(),
            (F.col("event_type") == "purchase").desc(),
            F.col("event_id").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("event_type") != "purchase",
        F.struct(F.col("ts").alias("t_ts"), F.col("event_type").alias("t_type")),
    )
    ordered = ev.select(
        "user_id",
        "ts",
        "value",
        (F.col("event_type") == "purchase").alias("is_p"),
        F.last(touch, ignorenulls=True).over(w).alias("last_touch"),
    )
    attributed = ordered.filter("is_p").select(
        F.when(F.col("last_touch").isNull(), F.lit("unattributed"))
        .when(
            F.col("ts") - F.col("last_touch.t_ts")
            > F.expr("INTERVAL 3 DAY"),
            F.lit("unattributed"),
        )
        .otherwise(F.col("last_touch.t_type"))
        .alias("touch_type"),
        "value",
    )
    return (
        attributed.groupBy("touch_type")
        .agg(
            F.count("*").alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("attributed_value"),
        )
        .orderBy("touch_type")
    )


COVERAGE_ORACLE = """
-- Interval-union coverage (merge overlapping intervals): each event
-- opens a 30-minute presence interval; overlapping/adjacent
-- intervals per user merge into islands (classic gaps-and-islands
-- via running max of interval end over PRECEDING rows). Reports the
-- per-user-island population: how many distinct active sessions
-- exist, their total covered hours, and the longest single island.
WITH iv AS (
  SELECT user_id, ts AS s, ts + INTERVAL 30 MINUTE AS e FROM events
), marked AS (
  SELECT user_id, s, e,
         CASE WHEN s > MAX(e) OVER (
                PARTITION BY user_id ORDER BY s, e
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
), islanded AS (
  SELECT user_id, s, e,
         SUM(new_island) OVER (
           PARTITION BY user_id ORDER BY s, e
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM marked
), islands AS (
  SELECT user_id, island, MIN(s) AS i_start, MAX(e) AS i_end
  FROM islanded GROUP BY user_id, island
)
SELECT COUNT(*) AS n_islands,
       COUNT(DISTINCT user_id) AS n_users,
       ROUND(SUM(EPOCH(i_end - i_start)) / 3600.0, 2) AS covered_hours,
       ROUND(MAX(EPOCH(i_end - i_start)) / 3600.0, 2) AS longest_hours
FROM islands
"""


@register("events_interval_union_coverage", oracle=COVERAGE_ORACLE)
def events_interval_union_coverage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Merge-overlapping-intervals in one user_id exchange: running
    MAX(interval end) over the preceding frame marks island starts,
    a running SUM numbers islands, one groupBy collapses them. The
    first island's frame is empty -> running max NULL -> `s > NULL`
    is NULL -> coalesced to 0 in BOTH engines (CASE..ELSE 0 in the
    oracle), so every user's first island is island 0. No self-join
    and no island loop: the interval-merge that SQL folklore does
    with quadratic NOT EXISTS runs here as two linear window passes
    over one sorted shuffle. The follow-up groupBy on (user_id,
    island) reuses the same hash partitioning on user_id, so AQE
    plans it shuffle-free."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("e"),
    )
    prec = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = iv.withColumn(
        "new_island",
        F.coalesce(
            (F.col("s") > F.max("e").over(prec)).cast("int"), F.lit(0)
        ),
    )
    islanded = marked.withColumn("island", F.sum("new_island").over(run))
    islands = islanded.groupBy("user_id", "island").agg(
        F.min("s").alias("i_start"), F.max("e").alias("i_end")
    )
    dur_s = F.col("i_end").cast("double") - F.col("i_start").cast("double")
    return islands.agg(
        F.count("*").alias("n_islands"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum(dur_s) / 3600.0, 2).alias("covered_hours"),
        F.round(F.max(dur_s) / 3600.0, 2).alias("longest_hours"),
    )
