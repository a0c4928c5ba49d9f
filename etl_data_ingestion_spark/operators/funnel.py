"""Behavioral analytics over the events stream: time-bound funnel
conversion and daily retention cohorts — the two workhorse product
queries every event warehouse serves (and the reference's BigQuery
tier would be asked for first).

Both are built on the same scale discipline as the rest of §2.5: the
fact table aggregates with map-side partials; everything user- or
cohort-sized (first-touch tables, cohort sizes) broadcasts back onto
the fact scan instead of shuffling it again.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from etl_data_ingestion_spark.catalog import load_table
from etl_data_ingestion_spark.plans.registry import register

FUNNEL_ORACLE = """
-- Time-bound funnel (view -> click within 1h -> purchase within 1h):
-- each step anchors on the user's FIRST qualifying event after the
-- previous step's anchor, the standard product-analytics semantics
-- (unordered co-occurrence would overcount; unbounded ordering makes
-- every dense user convert).
WITH v AS (
  SELECT user_id, MIN(ts) AS v_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS c_ts
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click'
    AND e.ts > v.v_ts AND e.ts <= v.v_ts + INTERVAL 1 HOUR
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS p_ts
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase'
    AND e.ts > c.c_ts AND e.ts <= c.c_ts + INTERVAL 1 HOUR
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_click,
       (SELECT COUNT(*) FROM p) AS n_purchase,
       ROUND((SELECT COUNT(*) FROM c) * 1.0 /
             (SELECT COUNT(*) FROM v), 4) AS click_rate,
       ROUND((SELECT COUNT(*) FROM p) * 1.0 /
             NULLIF((SELECT COUNT(*) FROM c), 0), 4) AS purchase_rate
"""


@register("funnel_view_click_purchase", oracle=FUNNEL_ORACLE)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step funnel with 1-hour step windows. Each stage is one
    aggregation over the events scan plus a BROADCAST of the previous
    stage's user-sized anchor table — the fact table is never
    shuffled on user_id, and the per-stage anchor tables are bounded
    by |users| regardless of event volume. (The single-pass
    window-function formulation needs events sorted per user —
    a full fact shuffle + sort; three filtered aggs with broadcast
    anchors beat it whenever |users| << |events|, which is what 100 TB
    of events looks like.)"""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .filter(
            (F.col("ts") > F.col("v_ts"))
            & (F.col("ts") <= F.col("v_ts") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .filter(
            (F.col("ts") > F.col("c_ts"))
            & (F.col("ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).alias("n_click"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_purchase"))
    return (
        nv.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(np_))
        .select(
            "n_view",
            "n_click",
            "n_purchase",
            F.round(F.col("n_click") / F.col("n_view"), 4).alias("click_rate"),
            F.round(
                F.col("n_purchase") / F.nullif(F.col("n_click"), F.lit(0)), 4
            ).alias("purchase_rate"),
        )
    )


RETENTION_ORACLE = """
-- Daily retention cohorts: users grouped by first-activity day, each
-- later active day counted at its day offset; retention = active
-- users / cohort size. Dates emitted as formatted strings (engine
-- date dtypes round-trip differently through pandas).
WITH act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), first AS (
  SELECT user_id, MIN(d) AS cohort_day FROM act GROUP BY user_id
), sizes AS (
  SELECT cohort_day, COUNT(*) AS cohort_size FROM first GROUP BY cohort_day
), ret AS (
  SELECT f.cohort_day, date_diff('day', f.cohort_day, a.d) AS day_offset,
         COUNT(DISTINCT a.user_id) AS n_active
  FROM act a JOIN first f USING (user_id)
  GROUP BY f.cohort_day, date_diff('day', f.cohort_day, a.d)
)
SELECT strftime(r.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(r.day_offset AS BIGINT) AS day_offset,
       CAST(r.n_active AS BIGINT) AS n_active,
       CAST(s.cohort_size AS BIGINT) AS cohort_size,
       ROUND(r.n_active * 1.0 / s.cohort_size, 4) AS retention
FROM ret r JOIN sizes s USING (cohort_day)
ORDER BY cohort_day, day_offset
"""


@register("retention_daily_cohorts", oracle=RETENTION_ORACLE)
def retention_daily_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic retention triangle: one distinct-(user, day) pass over
    the fact table (the only corpus-sized shuffle), then the
    user-sized first-touch table broadcasts back, and the final
    aggregate runs on |users|×|active days| rows. Cohort sizes are
    |cohorts| rows — broadcast again. At 100 TB the (user, day)
    distinct is the entire cost and it's exactly one Exchange."""
    ev = load_table(spark, sf_dir, "events")
    act = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    first = act.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    sizes = first.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    ret = (
        act.join(F.broadcast(first), "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("d", "cohort_day").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )
    return (
        ret.join(F.broadcast(sizes), "cohort_day")
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.col("day_offset").cast("long").alias("day_offset"),
            "n_active",
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.round(F.col("n_active") / F.col("cohort_size"), 4).alias(
                "retention"
            ),
        )
    )
