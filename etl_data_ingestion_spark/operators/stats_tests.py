"""Wave-18 statistical tests: Kruskal-Wallis, Benjamini-Hochberg FDR,
Wald-Wolfowitz runs test, PACF (Durbin-Levinson), Cochran-Armitage
trend.

These extend the §2.5 analytics layer (SURVEY.md) with the remaining
textbook inference tools an experimentation/data-quality platform
runs at warehouse scale. The shared discipline of the earlier stats
waves applies throughout:

- facts collapse to a tiny domain (groups / nations / days) in ONE
  map-side-combined aggregation; all test math runs on that domain;
- every sufficient statistic is an exact integer sum (cents, counts,
  rank*2 so tie-averaged ranks stay integral) — order-free in both
  engines — and anything that can exceed int64 is summed WIDE
  (DECIMAL(38,0) in Spark, HUGEINT naturally in DuckDB);
- the final scalar chain is written as the SAME fixed-order IEEE
  expression in the operator and its oracle, snapped with the floor
  device at a fixed scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from etl_data_ingestion_spark.catalog import load_table
from etl_data_ingestion_spark.functions.numeric import snap
from etl_data_ingestion_spark.plans.registry import register

# ------------------------------------------------- Kruskal-Wallis H

KRUSKAL_ORACLE = """
-- Kruskal-Wallis H: do order totals differ in DISTRIBUTION across
-- the five order priorities? The k-group generalization of the
-- Mann-Whitney operator (same 2x-scaled tie-averaged integer rank
-- device: per distinct cent value, avg rank = (2*cum_before+t+1)/2,
-- kept at 2x so every rank sum is exact BIGINT). Per-group squared
-- rank-sum terms are NORMALIZED BY N before snapping —
-- term_g = 100 * r2g^2 / (ng * N), magnitude ~100*ng*N, inside
-- int64 to ~sf300 where the unnormalized 1e-4-scale form already
-- tops int64 at sf0.3 (caught by the round-9 multi-scale sweep:
-- DuckDB's CAST raised while Spark's floor-to-long wrapped — the
-- exact silent-vs-loud divergence the sweep exists to find). With
-- e100 = sum(term_g), H = 0.03 * e100/(N+1) - 3(N+1): one
-- fixed-order scalar chain on cross-engine-identical integers
-- (the snap costs |H error| <= 0.075/(N+1) — below the 1e-6 output
-- snap for every fixture beyond sf0.01, and deterministic
-- everywhere since all engines share the snapped integers). Tie
-- correction from sum(t^3 - t), a wide integer sum.
WITH s AS (
  SELECT o_orderpriority AS g,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
  FROM orders
), byv AS (
  SELECT v, COUNT(*) AS t FROM s GROUP BY v
), ranked AS (
  SELECT v, t,
         2 * (SUM(t) OVER (ORDER BY v) - t) + t + 1 AS ar2
  FROM byv
), gv AS (
  SELECT g, v, COUNT(*) AS tg FROM s GROUP BY g, v
), rg AS (
  SELECT g, CAST(SUM(tg) AS BIGINT) AS ng,
         CAST(SUM(tg * ar2) AS BIGINT) AS r2g
  FROM gv JOIN ranked USING (v) GROUP BY g
), tot AS (
  SELECT COUNT(*) AS k,
         CAST(SUM(ng) AS BIGINT) AS n,
         (SELECT SUM(CAST(t * t * t - t AS BIGINT)) FROM byv) AS tie
  FROM rg
), e AS (
  SELECT SUM(CAST(FLOOR(r2g * 1.0 * r2g / ng / (SELECT n FROM tot) * 100
                        + 0.5) AS BIGINT)) AS e100
  FROM rg
), h AS (
  SELECT n, k, tie,
         0.03 * (e100 / (n + 1.0)) - 3.0 * (n + 1) AS hstat
  FROM tot, e
)
SELECT CAST(n AS BIGINT) AS n_orders,
       CAST(k AS BIGINT) AS n_groups,
       FLOOR(hstat * 1000000 + 0.5) / 1000000 AS h_stat,
       FLOOR(hstat / (1 - tie * 1.0 / (n * 1.0 * n * n - n))
             * 1000000 + 0.5) / 1000000 AS h_corrected
FROM h
"""


@register("agg_kruskal_wallis", oracle=KRUSKAL_ORACLE)
def agg_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H across the 5 order priorities (see oracle).

    Scale shape: one fact pass to per-(group, cent-value) counts;
    ranks computed on the |distinct cents| domain (single window
    sort of an already-aggregated table — at 100 TB, distinct cents
    of a bounded price column is ~1e7 rows, not fact-sized; past
    ~1e8 distinct values the two-pass partition-offset rank from
    agg_exact_percentiles is the drop-in replacement for the
    unpartitioned running sum); then a k-row reduction.
    H = 12/(N(N+1)) * sum(R_g^2/n_g) - 3(N+1), written exactly as
    the oracle's chain (the 2x rank scale folds into e4i's /4).

    Round-10 restructure (floor-decomposition catch: the previous
    byv/gv/tie/tot/e crossJoin lattice re-scanned the fact table
    twice and submitted 19 AQE jobs for a 1-row answer): ONE fact
    exchange to (g, v) counts; the per-value table derives FROM it;
    the tie total rides the SAME single-partition window sort as the
    ranks (full-frame sum); N rides a 5-row window — a single
    lineage, no crossJoins, no repeated scans."""
    o = load_table(spark, sf_dir, "orders", parallel=True)
    s = o.select(
        F.col("o_orderpriority").alias("g"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("v"),
    )
    gv = s.groupBy("g", "v").agg(F.count(F.lit(1)).alias("tg"))
    byv = gv.groupBy("v").agg(F.sum("tg").cast("long").alias("t"))
    w_upto = Window.orderBy("v").rangeBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("v").rangeBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = F.col("t")
    ranked = byv.select(
        "v",
        (2 * (F.sum("t").over(w_upto) - t) + t + 1).alias("ar2"),
        F.sum((t * t * t - t).cast("decimal(38,0)"))
        .over(w_all)
        .alias("tie"),
    )
    rg = (
        gv.join(ranked, "v")
        .groupBy("g")
        .agg(
            F.sum("tg").cast("long").alias("ng"),
            F.sum(F.col("tg") * F.col("ar2")).cast("long").alias("r2g"),
            F.max("tie").alias("tie"),
        )
    )
    w_groups = Window.partitionBy(F.lit(1))
    rg2 = rg.withColumn("n", F.sum("ng").over(w_groups))
    # term normalized by N BEFORE snapping (round-9 sweep catch: the
    # unnormalized 1e-4-scale term tops int64 at sf0.3 — DuckDB's
    # CAST raised, Spark's floor-to-long wrapped silently); magnitude
    # ~100*ng*N keeps the snapped integer exact to ~sf300
    term = F.floor(
        F.col("r2g") * 1.0 * F.col("r2g") / F.col("ng") / F.col("n") * 100
        + F.lit(0.5)
    ).cast("decimal(38,0)")
    tot = rg2.agg(
        F.count(F.lit(1)).alias("k"),
        F.max("n").cast("long").alias("n"),
        F.max("tie").alias("tie"),
        F.sum(term).alias("e100"),
    )
    n, k, e100, tie = (F.col(c) for c in ["n", "k", "e100", "tie"])
    hstat = 0.03 * (e100 / (n + 1.0)) - 3.0 * (n + 1)
    return tot.select(
        n.cast("long").alias("n_orders"),
        k.cast("long").alias("n_groups"),
        snap(hstat, 6).alias("h_stat"),
        snap(
            hstat / (1 - tie * 1.0 / (n * 1.0 * n * n - n)), 6
        ).alias("h_corrected"),
    )


# --------------------------------------- Benjamini-Hochberg FDR scan

BH_FDR_ORACLE = """
-- Benjamini-Hochberg FDR over 25 simultaneous hypotheses: for each
-- nation, a one-sample z-test of its customers' mean account
-- balance against the global mean (global sd), then the BH step-up
-- procedure at q = 0.10 — the standard guard against the
-- 25-dashboards-one-false-positive trap. Balances are exact integer
-- cents; mean/sd/z are one fixed-order chain on exact integer sums.
-- Phi uses the Abramowitz-Stegun 26.2.17 polynomial (identical
-- literals both engines); p = 2*(1 - Phi(|z|)). BH: rank by p
-- ascending (nation tiebreak), reject ranks <= the LARGEST rank
-- with p <= q*rank/m.
WITH c AS (
  SELECT c_nationkey AS nk,
         CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS b
  FROM customer
), g AS (
  SELECT nk, COUNT(*) AS n, SUM(b) AS s FROM c GROUP BY nk
), tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn, SUM(s) AS ss,
         (SELECT SUM(b * b) FROM c) AS qq
  FROM g
), z AS (
  SELECT nk, n, s,
         (s * 1.0 / n - ss * 1.0 / nn)
           / (sqrt(qq * 1.0 / nn - (ss * 1.0 / nn) * (ss * 1.0 / nn))
              / sqrt(n * 1.0)) AS zv
  FROM g, tot
), p AS (
  SELECT nk, n, zv, abs(zv) AS az,
         2.0 * (exp(-abs(zv) * abs(zv) / 2.0) / 2.5066282746310002)
             * ((1.0 / (1.0 + 0.2316419 * abs(zv)))
                * (0.319381530
                   + (1.0 / (1.0 + 0.2316419 * abs(zv)))
                     * (-0.356563782
                        + (1.0 / (1.0 + 0.2316419 * abs(zv)))
                          * (1.781477937
                             + (1.0 / (1.0 + 0.2316419 * abs(zv)))
                               * (-1.821255978
                                  + (1.0 / (1.0 + 0.2316419 * abs(zv)))
                                    * 1.330274429))))) AS pv
  FROM z
), r AS (
  SELECT nk, n, zv, pv,
         ROW_NUMBER() OVER (ORDER BY pv, nk) AS rnk,
         COUNT(*) OVER () AS m
  FROM p
), cut AS (
  SELECT *,
         MAX(CASE WHEN pv <= 0.10 * rnk / m THEN rnk END) OVER () AS co
  FROM r
)
SELECT CAST(nk AS BIGINT) AS nationkey,
       CAST(n AS BIGINT) AS n_customers,
       FLOOR(zv * 1000000 + 0.5) / 1000000 AS z_score,
       FLOOR(pv * 1000000 + 0.5) / 1000000 AS p_value,
       CAST(rnk AS BIGINT) AS p_rank,
       CASE WHEN rnk <= COALESCE(co, 0) THEN 1 ELSE 0 END AS rejected
FROM cut
ORDER BY p_rank
"""


@register("agg_benjamini_hochberg_fdr", oracle=BH_FDR_ORACLE)
def agg_benjamini_hochberg_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BH step-up FDR over per-nation balance z-tests (see oracle).

    Scale shape: one customer pass to 25 nation rows (map-side
    combine) plus one global moment row broadcast into the chain;
    the BH sort/step-up runs on the m=25-row domain. At 100 TB the
    hypothesis count is dashboards, not facts — this never grows.
    The normal CDF is the A&S 26.2.17 polynomial with identical
    literals in both engines (exp() is the one sub-ulp risk, same
    class as the periodogram's trig — the multi-scale sweep is the
    guard)."""
    c = load_table(spark, sf_dir, "customer", parallel=True).select(
        F.col("c_nationkey").alias("nk"),
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
        .cast("long")
        .alias("b"),
    )
    g = c.groupBy("nk").agg(
        F.count(F.lit(1)).alias("n"), F.sum("b").alias("s")
    )
    tot = c.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("b").alias("ss"),
        # cents^2 summed WIDE (DECIMAL(38,0) / DuckDB HUGEINT): the
        # long sum would wrap around sf100 — same hardening as the
        # ANOVA/Kruskal terms
        F.sum((F.col("b") * F.col("b")).cast("decimal(38,0)")).alias("qq"),
    )
    z = g.crossJoin(F.broadcast(tot)).select(
        "nk",
        "n",
        (
            (F.col("s") * 1.0 / F.col("n") - F.col("ss") * 1.0 / F.col("nn"))
            / (
                F.sqrt(
                    F.col("qq") * 1.0 / F.col("nn")
                    - (F.col("ss") * 1.0 / F.col("nn"))
                    * (F.col("ss") * 1.0 / F.col("nn"))
                )
                / F.sqrt(F.col("n") * 1.0)
            )
        ).alias("zv"),
    )
    az = F.abs(F.col("zv"))
    t = 1.0 / (1.0 + 0.2316419 * az)
    pv = (
        2.0
        * (F.exp(-az * az / 2.0) / 2.5066282746310002)
        * (
            t
            * (
                0.319381530
                + t
                * (
                    -0.356563782
                    + t
                    * (
                        1.781477937
                        + t * (-1.821255978 + t * 1.330274429)
                    )
                )
            )
        )
    )
    p = z.select("nk", "n", "zv", pv.alias("pv"))
    wr = Window.orderBy("pv", "nk")
    wall = Window.partitionBy()
    r = p.select(
        "nk",
        "n",
        "zv",
        "pv",
        F.row_number().over(wr).alias("rnk"),
        F.count(F.lit(1)).over(wall).alias("m"),
    )
    cut = r.select(
        "*",
        F.max(
            F.when(
                F.col("pv") <= 0.10 * F.col("rnk") / F.col("m"),
                F.col("rnk"),
            )
        )
        .over(wall)
        .alias("co"),
    )
    return cut.select(
        F.col("nk").cast("long").alias("nationkey"),
        F.col("n").cast("long").alias("n_customers"),
        snap(F.col("zv"), 6).alias("z_score"),
        snap(F.col("pv"), 6).alias("p_value"),
        F.col("rnk").cast("long").alias("p_rank"),
        F.when(
            F.col("rnk") <= F.coalesce(F.col("co"), F.lit(0)), 1
        )
        .otherwise(0)
        .alias("rejected"),
    ).orderBy("p_rank")


# --------------------------------------- Wald-Wolfowitz runs test

RUNS_ORACLE = """
-- Wald-Wolfowitz runs test on the daily purchase-count series:
-- too FEW runs of above/below-median days means momentum/trend,
-- too many means oscillation — the standard randomness check run
-- before trusting an A/B time split. Median is the explicit
-- ceil(n/2)-th smallest (total order: count, then day); days equal
-- to the median are excluded per the classical construction. Counts
-- and the run tally are exact integers; only the final E/Var/z
-- chain is float, identical both engines.
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x
  FROM events GROUP BY 1
), ranked AS (
  SELECT d, x, ROW_NUMBER() OVER (ORDER BY x, d) AS rn,
         COUNT(*) OVER () AS cnt
  FROM daily
), med AS (
  SELECT x AS mv FROM ranked
  WHERE rn = CAST(FLOOR((cnt + 1) / 2.0) AS BIGINT)
), signs AS (
  SELECT d, CASE WHEN x > mv THEN 1 ELSE -1 END AS sg
  FROM daily, med WHERE x <> mv
), seq AS (
  SELECT sg, LAG(sg) OVER (ORDER BY d) AS prev FROM signs
), agg AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS n2,
         1 + SUM(CASE WHEN prev IS NOT NULL AND sg <> prev
                      THEN 1 ELSE 0 END) AS r
  FROM seq
)
SELECT CAST(n AS BIGINT) AS n_days_used,
       CAST(n1 AS BIGINT) AS n_above,
       CAST(n2 AS BIGINT) AS n_below,
       CAST(r AS BIGINT) AS n_runs,
       FLOOR((r - (2.0 * n1 * n2 / (n1 + n2) + 1))
             / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2)
                    / ((n1 + n2) * 1.0 * (n1 + n2) * (n1 + n2 - 1)))
             * 1000000 + 0.5) / 1000000 AS z_score
FROM agg
"""


@register("timeseries_runs_test", oracle=RUNS_ORACLE)
def timeseries_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs test for randomness of the daily purchase series (see
    oracle). Scale shape: facts collapse to |days| map-side; the
    median selection, sign sequence, and run tally all run on the
    day domain (one window sort of ~365·years rows)."""
    ev = load_table(spark, sf_dir, "events", parallel=True)
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("x")
    )
    wr = Window.orderBy("x", "d")
    wall = Window.partitionBy()
    ranked = daily.select(
        "d",
        "x",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wall).alias("cnt"),
    )
    med = ranked.filter(
        F.col("rn")
        == F.floor((F.col("cnt") + 1) / 2.0).cast("long")
    ).select(F.col("x").alias("mv"))
    signs = (
        daily.crossJoin(F.broadcast(med))
        .filter(F.col("x") != F.col("mv"))
        .select(
            "d",
            F.when(F.col("x") > F.col("mv"), 1).otherwise(-1).alias("sg"),
        )
    )
    wd = Window.orderBy("d")
    seq = signs.select("sg", F.lag("sg").over(wd).alias("prev"))
    agg = seq.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("sg") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("sg") == -1, 1).otherwise(0)).alias("n2"),
        (
            1
            + F.sum(
                F.when(
                    F.col("prev").isNotNull()
                    & (F.col("sg") != F.col("prev")),
                    1,
                ).otherwise(0)
            )
        ).alias("r"),
    )
    n1, n2, r = F.col("n1"), F.col("n2"), F.col("r")
    return agg.select(
        F.col("n").cast("long").alias("n_days_used"),
        n1.cast("long").alias("n_above"),
        n2.cast("long").alias("n_below"),
        r.cast("long").alias("n_runs"),
        snap(
            (r - (2.0 * n1 * n2 / (n1 + n2) + 1))
            / F.sqrt(
                2.0
                * n1
                * n2
                * (2.0 * n1 * n2 - n1 - n2)
                / ((n1 + n2) * 1.0 * (n1 + n2) * (n1 + n2 - 1))
            ),
            6,
        ).alias("z_score"),
    )


# ------------------------------------- PACF via Durbin-Levinson

PACF_ORACLE = """
-- Partial autocorrelation of the daily-revenue series at lags 1-3
-- via the closed-form Durbin-Levinson recursion on the ACF — the
-- AR-order selector that complements timeseries_acf_lags (same
-- exact-integer-cents sufficient statistics, same estimator chain;
-- the recursion adds a fixed 5-step scalar chain on the three r_k).
WITH daily AS (
  SELECT date_trunc('day', ts) AS d,
         CAST(FLOOR(SUM(value) * 100 + 0.5) AS BIGINT) AS y
  FROM events GROUP BY 1
), led AS (
  SELECT y,
         LEAD(y, 1) OVER (ORDER BY d) AS y1,
         LEAD(y, 2) OVER (ORDER BY d) AS y2,
         LEAD(y, 3) OVER (ORDER BY d) AS y3
  FROM daily
), agg AS (
  -- products promoted to HUGEINT BEFORE the multiply (round-10
  -- advisor fix): daily cents reach ~1.8e7 at sf0.1 and scale ~10x
  -- per decade, so a BIGINT y*y would raise around sf30 while the
  -- promoted form stays exact — matching the Spark side's
  -- promote-before-multiply DECIMAL(38,0)
  SELECT COUNT(*) AS n, SUM(y) AS s, SUM(CAST(y AS HUGEINT) * y) AS q,
         SUM(CAST(y AS HUGEINT) * y1) AS p1, SUM(CASE WHEN y1 IS NOT NULL THEN y END) AS a1, SUM(y1) AS b1,
         SUM(CAST(y AS HUGEINT) * y2) AS p2, SUM(CASE WHEN y2 IS NOT NULL THEN y END) AS a2, SUM(y2) AS b2,
         SUM(CAST(y AS HUGEINT) * y3) AS p3, SUM(CASE WHEN y3 IS NOT NULL THEN y END) AS a3, SUM(y3) AS b3
  FROM led
), acf AS (
  SELECT
    (p1 * 1.0 - (s * 1.0 / n) * ((a1 + b1) * 1.0)
       + (n - 1) * (s * 1.0 / n) * (s * 1.0 / n))
      / (q * 1.0 - n * (s * 1.0 / n) * (s * 1.0 / n)) AS r1,
    (p2 * 1.0 - (s * 1.0 / n) * ((a2 + b2) * 1.0)
       + (n - 2) * (s * 1.0 / n) * (s * 1.0 / n))
      / (q * 1.0 - n * (s * 1.0 / n) * (s * 1.0 / n)) AS r2,
    (p3 * 1.0 - (s * 1.0 / n) * ((a3 + b3) * 1.0)
       + (n - 3) * (s * 1.0 / n) * (s * 1.0 / n))
      / (q * 1.0 - n * (s * 1.0 / n) * (s * 1.0 / n)) AS r3
  FROM agg
), dl AS (
  SELECT r1, r2, r3,
         (r2 - r1 * r1) / (1 - r1 * r1) AS phi22
  FROM acf
), dl2 AS (
  SELECT r1, r2, r3, phi22,
         r1 - phi22 * r1 AS phi21
  FROM dl
)
SELECT lag,
       FLOOR(CASE lag WHEN 1 THEN r1
                      WHEN 2 THEN phi22
                      ELSE (r3 - phi21 * r2 - phi22 * r1)
                           / (1 - phi21 * r1 - phi22 * r2) END
             * 1000000 + 0.5) / 1000000 AS pacf
FROM dl2, (SELECT UNNEST([1, 2, 3]) AS lag)
ORDER BY lag
"""


@register("timeseries_pacf_durbin", oracle=PACF_ORACLE)
def timeseries_pacf_durbin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PACF at lags 1-3 by Durbin-Levinson on the exact-cents ACF
    (see oracle; same scale shape as timeseries_acf_lags — facts
    collapse to |days| once, everything after is a scalar chain)."""
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("d"))
        .agg(F.floor(F.sum("value") * 100 + 0.5).cast("long").alias("y"))
    )
    w = Window.orderBy("d")
    led = daily.select(
        "y", *[F.lead("y", k).over(w).alias(f"y{k}") for k in range(1, 4)]
    )
    # y*y and y*y_k promoted to DECIMAL(38,0) BEFORE the multiply
    # (round-10 advisor fix): plain int64 products wrap silently
    # around sf30 while the oracle's HUGEINT stays exact — the same
    # promote-before-multiply rule the ANOVA/variance-ratio terms
    # follow (module docstring: "anything that can exceed int64 is
    # summed WIDE" applies to the product, not just the sum).
    y_wide = F.col("y").cast("decimal(38,0)")
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s"),
        F.sum(y_wide * F.col("y")).alias("q"),
    ]
    for k in range(1, 4):
        yk = F.col(f"y{k}")
        aggs += [
            F.sum(y_wide * yk).alias(f"p{k}"),
            F.sum(F.when(yk.isNotNull(), F.col("y"))).alias(f"a{k}"),
            F.sum(yk).alias(f"b{k}"),
        ]
    a = led.agg(*aggs)
    n, s, q = F.col("n"), F.col("s"), F.col("q")
    ybar = s * 1.0 / n

    def rk(k: int):
        return (
            F.col(f"p{k}") * 1.0
            - ybar * ((F.col(f"a{k}") + F.col(f"b{k}")) * 1.0)
            + (n - k) * ybar * ybar
        ) / (q * 1.0 - n * ybar * ybar)

    acf = a.select(rk(1).alias("r1"), rk(2).alias("r2"), rk(3).alias("r3"))
    dl = acf.select(
        "*",
        ((F.col("r2") - F.col("r1") * F.col("r1")) / (1 - F.col("r1") * F.col("r1"))).alias("phi22"),
    )
    dl2 = dl.select(
        "*", (F.col("r1") - F.col("phi22") * F.col("r1")).alias("phi21")
    )
    rows = F.array(
        F.struct(F.lit(1).alias("lag"), snap(F.col("r1"), 6).alias("pacf")),
        F.struct(
            F.lit(2).alias("lag"), snap(F.col("phi22"), 6).alias("pacf")
        ),
        F.struct(
            F.lit(3).alias("lag"),
            snap(
                (
                    F.col("r3")
                    - F.col("phi21") * F.col("r2")
                    - F.col("phi22") * F.col("r1")
                )
                / (
                    1
                    - F.col("phi21") * F.col("r1")
                    - F.col("phi22") * F.col("r2")
                ),
                6,
            ).alias("pacf"),
        ),
    )
    return (
        dl2.select(F.explode(rows).alias("r"))
        .select("r.lag", "r.pacf")
        .orderBy("lag")
    )


# --------------------------------- Cochran-Armitage trend test

CA_TREND_ORACLE = """
-- Cochran-Armitage trend test: does the share of fully-shipped
-- ('F') orders trend MONOTONICALLY across the ordered priority
-- levels 1-URGENT .. 5-LOW? The dose-response test that a plain
-- chi-square cannot answer (chi2 sees difference, not direction).
-- Scores are the priority's leading digit. All sufficient
-- statistics (per-level n_i, f_i; score-weighted sums) are exact
-- integers; T and Var(T) form one fixed-order float chain.
WITH o AS (
  SELECT CAST(SUBSTR(o_orderpriority, 1, 1) AS BIGINT) AS sc,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS f
  FROM orders
), g AS (
  SELECT sc, COUNT(*) AS ni, CAST(SUM(f) AS BIGINT) AS fi
  FROM o GROUP BY sc
), tot AS (
  SELECT CAST(SUM(ni) AS BIGINT) AS n,
         CAST(SUM(fi) AS BIGINT) AS r,
         CAST(SUM(sc * fi) AS BIGINT) AS sf,
         CAST(SUM(sc * ni) AS BIGINT) AS sn,
         CAST(SUM(sc * sc * ni) AS BIGINT) AS s2n,
         COUNT(*) AS k
  FROM g
)
SELECT CAST(n AS BIGINT) AS n_orders,
       CAST(k AS BIGINT) AS n_levels,
       CAST(r AS BIGINT) AS n_finished,
       FLOOR((sf * 1.0 - r * 1.0 / n * sn)
             / sqrt(r * 1.0 / n * (1 - r * 1.0 / n)
                    * (s2n * 1.0 - sn * 1.0 * sn / n))
             * 1000000 + 0.5) / 1000000 AS z_trend
FROM tot
"""


@register("agg_cochran_armitage_trend", oracle=CA_TREND_ORACLE)
def agg_cochran_armitage_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Armitage trend of finished-order share across priority
    levels (see oracle). Scale shape: one fact pass to 5 level rows;
    everything after is a 5-row reduction and one scalar chain.
    Integer bound: sum(sc*sc*ni) <= 25N — int64 to N ~ 3.7e17."""
    o = load_table(spark, sf_dir, "orders", parallel=True).select(
        F.substring("o_orderpriority", 1, 1).cast("long").alias("sc"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("f"),
    )
    g = o.groupBy("sc").agg(
        F.count(F.lit(1)).alias("ni"),
        F.sum("f").cast("long").alias("fi"),
    )
    tot = g.agg(
        F.sum("ni").cast("long").alias("n"),
        F.sum("fi").cast("long").alias("r"),
        F.sum(F.col("sc") * F.col("fi")).cast("long").alias("sf"),
        F.sum(F.col("sc") * F.col("ni")).cast("long").alias("sn"),
        F.sum(F.col("sc") * F.col("sc") * F.col("ni"))
        .cast("long")
        .alias("s2n"),
        F.count(F.lit(1)).alias("k"),
    )
    n, r, sf, sn, s2n = (F.col(c) for c in ["n", "r", "sf", "sn", "s2n"])
    return tot.select(
        n.cast("long").alias("n_orders"),
        F.col("k").cast("long").alias("n_levels"),
        r.cast("long").alias("n_finished"),
        snap(
            (sf * 1.0 - r * 1.0 / n * sn)
            / F.sqrt(
                r * 1.0 / n * (1 - r * 1.0 / n)
                * (s2n * 1.0 - sn * 1.0 * sn / n)
            ),
            6,
        ).alias("z_trend"),
    )
