"""Subquery operators — scalar, IN, EXISTS/NOT EXISTS, correlated.

The reference has zero subqueries (SURVEY.md §2.5: analytics delegated
to BigQuery post-load; README.md:3); these bring that surface in-house.
Expressed through spark.sql over temp views so Catalyst's subquery
machinery (RewritePredicateSubquery → semi/anti join, scalar-subquery
decorrelation) is what executes — not a hand-rewritten join. At scale
each of these plans to a join Catalyst can reorder/broadcast like any
other; none requires a correlated per-row re-execution.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from etl_data_ingestion_spark.catalog import load_table
from etl_data_ingestion_spark.plans.registry import register


def _view(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


SCALAR_ORACLE = """
SELECT p_partkey, p_retailprice
FROM part
WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
ORDER BY p_partkey
"""


@register("subquery_scalar_above_avg", oracle=SCALAR_ORACLE)
def subquery_scalar_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: parts above the global average
    retail price. Catalyst plans the subquery as its own stage and
    feeds the scalar into the filter (one extra job, no per-row work).
    No arithmetic on the output columns → raw doubles hash-match."""
    _view(spark, sf_dir, "part")
    return spark.sql(SCALAR_ORACLE)


IN_ORACLE = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49
)
ORDER BY o_orderkey
"""


@register("subquery_in_high_qty", oracle=IN_ORACLE)
def subquery_in_high_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → left-semi join after RewritePredicateSubquery;
    the quantity filter is pushed into the lineitem scan before the
    shuffle."""
    _view(spark, sf_dir, "orders", "lineitem")
    return spark.sql(IN_ORACLE)


EXISTS_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("subquery_exists_returned", oracle=EXISTS_ORACLE)
def subquery_exists_returned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape — fixtures lack
    l_commitdate/l_receiptdate so the inner predicate is returnflag):
    decorrelates to a semi join on l_orderkey; the date filter prunes
    the probe side at the scan."""
    _view(spark, sf_dir, "orders", "lineitem")
    return spark.sql(EXISTS_ORACLE)


NOT_EXISTS_ORACLE = """
SELECT c_custkey, c_acctbal
FROM customer
WHERE c_acctbal > 0
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
  )
ORDER BY c_custkey
"""


@register("subquery_not_exists_customers", oracle=NOT_EXISTS_ORACLE)
def subquery_not_exists_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → anti join (TPC-H Q22 shape): positive-balance
    customers with no urgent order. (Every fixture customer has SOME
    order, so the unfiltered variant would be a trivial 0-row check.)"""
    _view(spark, sf_dir, "customer", "orders")
    return spark.sql(NOT_EXISTS_ORACLE)


CORRELATED_SCALAR_ORACLE = """
SELECT l.l_partkey,
       CAST(COUNT(*) AS BIGINT) AS small_lots
FROM lineitem l
WHERE l.l_quantity < 0.5 * (
  SELECT AVG(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
)
GROUP BY l.l_partkey
HAVING COUNT(*) >= 3
ORDER BY l.l_partkey
"""


@register("subquery_correlated_avg_qty", oracle=CORRELATED_SCALAR_ORACLE)
def subquery_correlated_avg_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape): lineitems below
    half their part's average quantity.

    Plan choice (round-7): Catalyst decorrelates the SQL form to
    aggregate-then-SELF-JOIN — lineitem scanned twice and shuffled
    twice (once for the per-part avg, once to sort-merge the probe
    side). The windowed rewrite is strictly better at every scale:
    ONE scan projecting (l_partkey, l_quantity), ONE Exchange on
    l_partkey, then avg-over-partition / filter / partial count all
    inside the same partitioning — the final groupBy(l_partkey)
    reuses the window's hash partitioning so no second shuffle. At
    100 TB that halves both scan bytes and shuffle bytes for the
    dominant table."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity"
    )
    w = Window.partitionBy("l_partkey")
    return (
        li.withColumn("part_avg", F.avg("l_quantity").over(w))
        .filter(F.col("l_quantity") < 0.5 * F.col("part_avg"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("small_lots"))
        .filter(F.col("small_lots") >= 3)
        .orderBy("l_partkey")
    )


LATERAL_ORACLE = """
-- LATERAL correlated subquery: per nation, its top-2 customers by
-- balance — the subquery re-executes (logically) per outer row,
-- referencing outer columns. Both engines support ANSI LATERAL;
-- Spark plans it as a window-style per-key limit, not an actual
-- per-row re-execution.
SELECT n.n_name, t.c_name, t.bal
FROM nation n,
LATERAL (
  SELECT c_name, ROUND(c_acctbal, 2) AS bal
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_name
  LIMIT 2
) t
ORDER BY n.n_name, t.bal DESC, t.c_name
"""


@register("subquery_lateral_topk", oracle=LATERAL_ORACLE)
def subquery_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL join (correlated table subquery in the FROM clause) —
    the seventh subquery shape: per-outer-row top-k. Spark resolves
    the correlation at plan time; the physical plan is the scalable
    one (join + per-key ordered limit), NOT |outer| re-executions —
    which is exactly why LATERAL is safe at 100 TB while a
    driver-side per-key loop never is."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.bal
        FROM nation n,
        LATERAL (
          SELECT c_name, ROUND(c_acctbal, 2) AS bal
          FROM customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name
          LIMIT 2
        ) t
        ORDER BY n.n_name, t.bal DESC, t.c_name
        """
    )


ANY_ALL_ORACLE = """
-- Quantified comparisons (ANY / ALL): suppliers whose balance beats
-- EVERY customer balance in their own nation (> ALL, correlated) and
-- a count of suppliers beating AT LEAST ONE (> ANY). ALL over an
-- empty set is vacuously TRUE and a NULL in the set poisons ALL to
-- NULL-not-TRUE — both semantics preserved by the MAX/MIN rewrite
-- only because c_acctbal is non-null here (the rewrite below pins
-- that precondition with a COUNT filter).
WITH nat_stats AS (
  SELECT c.c_nationkey,
         MAX(c.c_acctbal) AS max_bal,
         MIN(c.c_acctbal) AS min_bal,
         COUNT(*) AS n_cust
  FROM customer c GROUP BY c.c_nationkey
)
SELECT n.n_name AS nation,
       CAST(SUM(CASE WHEN ns.n_cust IS NULL
                      OR s.s_acctbal > ns.max_bal
                     THEN 1 ELSE 0 END) AS BIGINT) AS beats_all,
       CAST(SUM(CASE WHEN s.s_acctbal > ns.min_bal
                     THEN 1 ELSE 0 END) AS BIGINT) AS beats_any,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
LEFT JOIN nat_stats ns ON s.s_nationkey = ns.c_nationkey
GROUP BY n.n_name
ORDER BY nation
"""


@register("subquery_any_all_quantified", oracle=ANY_ALL_ORACLE)
def subquery_any_all_quantified(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantified subquery comparisons — a surface Spark SQL does
    NOT parse natively (`> ALL (SELECT ...)` is a syntax error in
    Spark 4), provided here via the aggregate rewrite:
    `x > ALL (S)` = `x > MAX(S)` and `x > ANY (S)` = `x > MIN(S)`,
    with the ALL-over-empty-set vacuous-truth case carried by the
    LEFT join's NULL group marker. This is the rewrite every
    optimizer applies (a naive quantified comparison is a per-row
    rescan of S): the inner set collapses to one |nations|-row
    stats table that BROADCASTS, so the fact side is never shuffled
    — the plan is scan → broadcast-join → partial agg regardless of
    how big customer grows. NULL caveat: the MAX rewrite equates
    NULL-poisoned ALL (NULL, not TRUE) with not-counted, which
    matches SUM(CASE WHEN …) semantics; c_acctbal is non-null in
    this schema so both engines agree."""
    sup = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    nat_stats = cust.groupBy("c_nationkey").agg(
        F.max("c_acctbal").alias("max_bal"),
        F.min("c_acctbal").alias("min_bal"),
        F.count("*").alias("n_cust"),
    )
    return (
        sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .join(
            F.broadcast(nat_stats),
            sup["s_nationkey"] == nat_stats["c_nationkey"],
            "left",
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(
                (
                    F.col("n_cust").isNull()
                    | (F.col("s_acctbal") > F.col("max_bal"))
                ).cast("long")
            ).alias("beats_all"),
            F.sum(
                (F.col("s_acctbal") > F.col("min_bal")).cast("long")
            ).alias("beats_any"),
            F.count("*").alias("n_suppliers"),
        )
        .orderBy("nation")
    )


NOT_IN_NULL_ORACLE = """
-- The NOT IN null trap, as an operator: a key list containing a
-- single NULL makes `x NOT IN (list)` UNKNOWN for every x (three-
-- valued logic), silently emptying the naive query — the classic
-- production incident when an exclusion list gains a NULL. The
-- operator computes the exclusion BOTH ways and reports the trap:
-- naive NOT IN count (0 by SQL semantics) next to the null-safe
-- NOT EXISTS count (the intended answer). Both engines implement
-- ANSI three-valued logic, so the counts match exactly — including
-- the zero.
WITH exclusions AS (
  -- every 4th supplier (scale-robust: nation-keyed filters are
  -- empty at sf0.001), plus a planted NULL (the incident)
  SELECT s_suppkey AS k FROM supplier WHERE s_suppkey % 4 = 1
  UNION ALL SELECT NULL
), naive AS (
  SELECT COUNT(*) AS c FROM lineitem
  WHERE l_suppkey NOT IN (SELECT k FROM exclusions)
), safe AS (
  SELECT COUNT(*) AS c FROM lineitem li
  WHERE NOT EXISTS (SELECT 1 FROM exclusions e WHERE e.k = li.l_suppkey)
), total AS (
  SELECT COUNT(*) AS c FROM lineitem
)
SELECT naive.c AS naive_not_in_rows,
       safe.c AS null_safe_rows,
       total.c AS total_rows,
       CAST(total.c - safe.c AS BIGINT) AS excluded_rows
FROM naive, safe, total
"""


@register("subquery_not_in_null_semantics", oracle=NOT_IN_NULL_ORACLE)
def subquery_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NOT IN null trap as a first-class semantics check: an
    exclusion list with a planted NULL makes naive `NOT IN` return
    ZERO rows (x <> NULL is UNKNOWN, so the conjunction never
    passes) while the null-safe NOT EXISTS anti-join returns the
    intended population. An engine user switching from the reference
    must get ANSI three-valued logic, not a 'helpful' fix — this
    operator pins both counts.

    Plan: naive NOT IN compiles to a null-aware anti join (Spark
    plans BroadcastNestedLoopJoin for NAAJ when the list may contain
    NULL — itself worth knowing: a nullable exclusion list DEFEATS
    the hash anti-join at 100 TB, which is the performance half of
    why production schemas declare exclusion keys NOT NULL); the
    null-safe form is an ordinary broadcast anti join."""
    li = load_table(spark, sf_dir, "lineitem", parallel=False).select(
        "l_suppkey"
    )
    excl = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_suppkey") % 4 == 1)
        .select(F.col("s_suppkey").alias("k"))
        .unionByName(
            spark.range(1).select(F.lit(None).cast("long").alias("k"))
        )
    )
    excl.createOrReplaceTempView("not_in_exclusions")
    li.createOrReplaceTempView("not_in_lineitem")
    naive = spark.sql(
        "SELECT COUNT(*) AS c FROM not_in_lineitem "
        "WHERE l_suppkey NOT IN (SELECT k FROM not_in_exclusions)"
    )
    safe = li.join(
        F.broadcast(excl.filter(F.col("k").isNotNull())),
        li.l_suppkey == F.col("k"),
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("c"))
    total = li.agg(F.count(F.lit(1)).alias("c"))
    return (
        naive.select(F.col("c").alias("naive_not_in_rows"))
        .crossJoin(F.broadcast(safe.select(F.col("c").alias("null_safe_rows"))))
        .crossJoin(F.broadcast(total.select(F.col("c").alias("total_rows"))))
        .select(
            "naive_not_in_rows",
            "null_safe_rows",
            "total_rows",
            (F.col("total_rows") - F.col("null_safe_rows"))
            .cast("long")
            .alias("excluded_rows"),
        )
    )
