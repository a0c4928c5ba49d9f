"""Plan-shape pins + device tests for the round-15 keeps (same
pattern as the round-10..14 plan-shape tests: pin the MEASURED-better
physical form so a refactor can't silently regress it)."""

from __future__ import annotations

import pyspark.sql.functions as F

from etl_data_ingestion_spark.plans import registry as reg

reg.load_all()


def _exec_plan(spark, name, sf_dir):
    df = reg.QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_pair_expr_expands_ordered_pairs(spark):
    """Device test for the codegen'd ordered-pair expansion that
    replaced the per-customer/per-gram/per-token self-joins (wedge
    edge build, vocab jaccard, threshold curve): over a sorted array
    it must emit exactly the (x, y) pairs with x < y, in-order, and
    nothing for arrays shorter than 2."""
    from etl_data_ingestion_spark.operators.graph import _PAIR_EXPR

    df = spark.createDataFrame(
        [(1, [3, 5, 9]), (2, [7]), (3, [])], "k int, ss array<int>"
    )
    rows = sorted(
        tuple(r)
        for r in df.select(
            "k", F.explode(F.expr(_PAIR_EXPR)).alias("p")
        )
        .select("k", "p.u", "p.v")
        .collect()
    )
    assert rows == [(1, 3, 5), (1, 3, 9), (1, 5, 9)], rows


def test_corr_matrix_has_no_literal_relation_or_crossjoin(spark, sf_dir):
    """The r15 keep (−39% sf0.1 / −37% sf1): the 10-row pair table is
    no longer a driver-side createDataFrame literal crossJoined
    against the broadcast moments row — the pair structs explode
    directly from the one-row aggregate. Exactly one parquet scan,
    no join operator of any kind in the plan."""
    plan = _exec_plan(spark, "agg_corr_matrix_daily", sf_dir)
    assert plan.count("Scan parquet") == 1, plan[:3000]
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin",
                "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"):
        assert bad not in plan, (bad, plan[:3000])


def test_vocab_jaccard_single_corpus_pass(spark, sf_dir):
    """The r15 keep (−21% sf0.1): the distinct (source,tok) grid +
    token self-join (4 scan+explode branches, 3 corpus exchanges) is
    replaced by ONE groupBy(tok) collect_set pass; everything after
    the localCheckpoint is |vocab|-sized, so the executed plan must
    carry no parquet re-scan and no sort-merge/shuffled-hash join
    (the sizes attach as broadcasts)."""
    plan = _exec_plan(spark, "text_source_vocab_jaccard", sf_dir)
    assert "Scan parquet" not in plan, plan[:3000]
    assert "SortMergeJoin" not in plan, plan[:3000]
    assert "ShuffledHashJoin" not in plan, plan[:3000]
    spark.catalog.clearCache()


def test_threshold_curve_gram_join_gone(spark, sf_dir):
    """The r15 keep (−51% sf0.1 / −59% sf1): the gram-keyed pair
    self-join and the keep-broadcast join are fused into the per-gram
    collect_set aggregation; after the gsets localCheckpoint the only
    joins left are the sizes/lens broadcasts. The 15 coalesce-to-zero
    wrappers (r14 advisor) must still be present."""
    df = reg.QUERIES["pipeline_dedup_threshold_curve"](spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert opt.count("coalesce") >= 15, opt[:3000]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan[:3000]
    assert "ShuffledHashJoin" not in plan, plan[:3000]
    spark.catalog.clearCache()


def test_pq_rerank_shortlist_is_map_side(spark, sf_dir):
    """The r15 keep: the ADC shortlist is computed INSIDE the encode
    mapInPandas pass (local top-SHORTLIST per query per task), so the
    executed plan must carry a MapInPandas node and no posexplode of
    a |corpus| x n_q score array."""
    plan = _exec_plan(spark, "similarity_pq_rerank", sf_dir)
    assert "MapInPandas" in plan, plan[:3000]
    assert "posexplode" not in plan, plan[:3000]
    spark.catalog.clearCache()


def test_wedge_edge_build_is_one_aggregation(spark, sf_dir):
    """The r15 keep (triangle −13% sf0.1 / wash sf1): the capped
    per-customer posting list comes from one groupBy(c) collect_set
    aggregation — no row_number cap window, no cs self-join. Pinned
    on the pre-checkpoint subplan (the registered query's plan starts
    at the localCheckpoint, which hides the edge build)."""
    from etl_data_ingestion_spark.catalog import load_table
    from etl_data_ingestion_spark.operators.graph import _PAIR_EXPR

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cs_sets = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .filter(F.col("l_suppkey") < 1000)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .groupBy("c")
        .agg(F.slice(F.sort_array(F.collect_set("s")), 1, 20).alias("ss"))
    )
    allpairs = (
        cs_sets.select(F.explode(F.expr(_PAIR_EXPR)).alias("p"))
        .select("p.u", "p.v")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    plan = allpairs._jdf.queryExecution().executedPlan().toString()
    assert "collect_set" in plan, plan[:3000]
    assert "row_number" not in plan, plan[:3000]
    # the only join is the orders-lineitem fact join
    n_joins = sum(plan.count(j) for j in
                  ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))
    assert n_joins == 1, plan[:3000]
