"""Physical-plan regression tests: the plan properties PLANS.md
audits must survive future edits — pushdown reaching the scan,
broadcast dimension joins, top-k short-circuits, and the
no-cartesian invariant. Built at sf0.001, explain-only (no job)."""

from __future__ import annotations

import pytest

from etl_data_ingestion_spark.plans import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = registry.QUERIES[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_predicates_reach_scan(spark):
    plan = plan_of(spark, "tpch_q6_forecast_revenue")
    assert "PushedFilters:" in plan
    # the revenue filter's range predicates must be in the scan node
    assert "l_discount" in plan.split("PushedFilters:")[1][:400]


def test_topk_is_take_ordered(spark):
    assert "TakeOrderedAndProject" in plan_of(spark, "topk_orders_by_price")


def test_dims_broadcast(spark):
    plan = plan_of(spark, "join_broadcast_dims")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_upsert_uses_window_group_limit(spark):
    plan = plan_of(spark, "warehouse_upsert_latest")
    assert "WindowGroupLimit" in plan


@pytest.mark.parametrize(
    "name",
    [
        "tpch_q3_shipping_priority",
        "tpch_q9_product_type_profit",
        "join_sortmerge_fact_fact",
        "dedup_exact_documents",
        "pipeline_decontaminate_benchmark",
        "warehouse_upsert_latest",
    ],
)
def test_no_cartesian_product(spark, name):
    assert "CartesianProduct" not in plan_of(spark, name)
