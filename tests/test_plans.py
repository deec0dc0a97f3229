"""Physical-plan regression tests: the optimizations that make these
queries scale must stay in the plan. A refactor that silently turns a
broadcast join into a sort-merge join or un-pushes a filter is a perf
bug even while results stay correct — these assertions catch it.

(The reference has no optimizer to audit — SURVEY §4; this is the
Spark-side discipline replacing it.)
"""

from __future__ import annotations

import pytest

from corral_spark.queries import REGISTRY

SF = "/root/testdata/sf0.01"


def plan_of(spark, name: str) -> str:
    df = REGISTRY[name].spark(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_amplab1_filter_pushed_and_columns_pruned(spark):
    plan = plan_of(spark, "amplab1")
    assert "(p_size" in plan and "> 25" in plan, "filter must reach the scan"
    # Scan must read only the two needed columns.
    assert "FileScan parquet [p_name" in plan
    assert "p_retailprice" not in plan


def test_regional_revenue_all_dims_broadcast(spark):
    plan = plan_of(spark, "regional_revenue")
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan, "fact table must not shuffle for dims"
    # Fact scan pruned to join key + measures.
    assert "FileScan parquet [l_suppkey" in plan


def test_shipping_priority_filters_pushed_joins_broadcast(spark):
    plan = plan_of(spark, "shipping_priority")
    assert "c_mktsegment" in plan and "BUILDING" in plan
    assert "o_orderdate" in plan and "l_shipdate" in plan
    assert "BroadcastHashJoin" in plan
    assert "partial_sum" in plan, "aggregation must be map-side partial"


def test_pricing_summary_partial_agg_and_pruned_scan(spark):
    plan = plan_of(spark, "pricing_summary")
    assert "partial_sum" in plan
    # Only the 7 needed columns scanned; keys not read.
    assert "l_orderkey" not in plan and "l_partkey" not in plan


def test_window_top_orders_group_limit(spark):
    plan = plan_of(spark, "window_top_orders")
    # Spark 3.5+/4.x must pre-limit each key to 3 rows before the
    # shuffle (Partial) and after (Final) — without this the window
    # sorts every customer's full history.
    assert plan.count("WindowGroupLimit") == 2


def test_top_orders_is_take_ordered_not_global_sort(spark):
    plan = plan_of(spark, "top_orders")
    assert "TakeOrderedAndProject" in plan, "top-k must not globally sort"


@pytest.mark.parametrize(
    "name", [n for n, q in sorted(REGISTRY.items()) if "extension" not in q.tags]
)
def test_no_python_udfs_in_relational_plans(spark, name):
    # Relational queries must stay wholly JVM-side (SURVEY §7):
    # BatchEvalPython/ArrowEvalPython in a plan means a Python
    # round-trip snuck into the hot path.
    plan = plan_of(spark, name)
    assert "EvalPython" not in plan
