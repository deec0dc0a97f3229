"""Bucketed tables: the shuffle-elimination strategy for repeated
fact-fact joins at 100 TB (docs/SCALE.md). Writing both join sides
bucketed by the join key lets Spark sort-merge-join them with ZERO
Exchange nodes — the co-located join the reference approximates by
hash-partitioning both jobs identically (reference emitter.go:83-87)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from corral_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # saveAsTable needs a warehouse; the session fixture already set
    # one up under a temp dir via spark.sql.warehouse.dir default.
    return spark


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )

    # At test scale Spark would broadcast these tiny tables; disable it
    # so the plan shows what happens at fact-fact scale, where the
    # bucketed layout is what saves the shuffle.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("orders_b")
            .join(
                spark.table("lineitem_b"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, (
            f"bucketed join must not shuffle:\n{plan[:2000]}"
        )
        assert "SortMergeJoin" in plan and "Bucketed: true" in plan

        # And the result matches the unbucketed join.
        expected = (
            orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
            .groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        a = sorted((r.o_orderkey, r.n) for r in joined.collect())
        b = sorted((r.o_orderkey, r.n) for r in expected.collect())
        assert a == b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
