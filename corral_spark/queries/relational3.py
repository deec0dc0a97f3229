"""Third relational wave: subquery shapes (IN / NOT IN / scalar /
HAVING-against-global) in their decorrelated DataFrame forms — the
query patterns TPC-H exercises that the reference cannot express at
all (its only composition is multi-stage MapReduce chaining,
driver.go:195-216)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corral_spark.functions.det import dec, dsum, dsum_expr, dsum_money, dec_rate
from corral_spark.queries.registry import register
from corral_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "big_orders_in_subquery",
    oracle="""
    SELECT c_name, o_orderkey, o_totalprice AS total_price, qty_sum
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN (SELECT l_orderkey, CAST(SUM(TRY_CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty_sum
          FROM lineitem GROUP BY l_orderkey HAVING SUM(TRY_CAST(l_quantity AS DECIMAL(12,2))) > 150) big
      ON o_orderkey = big.l_orderkey
    ORDER BY o_orderkey
    """,
    tags=("join", "subquery", "having"),
)
def big_orders_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose lineitems sum past a quantity
    threshold (IN + GROUP BY HAVING), joined back to customers."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("__q"))
        .filter(F.col("__q") > 150)
        .select("l_orderkey", F.col("__q").cast("double").alias("qty_sum"))
    )
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(big, orders.o_orderkey == big.l_orderkey)
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_totalprice").alias("total_price"),
            "qty_sum",
        )
        .orderBy("o_orderkey")
    )


@register(
    "parts_never_shipped",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE NOT EXISTS (SELECT 1 FROM lineitem
                      WHERE l_partkey = p_partkey AND l_quantity >= 48)
    ORDER BY p_partkey
    """,
    tags=("subquery", "anti"),
)
def parts_never_shipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join semantics, stated null-robustly: parts with no
    QUALIFYING shipment. The oracle is NOT EXISTS, not NOT IN — a
    single NULL l_partkey makes NOT IN return zero rows (three-valued
    logic) while the left-anti join keeps every non-matching part;
    NOT EXISTS matches the anti join exactly under NULLs (r13
    NULL-injection campaign: 31 vs 0 rows under 5% null FKs).
    Threshold 48 keeps the result non-empty at every SF."""
    part = _t(spark, sf_dir, "part")
    shipped = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 48)
        .select("l_partkey")
    )
    return (
        part.join(shipped, part.p_partkey == shipped.l_partkey, "left_anti")
        .select("p_partkey", "p_name", "p_type")
        .orderBy("p_partkey")
    )


@register(
    "promo_revenue_share",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS y,
           CAST(ROUND(SUM(CASE WHEN p_type = 'PROMO'
                    THEN TRY_CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - (CASE WHEN l_discount BETWEEN 0 AND 1 THEN TRY_CAST(l_discount AS DECIMAL(3,2)) END) AS DECIMAL(4,2))
                    END), 2) AS DOUBLE)
             / CAST(ROUND(SUM(TRY_CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - (CASE WHEN l_discount BETWEEN 0 AND 1 THEN TRY_CAST(l_discount AS DECIMAL(3,2)) END) AS DECIMAL(4,2))), 2) AS DOUBLE)
             AS promo_share,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN part   ON l_partkey = p_partkey
    JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    ORDER BY y
    """,
    tags=("join", "agg", "ratio"),
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional revenue ratio per year — exact
    decimal sums, one IEEE division at the end."""
    li = _t(spark, sf_dir, "lineitem")
    # No broadcast hint on part: it scales with SF (~GBs at 100x), so
    # a forced broadcast would OOM executors. AQE picks broadcast at
    # runtime whenever the scan lands under autoBroadcastJoinThreshold.
    part = _t(spark, sf_dir, "part")
    orders = _t(spark, sf_dir, "orders")
    rev = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - dec_rate("l_discount")
    ).cast("decimal(4,2)")
    # dsum_money-shape sums (exact-decimal ROUND to cents before the
    # double cast): revenue sums cross 2^53 scaled units under
    # extreme-but-valid prices, where raw decimal->double casts pick
    # up a cross-engine ulp (r13 pricing_summary precedent; r14
    # extreme campaign caught the same class here).
    promo = dsum_money(F.when(F.col("p_type") == "PROMO", rev))
    total = dsum_money(rev)
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.year("o_orderdate").alias("y"))
        .agg(
            (promo / total).alias("promo_share"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("y")
    )


@register(
    "top_revenue_supplier",
    oracle="""
    WITH srev AS (
      SELECT l_suppkey,
             CAST(ROUND(SUM(TRY_CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - (CASE WHEN l_discount BETWEEN 0 AND 1 THEN TRY_CAST(l_discount AS DECIMAL(3,2)) END) AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue
      FROM lineitem GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, revenue
    FROM supplier JOIN srev ON s_suppkey = l_suppkey
    WHERE revenue = (SELECT max(revenue) FROM srev)
    ORDER BY s_suppkey
    """,
    tags=("subquery", "scalar", "agg"),
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the global max revenue —
    a scalar subquery comparison, decorrelated as agg + cross-joined
    broadcast scalar."""
    li = _t(spark, sf_dir, "lineitem")
    rev = dec("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - dec_rate("l_discount")
    ).cast("decimal(4,2)")
    srev = li.groupBy("l_suppkey").agg(dsum_money(rev).alias("revenue"))
    mx = srev.agg(F.max("revenue").alias("max_rev"))
    supplier = _t(spark, sf_dir, "supplier")
    return (
        supplier.join(srev, supplier.s_suppkey == srev.l_suppkey)
        .crossJoin(F.broadcast(mx))
        .filter(F.col("revenue") == F.col("max_rev"))
        .select("s_suppkey", "s_name", "revenue")
        .orderBy("s_suppkey")
    )


@register(
    "nations_above_global_share",
    oracle="""
    WITH nrev AS (
      SELECT n_name,
             CAST(SUM(TRY_CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name, revenue
    FROM nrev
    WHERE revenue > (SELECT 0.05 * CAST(SUM(TRY_CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) FROM orders)
    ORDER BY n_name
    """,
    tags=("subquery", "scalar", "having"),
)
def nations_above_global_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups exceeding a fraction of the GLOBAL
    total (HAVING against a scalar subquery)."""
    orders = _t(spark, sf_dir, "orders")
    # customer scales with SF — no forced broadcast (AQE decides);
    # nation is fixed 25 rows, so its hint is scale-safe.
    customer = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    nrev = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    total = orders.agg(
        (F.lit(0.05) * F.sum(dec("o_totalprice")).cast("double")).alias("cut")
    )
    return (
        nrev.crossJoin(F.broadcast(total))
        .filter(F.col("revenue") > F.col("cut"))
        .select("n_name", "revenue")
        .orderBy("n_name")
    )
