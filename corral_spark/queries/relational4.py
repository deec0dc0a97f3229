"""Fourth relational wave: range/interval joins, time-series gap
filling, running-window frames, and MERGE-style upserts — engine
surface a warehouse user expects that the reference cannot express
(its execution model is single-key MapReduce stages,
reference driver.go:195-216).

Determinism: registry conventions (registry.py) — unique-key ORDER BY,
decimal-exact aggregates surfaced as double, timestamps formatted or
reduced to integer day/epoch numbers on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from corral_spark.functions.det import dec, dec_rate
from corral_spark.operators.merge import merge_upsert
from corral_spark.operators.ranges import interval_bucket_join
from corral_spark.operators.timeseries import gapfill_locf
from corral_spark.queries.registry import register
from corral_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


_US_PER_DAY = 86_400 * 1_000_000


@register(
    "events_in_promo_windows",
    oracle=f"""
    WITH b AS (SELECT epoch_us(MIN(ts)) AS mn FROM events),
    iv AS (
      SELECT k.range AS window_id,
             mn + k.range * 7 * {_US_PER_DAY} AS lo,
             mn + k.range * 7 * {_US_PER_DAY} + 3 * {_US_PER_DAY} AS hi
      FROM b, range(20) k
    )
    SELECT window_id, COUNT(*) AS n_events,
           CAST(SUM(TRY_CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
    FROM events e JOIN iv
      ON epoch_us(e.ts) >= iv.lo AND epoch_us(e.ts) < iv.hi
    GROUP BY window_id
    ORDER BY window_id
    """,
    tags=("range-join", "interval", "gap"),
)
def events_in_promo_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (no equi key): 20 deterministic 3-day promo
    windows spaced 7 days from the corpus start, joined to event
    timestamps via bucket decomposition
    (operators.ranges.interval_bucket_join, 1-day buckets) — an
    EQUI-join on bucket id + exact refine, never a nested-loop over
    points x intervals. All comparisons in epoch micros on both
    engines so boundary semantics are integer-exact."""
    from corral_spark.operators.timeseries import event_micros

    raw = _t(spark, sf_dir, "events")
    ev = raw.select(event_micros(raw, "ts").alias("ts_us"), "value")
    mn = ev.agg(F.min("ts_us")).first()[0]
    iv = spark.range(20).select(
        F.col("id").alias("window_id"),
        (F.lit(mn) + F.col("id") * (7 * _US_PER_DAY)).alias("lo"),
        (F.lit(mn) + F.col("id") * (7 * _US_PER_DAY) + 3 * _US_PER_DAY).alias(
            "hi"
        ),
    )
    joined = interval_bucket_join(
        ev, iv, "ts_us", "lo", "hi", bucket_width=_US_PER_DAY
    )
    return (
        joined.groupBy("window_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .orderBy("window_id")
    )


@register(
    "daily_revenue_gapfill",
    oracle="""
    WITH obs AS (
      SELECT l_returnflag,
             datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS day_num,
             CAST(SUM(TRY_CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(1 - (CASE WHEN l_discount BETWEEN 0 AND 1 THEN TRY_CAST(l_discount AS DECIMAL(3,2)) END) AS DECIMAL(4,2))) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_quantity >= 49
        -- declared series domain (r14): a ship date outside the
        -- table's documented range is corrupt and must not stretch
        -- the dense spine (one bad date = a 100k-day spine per key)
        AND l_shipdate >= TIMESTAMP '1992-01-01'
        AND l_shipdate < TIMESTAMP '1999-01-01'
      GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(day_num) AS lo, MAX(day_num) AS hi FROM obs),
    spine AS (
      SELECT f.l_returnflag, d.day_num
      FROM (SELECT DISTINCT l_returnflag FROM obs) f
      CROSS JOIN (SELECT unnest(generate_series(lo, hi)) AS day_num
                  FROM bounds) d
    )
    SELECT s.l_returnflag, s.day_num,
           last_value(o.revenue IGNORE NULLS) OVER (
             PARTITION BY s.l_returnflag ORDER BY s.day_num
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS revenue
    FROM spine s LEFT JOIN obs o
      ON s.l_returnflag = o.l_returnflag AND s.day_num = o.day_num
    ORDER BY s.l_returnflag, s.day_num
    """,
    tags=("timeseries", "gapfill", "locf", "gap"),
)
def daily_revenue_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style dense daily rollup: revenue from high-quantity
    lineitems (sparse by construction) bucketed per day and
    returnflag, densified over the global day range and gap-filled
    with last-observation-carried-forward
    (operators.timeseries.gapfill_locf). Buckets are integer day
    numbers on both engines — no timestamp-affinity risk."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 49)
        & (F.col("l_shipdate") >= F.lit("1992-01-01"))
        & (F.col("l_shipdate") < F.lit("1999-01-01"))
    )
    obs = (
        li.select(
            "l_returnflag",
            F.datediff(
                F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date")
            ).alias("day_num"),
            (dec("l_extendedprice") * (F.lit(1).cast("decimal(3,2)") - dec_rate("l_discount")).cast("decimal(4,2)")).alias(
                "__rev"
            ),
        )
        .groupBy("l_returnflag", "day_num")
        .agg(F.sum("__rev").cast("double").alias("revenue"))
    )
    filled = gapfill_locf(
        obs, "l_returnflag", "day_num", ["revenue"], bucket_width=1
    )
    return filled.orderBy("l_returnflag", "day_num")


@register(
    "customer_running_totals",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(TRY_CAST(o_totalprice AS DECIMAL(12,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate NULLS FIRST, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate NULLS FIRST, o_orderkey)
             AS BIGINT) AS order_seq,
           lag(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate NULLS FIRST, o_orderkey)
             AS prev_price
    FROM orders
    ORDER BY o_orderkey
    """,
    tags=("window", "frame", "running", "gap"),
)
def customer_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-frame window coverage (ROWS UNBOUNDED PRECEDING ->
    CURRENT ROW cumulative sum, row_number sequence, lag) per
    customer, deterministically ordered by (o_orderdate, o_orderkey).
    The cumulative SUM runs over exact decimals, surfaced as double
    (functions.det conventions); lag copies a raw double bit-for-bit.
    One shuffle on o_custkey serves all three window functions."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum(dec("o_totalprice")).over(wf).cast("double").alias(
                "running_total"
            ),
            F.row_number().over(w).cast("bigint").alias("order_seq"),
            F.lag("o_totalprice").over(w).alias("prev_price"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "orders_merge_upsert",
    oracle="""
    WITH upd AS (
      SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice + 100 AS o_totalprice
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey + 1000000000, 'N', o_totalprice
      FROM orders WHERE o_orderkey % 1000 = 0
    ),
    tomb AS (SELECT o_orderkey FROM orders WHERE o_orderkey % 97 = 0)
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM (
      SELECT c.o_orderkey, c.o_orderstatus, c.o_totalprice
      FROM orders c
      WHERE c.o_orderkey NOT IN (SELECT o_orderkey FROM upd)
      UNION ALL
      SELECT * FROM upd
    )
    WHERE o_orderkey NOT IN (SELECT o_orderkey FROM tomb)
    ORDER BY o_orderkey
    """,
    tags=("merge", "upsert", "cdc", "gap"),
)
def orders_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics on plain DataFrames
    (operators.merge.merge_upsert): a derived CDC batch — updates
    (key%7: status U, price+100), inserts (key%1000 re-keyed +1e9),
    deletes (key%97 tombstones) — applied to orders via one full-outer
    join + per-column COALESCE + tombstone anti-join. The oracle
    states the same semantics as set algebra (carry ∪ upserts minus
    tombstones). +100 on a 2-decimal double is IEEE-exact, so no
    decimal detour is needed."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    updates = (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            F.lit("U").alias("o_orderstatus"),
            (F.col("o_totalprice") + 100).alias("o_totalprice"),
            F.lit(False).alias("__del"),
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 1000 == 0).select(
                (F.col("o_orderkey") + 1_000_000_000).alias("o_orderkey"),
                F.lit("N").alias("o_orderstatus"),
                F.col("o_totalprice"),
                F.lit(False).alias("__del"),
            )
        )
        .unionByName(
            orders.filter(F.col("o_orderkey") % 97 == 0).select(
                "o_orderkey",
                F.lit(None).cast("string").alias("o_orderstatus"),
                F.lit(None).cast("double").alias("o_totalprice"),
                F.lit(True).alias("__del"),
            )
        )
    )
    merged = merge_upsert(orders, updates, "o_orderkey", delete_col="__del")
    return merged.orderBy("o_orderkey")
