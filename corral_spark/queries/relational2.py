"""Second wave of relational coverage: correlated-style aggregates,
CUBE, exact robust statistics, conditional pivots, string/date scalar
functions, and the as-of join — all operators absent from the
reference (its only scalars are the ad-hoc Go conversions,
amplab1.go:23, amplab3.go:42-57; its only join the hand-rolled inner
equi-join, amplab3.go:75-97)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corral_spark.functions.det import davg, dec, dsum
from corral_spark.operators.asof import asof_join
from corral_spark.queries.registry import register
from corral_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "orders_above_customer_avg",
    oracle="""
    WITH avgs AS (
      SELECT o_custkey AS k,
             CAST(SUM(TRY_CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price
      FROM orders GROUP BY 1
    )
    SELECT o_orderkey, o_custkey, o_totalprice AS total_price, avg_price
    FROM orders JOIN avgs ON o_custkey = k
    WHERE o_totalprice > avg_price
    ORDER BY o_orderkey
    """,
    tags=("join", "agg", "subquery"),
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-aggregate pattern (orders above their customer's
    average) decorrelated into agg + self-join — the form Catalyst
    itself rewrites correlated scalar subqueries into."""
    orders = _t(spark, sf_dir, "orders")
    avgs = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        davg("o_totalprice").alias("avg_price")
    )
    return (
        orders.join(avgs, orders.o_custkey == avgs.k)
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_totalprice").alias("total_price"),
            "avg_price",
        )
        .orderBy("o_orderkey")
    )


@register(
    "cube_sales",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS return_flag,
           coalesce(l_linestatus, 'ALL') AS line_status,
           COUNT(*) AS n_rows,
           CAST(SUM(TRY_CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY return_flag, line_status
    """,
    tags=("agg", "cube"),
)
def cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE grouping sets (all 4 combinations of 2 dims)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("l_quantity").alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("return_flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("line_status"),
            "n_rows",
            "sum_qty",
        )
        .orderBy("return_flag", "line_status")
    )


@register(
    "robust_stats",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           MEDIAN(l_extendedprice) AS median_price,
           round(sqrt((CAST(SUM(CAST(TRY_CAST(l_extendedprice AS DECIMAL(12,2)) AS DECIMAL(19,2)) * TRY_CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                 - CAST(SUM(TRY_CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                   * CAST(SUM(TRY_CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
                / (COUNT(*) - 1)), 6) AS stddev_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def robust_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order statistics + dispersion with cross-engine bit stability:
    median (both engines average the two middle doubles), and stddev
    computed from EXACT decimal sum / sum-of-squares so the only
    floating ops are the identical final divisions/sqrt — the naive
    running-variance aggregate differs per accumulation order. The
    stddev is still rounded to 6dp: the sum-of-squares scaled integer
    exceeds 2^53, and decimal->double casting of such values is
    correctly-rounded in the JVM but double-rounded in DuckDB (1-ulp
    divergence observed)."""
    li = _t(spark, sf_dir, "lineitem")
    p = dec("l_extendedprice")
    sum_d = F.sum(p).cast("double")
    sumsq_d = F.sum(p * p).cast("double")
    n = F.count(F.lit(1))
    stddev = F.round(
        F.sqrt((sumsq_d - sum_d * sum_d / n) / (n - F.lit(1))), 6
    )
    return (
        li.groupBy("l_returnflag")
        .agg(
            n.alias("n"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.median("l_extendedprice").alias("median_price"),
            stddev.alias("stddev_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "priority_pivot",
    oracle="""
    SELECT o_orderstatus,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
           CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'   THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS n_other,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
                         THEN TRY_CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS urgent_revenue
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("agg", "pivot"),
)
def priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (manual pivot): per-status counts by
    priority class in fixed columns — the name-stable alternative to
    df.pivot for a known category set."""
    o = _t(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    high = F.col("o_orderpriority") == "2-HIGH"
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("n_urgent"),
            F.sum(F.when(high, 1).otherwise(0)).alias("n_high"),
            F.sum(F.when(~urgent & ~high, 1).otherwise(0)).alias("n_other"),
            F.sum(F.when(urgent, dec("o_totalprice")))
            .cast("double")
            .alias("urgent_revenue"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "customer_name_features",
    oracle="""
    SELECT c_custkey,
           upper(substring(c_name, 1, 8)) AS name_prefix,
           length(c_name) AS name_len,
           reverse(c_name) AS name_rev,
           concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           replace(c_name, 'Customer', 'C') AS name_short,
           lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS key_padded
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("scalar-fn", "string"),
)
def customer_name_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar-function coverage (upper/substring/length/
    reverse/concat_ws/replace/lpad) — the reference does string work
    ad hoc in Go map code (Q5/Q11 in SURVEY §2.2)."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper(F.substring("c_name", 1, 8)).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.reverse("c_name").alias("name_rev"),
        F.concat_ws(
            "-", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")
        ).alias("seg_nation"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("C")).alias("name_short"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("key_padded"),
    ).orderBy("c_custkey")


@register(
    "order_date_parts",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS y,
           CAST(quarter(o_orderdate) AS INT) AS q,
           COUNT(*) AS n_orders,
           CAST(SUM(TRY_CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY 1, 2
    ORDER BY y, q
    """,
    tags=("scalar-fn", "datetime", "agg"),
)
def order_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime extraction (year/quarter) + agg — the reference parses
    dates by hand (amplab3.go:57 time.Parse)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("y"), F.quarter("o_orderdate").alias("q")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
        .orderBy("y", "q")
    )


@register(
    "order_item_arrays",
    oracle="""
    SELECT l_orderkey,
           COALESCE(array_to_string(list_sort(
             list(l_partkey) FILTER (WHERE l_partkey IS NOT NULL)), ','),
             '') AS part_keys,
           COUNT(l_partkey) AS n_parts
    FROM lineitem
    WHERE l_orderkey <= 100
    GROUP BY l_orderkey
    ORDER BY l_orderkey
    """,
    tags=("array", "agg"),
)
def order_item_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped array construction (collect_list -> sort_array),
    surfaced as a joined string so the value compare is type-stable.
    Array/nested types are wholly absent from the reference
    (SURVEY §1.1: strings only).

    NULL keys are absence, not elements (collect_list's own
    semantics): n_parts counts collected keys, so part_keys and
    n_parts always agree, and an all-NULL group rebuilds as the
    EMPTY string on both engines (oracle COALESCEs DuckDB's
    zero-row list aggregate, which is NULL, back to '') — the r13
    empty-rebuild convention."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") <= 100)
        .groupBy("l_orderkey")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list("l_partkey")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("part_keys"),
            F.count("l_partkey").alias("n_parts"),
        )
        .orderBy("l_orderkey")
    )


@register(
    "customer_id_parse",
    oracle="""
    SELECT c_custkey,
           TRY_CAST(regexp_extract(c_name, 'Customer#(\\d+)', 1) AS BIGINT) AS parsed_id,
           (TRY_CAST(regexp_extract(c_name, 'Customer#(\\d+)', 1) AS BIGINT) = c_custkey) AS id_consistent
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("scalar-fn", "regex"),
)
def customer_id_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex capture-group extraction + cast + consistency predicate —
    the typed form of the reference's hand-rolled string parsing
    (amplab1.go:23 strconv.Atoi). try_cast: a name that does not
    match the pattern extracts '' and must parse to NULL on both
    engines, not raise under ANSI (r14 extreme-value campaign —
    schema-on-read rule, same as event_props_map)."""
    c = _t(spark, sf_dir, "customer")
    parsed = F.regexp_extract("c_name", r"Customer#(\d+)", 1).try_cast(
        "bigint"
    )
    return c.select(
        "c_custkey",
        parsed.alias("parsed_id"),
        (parsed == F.col("c_custkey")).alias("id_consistent"),
    ).orderBy("c_custkey")


@register(
    "order_latency",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(date_diff('day', o_orderdate, l_shipdate)) AS DOUBLE) / COUNT(*) AS avg_ship_days,
           MAX(date_diff('day', o_orderdate, l_shipdate)) AS max_ship_days
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("datetime", "join", "agg"),
)
def order_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp arithmetic: order-to-ship latency in days per
    priority (datediff + integer-exact average)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            (F.sum(days).cast("double") / F.count(F.lit(1))).alias("avg_ship_days"),
            F.max(days).alias("max_ship_days"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "null_semantics",
    oracle="""
    SELECT c_custkey,
           coalesce(n_recent, 0) AS n_recent,
           (n_recent IS NULL) AS never_recent,
           CASE WHEN coalesce(n_recent, 0) = 0 THEN 'inactive' ELSE 'active' END AS status
    FROM customer
    LEFT JOIN (
      SELECT o_custkey, COUNT(*) AS n_recent
      FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01'
      GROUP BY o_custkey
    ) r ON c_custkey = o_custkey
    ORDER BY c_custkey
    """,
    tags=("null", "join"),
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling coverage: outer join introduces NULLs, handled
    with coalesce / IS NULL / CASE — three-valued logic the reference
    sidesteps entirely (strings everywhere, SURVEY §1.1)."""
    customer = _t(spark, sf_dir, "customer")
    recent = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2001-01-01"))
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_recent"))
    )
    return (
        customer.join(recent, customer.c_custkey == recent.o_custkey, "left")
        .select(
            "c_custkey",
            F.coalesce("n_recent", F.lit(0)).alias("n_recent"),
            F.col("n_recent").isNull().alias("never_recent"),
            F.when(F.coalesce("n_recent", F.lit(0)) == 0, "inactive")
            .otherwise("active")
            .alias("status"),
        )
        .orderBy("c_custkey")
    )


@register(
    "salted_nation_revenue",
    oracle="""
    SELECT n_name,
           COUNT(*) AS n_orders,
           CAST(SUM(TRY_CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    tags=("join", "skew", "agg"),
)
def salted_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation through an explicitly SALTED join
    (operators.skew.salted_join): the customer->nation key is
    low-cardinality (25 nations), the canonical hot-key shape. The
    oracle is the plain join — salting must be invisible in results."""
    from corral_spark.operators.skew import salted_join

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    oc = orders.join(customer, orders.o_custkey == customer.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_nationkey"
    )
    joined = salted_join(
        oc, nation, key="c_nationkey", salt_source="o_orderkey", buckets=8
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
        .orderBy("n_name")
    )


@register(
    "order_percentiles",
    oracle="""
    SELECT c_custkey, o_orderkey,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           ntile(4) OVER w AS quartile
    FROM orders JOIN customer ON o_custkey = c_custkey
    WINDOW w AS (PARTITION BY c_custkey
                 ORDER BY o_totalprice NULLS FIRST, o_orderkey)
    ORDER BY c_custkey, o_orderkey
    """,
    tags=("window", "stats"),
)
def order_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic ranking functions (percent_rank/cume_dist/ntile) per
    customer — pure integer-derived ratios, bit-stable across engines
    (quantized at 6dp for safety)."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_custkey").orderBy(
        F.asc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("c_custkey", "o_orderkey")
    )


@register(
    "approx_distinct_parts",
    tags=("agg", "approx"),  # rows-only: HLL sketches differ per engine
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) per return flag — the
    constant-memory distinct estimator for 100 TB cardinalities.
    Rows-only gate (sketch values are engine-specific); pytest bounds
    the estimation error against the exact count."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "asof_signup_before_purchase",
    oracle="""
    SELECT p.event_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           p.user_id,
           strftime((SELECT max(s.ts) FROM events s
                     WHERE s.user_id = p.user_id
                       AND s.event_type = 'signup'
                       AND s.ts <= p.ts), '%Y-%m-%d %H:%M:%S') AS signup_ts
    FROM events p
    WHERE p.event_type = 'purchase'
    ORDER BY p.event_id
    """,
    headline=True,
    tags=("asof", "join", "extension"),
)
def asof_signup_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (operators.asof.asof_join): each purchase
    event matched to the user's most recent signup at or before it.
    One shuffle + one sort via the union-window technique; the oracle
    is the correlated-subquery formulation."""
    events = _t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id"
    )
    signups = events.filter(F.col("event_type") == "signup").select("user_id", "ts")
    joined = asof_join(purchases, signups, on="ts", by="user_id", right_cols=[])
    return joined.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        "user_id",
        F.date_format("ts_right", "yyyy-MM-dd HH:mm:ss").alias("signup_ts"),
    ).orderBy("event_id")
