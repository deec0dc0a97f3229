"""Core relational queries: the reference's executable workload
(word count + AMPLab 1-3, reference examples/) mapped onto the driver
tables per FIXTURES.md §C, plus the relational operators the reference
lacks (SURVEY §2.3) that Catalyst provides natively — sort/top-k,
window functions, set ops, join variants, rollup, distinct agg.

Determinism: every query ends in a total-order ORDER BY; float
aggregates go through exact decimal arithmetic (corral_spark.functions
.det) so Spark and the DuckDB oracle produce bit-identical doubles;
pure projections pass raw column values through untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from corral_spark.functions.det import davg, dec, dsum, dsum_expr, dsum_money, dec_rate
from corral_spark.functions.text import substr_prefix, tokenize
from corral_spark.queries.registry import register
from corral_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _one_dec(scale: int = 2) -> F.Column:
    return F.lit(1).cast(f"decimal(12,{scale})")


# Shared revenue expression: exact decimal l_extendedprice*(1-l_discount)
# with the discount under the rate-domain rule (det.dec_rate).
def _revenue_dec() -> F.Column:
    return dec("l_extendedprice") * (
        F.lit(1).cast("decimal(3,2)") - dec_rate("l_discount")
    ).cast("decimal(4,2)")


#: DuckDB mirror of the same expression — keep in sync with _revenue_dec.
#: The discount factor goes through the RATE domain rule
#: (det.dec_rate — [0,1], DECIMAL(3,2), out-of-domain NULL): a
#: corrupt 1e8-scale "discount" otherwise inflates revenue sums to
#: 1e20, past even dsum_money's 2^53 headroom, and its (12,2) width
#: pushed DuckDB's product into an overflowing INT64 decimal (r14
#: extreme campaign). With the rate pinned to (4,2) after the 1-,
#: the product is (16,4) — exact INT64 range on both engines for
#: every in-domain value.
_REVENUE_SQL = (
    "TRY_CAST(l_extendedprice AS DECIMAL(12,2))"
    " * CAST(1 - (CASE WHEN l_discount BETWEEN 0 AND 1 THEN TRY_CAST(l_discount AS DECIMAL(3,2)) END) AS DECIMAL(4,2))"
)


# ---------------------------------------------------------------------------
# The reference's own workload (examples/), on the driver tables.
# ---------------------------------------------------------------------------


@register(
    "wordcount",
    oracle="""
    SELECT word, COUNT(*) AS cnt
    FROM (
      SELECT unnest(string_split_regex(trim(lower(
               regexp_replace(text, '[^a-zA-Z0-9\\s]+', ' ', 'g'))), '\\s+')) AS word
      FROM documents
    )
    WHERE word <> ''
    GROUP BY word
    ORDER BY word
    """,
    headline=True,
    tags=("reference", "scan", "flatmap", "agg"),
)
def wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word count with the reference's exact tokenizer semantics
    (reference examples/word_count/word_count.go:14-35): sanitize
    ``[^a-zA-Z0-9\\s]+`` -> space, lowercase, split on whitespace,
    count per word. scan -> flatMap(explode) -> shuffle agg, i.e.
    framework operators F1-F12 in DataFrame form."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokenize(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("word")
    )


@register(
    "amplab1",
    oracle="""
    SELECT p_name AS page_url, p_size AS page_rank
    FROM part
    WHERE p_size > 25
    ORDER BY page_url, page_rank
    """,
    tags=("reference", "filter", "project"),
)
def amplab1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMPLab Q1 (reference examples/amplab1/amplab1.go:11-33):
    SELECT pageURL, pageRank WHERE pageRank > X. rankings mapped to
    part(p_name, p_size) per FIXTURES.md §C. Filter + projection both
    push down to the parquet scan (PushedFilters in the plan)."""
    part = _t(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_size") > 25)
        .select(F.col("p_name").alias("page_url"), F.col("p_size").alias("page_rank"))
        .orderBy("page_url", "page_rank")
    )


@register(
    "amplab2",
    oracle="""
    SELECT substring(p_name, 1, 8) AS ip_prefix,
           CAST(SUM(TRY_CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS total_revenue
    FROM part
    GROUP BY 1
    ORDER BY ip_prefix
    """,
    tags=("reference", "agg", "scalar-fn"),
)
def amplab2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMPLab Q2 (reference examples/amplab2/amplab2.go:22-43):
    SELECT SUBSTR(sourceIP,1,8), SUM(adRevenue) GROUP BY 1 — prefix-8
    group key (amplab2.go:29-31, clamped substring) and a float SUM
    skipping unparsable values (amplab2.go:38-40; parquet is typed so
    nothing to skip). Mapped onto part(p_name, p_retailprice)."""
    part = _t(spark, sf_dir, "part")
    return (
        part.groupBy(substr_prefix(F.col("p_name"), 8).alias("ip_prefix"))
        .agg(dsum("p_retailprice").alias("total_revenue"))
        .orderBy("ip_prefix")
    )


@register(
    "amplab3",
    oracle="""
    SELECT c_name AS source_ip,
           CAST(SUM(TRY_CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_rank,
           CAST(SUM(TRY_CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY c_name
    ORDER BY source_ip
    """,
    headline=True,
    tags=("reference", "join", "filter", "agg"),
)
def amplab3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMPLab Q3 (reference examples/amplab3/amplab3.go:37-131):
    date-filter -> inner equi-join -> group by sourceIP with AVG(
    pageRank), AVG(adRevenue). The reference hand-writes a two-stage
    tagged-union reduce-side join (amplab3.go:75-97); here it is one
    declarative join and Catalyst/AQE picks broadcast vs sort-merge.
    Mapped onto orders ⋈ customer per FIXTURES.md §C."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        orders.filter(F.col("o_orderdate") < F.lit("1998-01-01"))
        .join(customer, orders.o_custkey == customer.c_custkey, "inner")
        .groupBy(F.col("c_name").alias("source_ip"))
        .agg(
            davg("c_acctbal").alias("avg_rank"),
            davg("o_totalprice").alias("avg_revenue"),
        )
        .orderBy("source_ip")
    )


# ---------------------------------------------------------------------------
# Relational operators the reference lacks (SURVEY §2.3) — native in Spark.
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(TRY_CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)      AS sum_qty,
           CAST(SUM(TRY_CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM({_REVENUE_SQL}), 2) AS DOUBLE)               AS sum_disc_price,
           CAST(ROUND(SUM({_REVENUE_SQL}
             * CAST(1 + (CASE WHEN l_tax BETWEEN 0 AND 1 THEN TRY_CAST(l_tax AS DECIMAL(3,2)) END) AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_charge,
           CAST(SUM(TRY_CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)      AS avg_qty,
           CAST(SUM(TRY_CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CASE WHEN l_discount BETWEEN 0 AND 1 THEN TRY_CAST(l_discount AS DECIMAL(3,2)) END) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    headline=True,
    tags=("agg", "filter"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: wide multi-aggregate hash agg
    with arithmetic expressions, all inside whole-stage codegen. The
    reference can express only single SUM/COUNT/AVG reducers
    (amplab2.go:34-43, word_count.go:29-35); this is the scaled-up form.

    The two decimal-PRODUCT sums (scale 6) go through dsum_money —
    exact-decimal ROUND to 2 dp before the double cast — because
    their scaled-integer magnitude crosses 2^53 already at the sf1
    replica (observed 1-ulp cross-engine divergence on sum_charge,
    r13; see functions/det.py:dsum_money)."""
    li = _t(spark, sf_dir, "lineitem")
    revenue = _revenue_dec()
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum_money(revenue).alias("sum_disc_price"),
            dsum_money(
                revenue
                * (F.lit(1).cast("decimal(3,2)") + dec_rate("l_tax")).cast(
                    "decimal(4,2)"
                )
            ).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            (
                F.sum(dec_rate("l_discount")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "top_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice AS total_price
    FROM orders
    ORDER BY total_price DESC, o_orderkey
    LIMIT 10
    """,
    tags=("sort", "limit"),
)
def top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k — absent from the reference (shuffle is
    partition-only, never sorted: reference README.md:213). Spark's
    TakeOrderedAndProject does this without a full sort."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey", "o_custkey", F.col("o_totalprice").alias("total_price")
        )
        .orderBy(F.desc("total_price"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(ROUND(SUM({_REVENUE_SQL}), 2) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    headline=True,
    tags=("join", "agg", "sort", "limit"),
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: selective filters on both join sides, 3-way join,
    agg, top-k. Catalyst pushes both date filters to the scans and
    broadcast-joins the filtered customer side — the plan shape the
    reference could only approximate with hand-staged MapReduce."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15"))
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-03-15"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum_money(_revenue_dec()).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "regional_revenue",
    oracle=f"""
    SELECT r_name, n_name,
           CAST(ROUND(SUM({_REVENUE_SQL}), 2) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    ORDER BY r_name, n_name
    """,
    headline=True,
    tags=("join", "agg", "broadcast"),
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-join of the fact table against three dimension tables.
    nation/region are fixed-size (25/5 rows) at every SF -> explicit
    broadcast hints are scale-safe. supplier scales with SF, so no
    forced hint — the size threshold + AQE still broadcast it whenever
    the pruned scan is actually small (checked in tests via the
    physical plan)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            dsum_money(_revenue_dec()).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("r_name", "n_name")
    )


@register(
    "window_top_orders",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice AS total_price, rnk
    FROM (
      SELECT c_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders JOIN customer ON o_custkey = c_custkey
    )
    WHERE rnk <= 3
    ORDER BY c_custkey, rnk
    """,
    tags=("window", "join"),
)
def window_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k via ROW_NUMBER window — windows are wholly absent
    from the reference (SURVEY §2.3). Spark 3.5+/4.x inserts a
    WindowGroupLimit so only 3 rows per key survive the shuffle."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("o_totalprice").alias("total_price"),
            "rnk",
        )
        .orderBy("c_custkey", "rnk")
    )


@register(
    "distinct_parts_per_flag",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS distinct_parts,
           COUNT(DISTINCT l_suppkey) AS distinct_supps
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "distinct"),
)
def distinct_parts_per_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column distinct aggregation (absent in reference, SURVEY
    §2.3); Catalyst expands to partial aggregates, no naive re-shuffle
    per distinct column."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("distinct_parts"),
            F.countDistinct("l_suppkey").alias("distinct_supps"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "rollup_sales",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL') AS return_flag,
           coalesce(l_linestatus, 'ALL') AS line_status,
           CAST(SUM(TRY_CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY return_flag, line_status
    """,
    tags=("agg", "rollup"),
)
def rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (absent in reference, SURVEY §2.3).
    Subtotal rows surfaced with 'ALL' so the hash compare is
    NULL-free."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_extendedprice").alias("sum_price"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("return_flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("line_status"),
            "sum_price",
            "n_rows",
        )
        .orderBy("return_flag", "line_status")
    )


@register(
    "nation_set_ops",
    oracle="""
    WITH cust_n AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
         supp_n AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
    SELECT 'both' AS side, nationkey FROM (SELECT nationkey FROM cust_n INTERSECT SELECT nationkey FROM supp_n)
    UNION ALL
    SELECT 'customer_only' AS side, nationkey FROM (SELECT nationkey FROM cust_n EXCEPT SELECT nationkey FROM supp_n)
    ORDER BY side, nationkey
    """,
    tags=("setop",),
)
def nation_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL — set operators absent from the
    reference (SURVEY §2.3, only input-glob union exists there)."""
    cust_n = (
        _t(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    supp_n = (
        _t(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
    )
    both = cust_n.intersect(supp_n).select(F.lit("both").alias("side"), "nationkey")
    only = cust_n.exceptAll(supp_n).select(
        F.lit("customer_only").alias("side"), "nationkey"
    )
    return both.unionAll(only).orderBy("side", "nationkey")


@register(
    "high_value_order_exists",
    oracle="""
    SELECT o_orderkey, o_totalprice AS total_price
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
    ORDER BY o_orderkey
    """,
    tags=("join", "semi"),
)
def high_value_order_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS). The reference's only join is a
    hand-rolled inner equi-join (amplab3.go:75-97); semi/anti variants
    are free in Spark."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .select("o_orderkey", F.col("o_totalprice").alias("total_price"))
        .orderBy("o_orderkey")
    )


@register(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01')
    ORDER BY c_custkey
    """,
    tags=("join", "anti"),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — absent from the reference.
    Restricted to recent orders so the result is non-trivial at every
    SF (an unrestricted anti join matches nobody: all customers have
    orders in the generated data)."""
    customer = _t(spark, sf_dir, "customer")
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2001-01-01")
    )
    return (
        customer.join(recent, customer.c_custkey == recent.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "orders_by_month",
    oracle="""
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(TRY_CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS month_revenue
    FROM orders
    GROUP BY 1
    ORDER BY order_month
    """,
    tags=("agg", "datetime"),
)
def orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar truncation + agg; exercises the date/cast functions the
    reference does ad hoc in Go (amplab3.go:57 time.Parse)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "order_month"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("month_revenue"),
        )
        .orderBy("order_month")
    )


@register(
    "event_props_json",
    oracle="""
    SELECT event_type,
           -- json_valid guard + TRY_CAST: a malformed props payload
           -- contributes NULL to the sum (DuckDB's json functions
           -- RAISE on invalid JSON; Spark's get_json_object nulls)
           -- but still counts as an event — r14 extreme campaign.
           CAST(SUM(TRY_CAST(CASE WHEN json_valid(props)
                  THEN json_extract_string(props, '$.k') END AS BIGINT))
             AS BIGINT) AS sum_k,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("json", "agg"),
)
def event_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON decode of a string column — the reference JSON-encodes
    structs into values to pass structure between stages
    (amplab3.go:70-73); here JSON is parsed natively with
    get_json_object and aggregated."""
    events = _t(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(
            F.sum(
                F.get_json_object("props", "$.k").try_cast("bigint")
            ).alias("sum_k"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


@register(
    "union_all_parties",
    oracle="""
    SELECT kind, name, acctbal
    FROM (
      SELECT 'customer' AS kind, c_name AS name, c_acctbal AS acctbal FROM customer
      UNION ALL
      SELECT 'supplier' AS kind, s_name AS name, s_acctbal AS acctbal FROM supplier
    )
    ORDER BY kind, name
    """,
    tags=("setop", "union"),
)
def union_all_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL across heterogenous sources unified to one schema —
    the reference's closest analog is globbing multiple inputs into
    one scan (job.go:192-203)."""
    c = _t(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return c.unionAll(s).orderBy("kind", "name")
