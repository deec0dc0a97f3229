"""SQL entry point: the engine's tables are queryable through
spark.sql with ANSI SQL producing results identical to the DataFrame
registry — the declarative surface the reference entirely lacks
(SURVEY: 'no SQL layer')."""

from __future__ import annotations

from corral_spark.queries import REGISTRY
from corral_spark.sources.tables import register_temp_views

SF = "/root/testdata/sf0.001"


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_sql_matches_dataframe_pricing_summary(spark):
    register_temp_views(spark, SF)
    sql = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)      AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(12,2)))), 2) AS DOUBLE) AS sum_disc_price,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                        * (1 - CAST(l_discount AS DECIMAL(12,2)))
                        * (1 + CAST(l_tax AS DECIMAL(12,2)))), 2) AS DOUBLE)      AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)      AS avg_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
               CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)      AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    )
    df = REGISTRY["pricing_summary"].spark(spark, SF)
    assert _rows(sql) == _rows(df)


def test_sql_matches_dataframe_window(spark):
    register_temp_views(spark, SF)
    sql = spark.sql(
        """
        SELECT c_custkey, o_orderkey, o_totalprice AS total_price, rnk
        FROM (
          SELECT c_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY c_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rnk
          FROM orders JOIN customer ON o_custkey = c_custkey
        )
        WHERE rnk <= 3
        ORDER BY c_custkey, rnk
        """
    )
    df = REGISTRY["window_top_orders"].spark(spark, SF)
    assert _rows(sql) == _rows(df)
