"""Skyline (Pareto-frontier) operator.

The skyline of a set under (minimize x, maximize y) is every row not
DOMINATED by another — no other row is at-least-as-good on both
dimensions and strictly better on one. The textbook formulation is a
quadratic NOT EXISTS self-join (a theta/nested-loop join that dies at
scale); the 2-D case collapses to a SORT + RUNNING MAX: after
ordering by x ascending, a row is on the skyline iff its y strictly
exceeds every strictly-cheaper row's y (running max over the prefix)
and no same-x row has a larger y. That makes the whole operator one
window over the DISTINCT x values plus an equi-join back — shuffle
cost O(n log n) comparison work, no cartesian anywhere (plan-pinned),
which is what lets it run on a 100 TB fact table where the NOT EXISTS
plan cannot.

No reference analog (bcongdon/corral is a MapReduce framework with no
analytic operator surface); extends SURVEY §2.3's native-gap family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def skyline_min_max(
    df: DataFrame, min_col: str, max_col: str
) -> DataFrame:
    """Rows on the Pareto frontier under (minimize ``min_col``,
    maximize ``max_col``). Ties kept: two rows with identical (x, y)
    do not dominate each other, so both survive.

    Derivation (2-D sort-based skyline): row p survives iff
      (a) p.y == max(y | x == p.x)   — no same-price row strictly
          taller, and
      (b) p.y >  max(y | x <  p.x)   — no strictly-cheaper row at
          least as tall (that row would dominate p).
    (a)+(b) computed as a per-x max plus a running max over the
    ordered distinct-x frame, then one equi-join back on (x, y).
    """
    x, y = F.col(min_col), F.col(max_col)
    per_x = df.groupBy(min_col).agg(F.max(y).alias("__ymax"))
    w = Window.orderBy(min_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    frontier_x = per_x.withColumn(
        "__prev", F.max("__ymax").over(w)
    ).filter(
        F.col("__prev").isNull() | (F.col("__ymax") > F.col("__prev"))
    )
    # Equi-join back on (x, ymax): exactly the surviving rows, dup
    # (x, y) rows included. Values compare on the engine's own
    # storage representation (no arithmetic), so the join is exact
    # even for double-typed dimensions.
    return df.join(
        F.broadcast(
            frontier_x.select(
                min_col, F.col("__ymax").alias(max_col)
            )
        ),
        [min_col, max_col],
    )
