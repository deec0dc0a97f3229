"""Manual skew mitigation: salted joins.

AQE's skew-join splitting (enabled in session.py) handles most skew
at runtime; this operator is the explicit fallback for cases AQE
can't re-plan — e.g. a skewed key feeding a window/groupBy after the
join, or a deliberately pinned non-AQE plan. Mechanism: replicate the
small side ``buckets`` times (one copy per salt value) and scatter the
big side across salts by row hash, so one hot key's rows spread over
``buckets`` reducers instead of one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_source: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys on the big side.

    ``salt_source`` is any big-side column with high cardinality (a
    row id); the salt is a deterministic hash of it, so results are
    reproducible. The small side is exploded ``buckets``x — keep it
    broadcast-sized divided by buckets.
    """
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_source)), F.lit(buckets))
    )
    small_s = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<bigint>")),
    )
    out = big_s.join(small_s, on=[key, "__salt"], how=how)
    return out.drop("__salt")
