"""Vector math over ``array<float>`` embedding columns.

All expressed with higher-order built-ins (``zip_with`` +
``aggregate``) so the hot path stays inside whole-stage codegen —
no Python round-trip per row. North-star extension surface (SURVEY
§2.4); no reference analog (the reference has no numeric arrays).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Elementwise dot product of two array<numeric> columns."""
    prods = F.zip_with(a, b, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def l2_normalize(a: Column, round_dp: int = 6) -> Column:
    """Unit-normalize, each component quantized to ``round_dp``
    decimals. The quantization is load-bearing for cross-engine
    reproducibility: downstream integer quantization flips a code
    only when a component crosses a 1/254 boundary, so agreeing on
    the first 6 decimals makes the int8 codes engine-exact (the same
    registry convention as every float-compare oracle)."""
    n = l2_norm(a)
    return F.transform(a, lambda x: F.round(x.cast("double") / n, round_dp))


def quantize_int8(unit: Column) -> Column:
    """Symmetric int8 scalar quantization of a UNIT vector:
    ``q_i = floor(127 * x_i + 0.5)`` (round-half-up, engine-exact for
    x in [-1, 1], so q in [-127, 127]). floor(x+0.5) rather than
    round() because SQL engines disagree on round-half-to-even vs
    half-away; floor is defined identically everywhere."""
    return F.transform(
        unit, lambda x: F.floor(x * F.lit(127.0) + F.lit(0.5)).cast("int")
    )


def dot_long(a: Column, b: Column) -> Column:
    """Integer dot product of two array<int> columns as BIGINT —
    exact, so rankings over it are deterministic on every engine
    (64 dims x 127^2 maxes out near 2^20, far inside BIGINT)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long"))
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)
