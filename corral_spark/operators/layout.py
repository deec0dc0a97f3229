"""Data-layout keys: Morton (Z-order) interleaving for
multi-dimensional clustering.

At 100 TB the cheapest query accelerator is the LAYOUT of the data on
disk: parquet keeps per-file/per-rowgroup min-max statistics
(zonemaps), and a scan prunes every file whose range misses the
predicate — but only along the sort key. Sorting by ONE column makes
its zonemaps tight and every other column's useless; sorting by the
Z-ORDER key interleaves the bits of several columns so that
consecutive key ranges are small HYPER-RECTANGLES in the combined
space — every interleaved column gets bounded per-file ranges, and
range predicates on ANY of them prune files. (The same Morton-code
trick Delta/Iceberg expose as OPTIMIZE ZORDER BY; here it is a plain
deterministic column expression usable with df.repartitionByRange /
sortWithinPartitions before any parquet write.)

Everything is integer shift/mask arithmetic on non-negative inputs —
pure JVM whole-stage codegen, and bit-for-bit replayable in any
engine with >> << & | operators, which is what lets a DuckDB oracle
rebuild the key (no reference analog: bcongdon/corral has no layout
surface at all).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton code of two non-negative integer columns: interleave
    the low ``bits`` bits of ``a`` (even positions) and ``b`` (odd
    positions) into one long. Inputs must already be reduced to
    [0, 2^bits) — callers bucket/modulo first; values beyond the
    range would silently alias, so keep the reduction explicit at
    the call site."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    z = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftleft(
            F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i
        )
        bbit = F.shiftleft(
            F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
        )
        z = z.bitwiseOR(abit).bitwiseOR(bbit)
    return z


def zorder_key_sql(a: str, b: str, bits: int = 16) -> str:
    """The identical Morton expression as ANSI SQL text (for oracles
    and for engines reached over SQL): bit-for-bit the same shifts,
    masks, and ors as zorder_key."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)
