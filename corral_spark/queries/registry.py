"""Query registry plumbing.

A ``Query`` is the unit the driver's correctness gate checks: a Spark
DataFrame-producing callable plus (when SQL-expressible) an equivalent
DuckDB oracle SQL string run over the same parquet tables. Column
names/aliases MUST agree between the two — the gate sorts columns by
name before hashing values.

Determinism conventions (BASELINE.md "Determinism requirement"):
* every query ends in ORDER BY over a unique key set;
* floating aggregates are rounded (SUM -> 2 dp, AVG/ratios -> 4 dp)
  on BOTH sides so accumulation-order ulp noise can't flip the hash;
* timestamps in output are formatted to strings on both sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL; None -> driver does rows-only check
    headline: bool = False  # included in bench.py timing set
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
):
    """Decorator: register a (spark, sf_dir) -> DataFrame callable."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name=name,
            spark=fn,
            oracle=oracle,
            headline=headline,
            tags=tuple(tags),
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco
