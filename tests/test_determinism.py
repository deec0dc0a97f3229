"""Run-to-run determinism audit for the rows-only queries — the
oracle gate can't check their values, so this pins that re-executing
each one yields the identical multiset of rows (what any value-hash
will see)."""

from __future__ import annotations

import math

import pytest

from corral_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"

ROWS_ONLY = sorted(name for name, q in REGISTRY.items() if not q.oracle)


def _canon(df):
    cols = sorted(df.columns)

    def norm(v):
        if isinstance(v, float):
            return math.nan if math.isnan(v) else round(v, 9)
        if isinstance(v, list):
            return tuple(norm(x) for x in v)
        return v

    return sorted(tuple(norm(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_is_deterministic(spark, name):
    q = REGISTRY[name]
    a = _canon(q.spark(spark, SF))
    b = _canon(q.spark(spark, SF))
    assert a == b, f"{name} is not run-to-run deterministic"
