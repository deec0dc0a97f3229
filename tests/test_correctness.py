"""Driver-gate replica: every registered query with an oracle must
match DuckDB exactly at sf0.001 (fast) — the real gate runs sf0.01.

Set CORRAL_TEST_SF_DIR=/root/testdata/sf0.01 to run at gate scale.
"""

from __future__ import annotations

import os

import pytest

from corral_spark.queries import REGISTRY
from tests.oracle import run_gate

SF_DIR = os.environ.get("CORRAL_TEST_SF_DIR", "/root/testdata/sf0.001")

ORACLE_QUERIES = sorted(name for name, q in REGISTRY.items() if q.oracle)
ROWS_ONLY_QUERIES = sorted(name for name, q in REGISTRY.items() if not q.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match(spark, name):
    q = REGISTRY[name]
    problems = run_gate(spark, SF_DIR, name, q.spark, q.oracle)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_runs(spark, name):
    q = REGISTRY[name]
    df = q.spark(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 0
    assert set(e.oracle_sql()) <= set(e.queries())
