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


def test_rotation_invariants():
    """The driver records only the FIRST 50 queries; these invariants
    keep the rotation machinery honest so a registry edit cannot
    silently push an oracled query out of the gate or strand a
    demoted name: head is exactly 50 oracled queries, every demoted
    name exists and is oracled, no duplicates, and rows-only queries
    sort after every oracled one."""
    import __spark_entry__ as e
    from corral_spark.queries import REGISTRY

    names = e._ordered_names()
    assert len(names) == len(set(names)) == len(REGISTRY)
    assert len(set(e._DEMOTED)) == len(e._DEMOTED), "duplicate demotions"
    missing = [n for n in e._DEMOTED if n not in REGISTRY]
    assert not missing, f"demoted but unregistered: {missing}"
    not_oracled = [
        n for n in e._DEMOTED if REGISTRY[n].oracle is None
    ]
    assert not not_oracled, f"rows-only in demoted list: {not_oracled}"
    head = names[:50]
    assert all(
        REGISTRY[n].oracle is not None and n not in e._DEMOTED for n in head
    ), "head must be exactly the non-demoted oracled queries"
    oracled_total = sum(1 for q in REGISTRY.values() if q.oracle is not None)
    assert oracled_total - len(e._DEMOTED) == 50, (
        f"head size {oracled_total - len(e._DEMOTED)} != 50: rebalance "
        "_DEMOTED when adding/removing oracled queries"
    )
    rows_only_positions = [
        i for i, n in enumerate(names) if REGISTRY[n].oracle is None
    ]
    assert all(i >= oracled_total for i in rows_only_positions)
