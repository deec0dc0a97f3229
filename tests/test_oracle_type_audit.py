"""CI pin for the oracle-version skew surface (r15 verdict item 2).

The psi_drift_docs two-round driver red was the oracle ENGINE's value
rendering: DuckDB declares SUM(BIGINT) as HUGEINT and fetchdf renders
that float64 (no numpy int128) while Spark emits int64 — value-equal,
hash-red. The rendering is a duckdb-library decision that can change
between versions, and the driver's DuckDB version is outside our
control. This pin closes the class STATICALLY: every oracle's
DECLARED result types (via DESCRIBE — execution-free) must come from
the stable whitelist, i.e. types with exactly one possible pandas
rendering. Any HUGEINT/UHUGEINT/DECIMAL in an output column fails CI
with the column named — the fix is always an explicit CAST (the psi
fix pattern). The full Spark-side KIND cross-check is
tools/oracle_type_audit.py (round tool; r16: 137 oracles / 521
columns, zero flags).
"""

from __future__ import annotations

import pathlib
import sys

import duckdb
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(
    0, str(pathlib.Path(__file__).resolve().parent.parent / "tools")
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle_types():
    import __spark_entry__ as e
    from corral_spark.sources.tables import TABLES, table_path

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(SF, t)}')"
        )
    out = {}
    for name, sql in e.oracle_sql().items():
        out[name] = con.execute(f"DESCRIBE {sql}").fetchall()
    return out


def test_every_oracle_column_is_version_stable(oracle_types):
    from oracle_type_audit import _duck_kind

    unstable = [
        f"{name}.{col}: {typ}"
        for name, desc in oracle_types.items()
        for col, typ, *_ in desc
        if _duck_kind(typ) == "unstable"
    ]
    assert not unstable, (
        "oracle output columns with version-dependent fetchdf rendering "
        "(CAST them — the psi_drift_docs fix pattern): "
        + "; ".join(unstable)
    )


def test_audit_flags_the_psi_shape():
    """Negative control: the exact un-cast window-SUM shape that caused
    the r13/r14 psi red must be flagged; its CAST twin must pass."""
    from oracle_type_audit import _duck_kind

    con = duckdb.connect()
    bad = con.execute(
        "DESCRIBE SELECT SUM(x) OVER () AS s FROM (SELECT 1::BIGINT x)"
    ).fetchall()
    good = con.execute(
        "DESCRIBE SELECT CAST(SUM(x) OVER () AS BIGINT) AS s "
        "FROM (SELECT 1::BIGINT x)"
    ).fetchall()
    assert _duck_kind(bad[0][1]) == "unstable"
    assert _duck_kind(good[0][1]) == "int"
