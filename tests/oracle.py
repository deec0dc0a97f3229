"""Local replica of the driver's correctness gate: run the Spark query
and the DuckDB oracle SQL side-by-side, canonicalize (sort columns by
name, sort rows), and compare values.

Floats are compared exactly first — an exact match predicts the
driver's value-hash will match — with a tolerance fallback that fails
loudly but distinguishes 'ulp jitter' from 'wrong answer'.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from corral_spark.sources.tables import TABLES, table_path


def oracle_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def dtype_kind_mismatch(s_col: pd.Series, o_col: pd.Series) -> bool:
    """True when two numeric columns disagree on int-vs-float KIND.

    Mirrors the driver's value-hash sensitivity: an int64 5 and a
    float64 5.0 hash DIFFERENTLY even though Python `==` says equal.
    The r13+r14 psi_drift_docs driver red was exactly this — the
    oracle's un-cast window SUM(BIGINT) came back HUGEINT -> float64
    under fetchdf() while Spark produced int64, and a numerically-lax
    compare hid it for nine local replicas. Integer WIDTH is not
    hashed (doc_repetition_stats was driver-green with int32-vs-int64
    columns), so only the int/float KIND is flagged. Booleans are
    excluded from the numeric test on both sides. Shared by
    tests/oracle.py, tools/driver_sim.py and tools/null_fuzz.py so
    the three replicas cannot drift apart (r15 ADVICE)."""
    import pandas.api.types as pt

    s_num = pt.is_numeric_dtype(s_col) and not pt.is_bool_dtype(s_col)
    o_num = pt.is_numeric_dtype(o_col) and not pt.is_bool_dtype(o_col)
    return bool(
        s_num and o_num
        and pt.is_float_dtype(s_col) != pt.is_float_dtype(o_col)
    )


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # Stringify for a stable multiset compare (mirrors a value-hash).
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> list[str]:
    """Return list of discrepancy strings; empty == exact match."""
    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        return [f"{name}: row count {len(spark_pdf)} != oracle {len(oracle_pdf)}"]
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return [f"{name}: columns {s_cols} != oracle {o_cols}"]
    s = canonicalize(spark_pdf)
    o = canonicalize(oracle_pdf)
    for col in s.columns:
        if dtype_kind_mismatch(s[col], o[col]):
            problems.append(
                f"{name}.{col}: DTYPE-KIND spark={s[col].dtype} "
                f"oracle={o[col].dtype} (driver hash distinguishes "
                f"int from float)"
            )
            continue
        sv, ov = s[col].tolist(), o[col].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if math.isnan(a) and math.isnan(b):
                    continue
                if a != b:
                    kind = (
                        "FLOAT-JITTER"
                        if b and abs(a - b) / max(abs(a), abs(b)) < 1e-9
                        else "VALUE"
                    )
                    problems.append(f"{name}.{col}[{i}]: {kind} {a!r} != {b!r}")
                    if len(problems) > 5:
                        return problems
            elif a != b:
                problems.append(f"{name}.{col}[{i}]: VALUE {a!r} != {b!r}")
                if len(problems) > 5:
                    return problems
    return problems


def run_gate(spark, sf_dir: str, name: str, spark_fn, oracle: str) -> list[str]:
    spark_pdf = spark_fn(spark, sf_dir).toPandas()
    con = oracle_connection(sf_dir)
    try:
        oracle_pdf = con.execute(oracle).fetchdf()
    finally:
        con.close()
    return compare(spark_pdf, oracle_pdf, name)
