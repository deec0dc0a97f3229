"""Oracle-version skew probe: static declared-type audit of every
oracle SQL vs its Spark query schema (r15 verdict item 2).

Motivation — the psi_drift_docs class, pre-discovered: the two-round
driver red was the ORACLE ENGINE's value rendering, not Spark. DuckDB
declares SUM(BIGINT) as HUGEINT; `fetchdf()` renders HUGEINT as
float64 (numpy has no int128) while Spark's column is int64 — equal
values, different dtype KIND, deterministic hash red. That rendering
is a library decision that can change between DuckDB versions (a
future release could render HUGEINT as object/Python-int, flipping
greens to reds with zero code change on our side). The prescribed
probe — rerun the replica under the newest DuckDB — is impossible in
this sandbox (no network; the pip attempt and its DNS failure are
recorded in docs/SCALE.md round-16). This audit is the
version-INDEPENDENT form: it inspects the DECLARED logical types, so
any oracle whose output column needs a rendering decision at all is
flagged regardless of which way some future fetchdf renders it.

Two flag classes, both execution-free:
  UNSTABLE  — the oracle column's declared DuckDB type has a
              version-dependent pandas rendering: HUGEINT/UHUGEINT
              (no numpy dtype exists -> library picks float64 today),
              DECIMAL (rendered float64 today; duckdb has shipped
              decimal.Decimal-object rendering behind flags), or any
              type outside the known-stable whitelist. Fix: explicit
              CAST in the oracle SQL (the psi fix pattern).
  KIND      — the declared oracle kind (int/float) differs from the
              Spark schema kind for the same column: the psi class
              itself, caught without executing either engine.

Spark schemas come from the LAZY DataFrame (plan only) wherever the
query builder does not itself run jobs; builders that must execute
(e.g. MMR's iterative argmax, kmeans training) still return a final
DataFrame whose schema is read the same way.

Usage:
  python tools/oracle_type_audit.py [sf_dir]   # default sf0.01
Exit 1 if any UNSTABLE or KIND flag fires.
"""

from __future__ import annotations

import os
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# DuckDB types whose fetchdf rendering is deterministic across
# released versions (numpy-native dtype exists, no rendering choice).
_STABLE_INT = {
    "TINYINT", "SMALLINT", "INTEGER", "BIGINT",
    "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT",
}
_STABLE_FLOAT = {"FLOAT", "DOUBLE"}
_STABLE_OTHER = {
    "VARCHAR", "BOOLEAN", "DATE", "TIME",
    "TIMESTAMP", "TIMESTAMP_NS", "TIMESTAMP WITH TIME ZONE",
    "BLOB", "INTERVAL",
}
# Declared types that REQUIRE a rendering decision -> version skew
# surface. HUGEINT is how DuckDB types SUM(BIGINT); DECIMAL is how it
# types SUM(DECIMAL)/ROUND(...,n) in some versions.
_UNSTABLE_RE = re.compile(r"HUGEINT|UHUGEINT|DECIMAL", re.I)
# Nested types render as object arrays element-by-element; the
# driver compares them by value and our canonicalizers normalize
# them — kind analysis does not apply.
_NESTED_RE = re.compile(r"\[\]$|^STRUCT|^MAP", re.I)


def _duck_kind(t: str) -> str:
    u = t.upper()
    if _NESTED_RE.search(u):
        return "nested"
    if u in _STABLE_INT:
        return "int"
    if u in _STABLE_FLOAT:
        return "float"
    if u in _STABLE_OTHER:
        return "other"
    return "unstable"


def _spark_kind(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        # A Spark-side DECIMAL output would reach toPandas as
        # decimal.Decimal objects — itself a hash-kind hazard; the
        # repo's standing rule keeps decimals internal (det.py) and
        # casts at the output boundary, so flag any that leak out.
        return "unstable"
    if isinstance(dt, (T.ArrayType, T.MapType, T.StructType)):
        return "nested"
    return "other"


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e
    from corral_spark.sources.tables import TABLES, table_path

    sf = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "CORRAL_SIM_SF_DIR", "/root/testdata/sf0.01"
    )
    print(f"ORACLE duckdb {duckdb.__version__} (declared-type audit, {sf})")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(sf, t)}')"
        )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("oracle-type-audit")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs, osql = e.queries(), e.oracle_sql()
    only = os.environ.get("CORRAL_SIM_ONLY")
    if only:
        keep = {n.strip() for n in only.split(",") if n.strip()}
        osql = {n: s for n, s in osql.items() if n in keep}

    flags: list[str] = []
    n_cols = 0
    for name in sorted(osql):
        try:
            desc = con.execute(f"DESCRIBE {osql[name]}").fetchall()
        except Exception as exc:  # noqa: BLE001 — report, keep auditing
            flags.append(f"{name}: DESCRIBE failed: {str(exc)[:160]}")
            continue
        try:
            sschema = {f.name: f.dataType for f in qs[name](spark, sf).schema.fields}
        except Exception as exc:  # noqa: BLE001
            flags.append(f"{name}: spark schema failed: {str(exc)[:160]}")
            continue
        for col, typ, *_ in desc:
            n_cols += 1
            dk = _duck_kind(typ)
            if dk == "unstable":
                flags.append(
                    f"{name}.{col}: UNSTABLE oracle type {typ} "
                    f"(fetchdf rendering is a library decision — CAST it)"
                )
                continue
            sk = _spark_kind(sschema[col]) if col in sschema else "MISSING"
            if sk == "MISSING":
                flags.append(f"{name}.{col}: not in Spark schema")
            elif sk == "unstable":
                flags.append(
                    f"{name}.{col}: UNSTABLE spark type "
                    f"{sschema[col].simpleString()} (decimal leaks to output)"
                )
            elif {sk, dk} == {"int", "float"}:
                flags.append(
                    f"{name}.{col}: KIND spark={sk} oracle={dk} ({typ}) "
                    f"— the psi class, statically"
                )
    print(f"audited {len(osql)} oracles, {n_cols} columns")
    for f in flags:
        print("FLAG", f)
    print("FLAGS:", len(flags) or "none")
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
