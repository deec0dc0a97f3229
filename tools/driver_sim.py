"""Simulate the driver: vanilla SparkSession, entry() smoke, then each
queries()[name] vs oracle_sql()[name] via duckdb at sf0.01."""
import os
import sys
import pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false")
         .appName("driver-sim").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as e
rows = e.entry(spark).collect()
print("ENTRY OK rows=", len(rows), "schema=", [f.name for f in e.entry(spark).schema.fields])

import duckdb
# Oracle engine version in every replica log (r13 verdict item 7):
# the psi_drift_docs red was adjudicated to a DuckDB
# DECIMAL-vs-DOUBLE division-resolution difference only by
# elimination — with the version on record, the next cross-engine
# red is attributable in minutes.
print("ORACLE duckdb", duckdb.__version__)
from corral_spark.sources.tables import TABLES, table_path
sf = os.environ.get("CORRAL_SIM_SF_DIR", "/root/testdata/sf0.01")
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf, t)}')")

qs, os_ = e.queries(), e.oracle_sql()
# Optional dev-loop subset (comma-separated names). The round gates
# always run the FULL replica — this exists so a query under repair
# can be re-verified at sf0.01 without paying for all of them.
only = os.environ.get("CORRAL_SIM_ONLY")
if only:
    keep = {n.strip() for n in only.split(",") if n.strip()}
    qs = {n: f for n, f in qs.items() if n in keep}
import math
from tests.oracle import dtype_kind_mismatch
fails = []
for name, fn in sorted(qs.items()):
    # A host flake (e.g. TaskResultLost under memory pressure) must
    # cost one ERROR row, not the whole replica — the real gate is
    # per-query too.
    try:
        sdf = fn(spark, sf).toPandas()
    except Exception as exc:  # noqa: BLE001 — record and continue
        print(f"{name}: ERROR {type(exc).__name__}: {str(exc)[:200]}")
        fails.append(name)
        continue
    if name not in os_:
        print(f"{name}: rows-only, {len(sdf)} rows"); continue
    odf = con.execute(os_[name]).fetchdf()
    ok_rows = len(sdf) == len(odf)
    ok_cols = sorted(sdf.columns) == sorted(odf.columns)
    ok_vals = True
    if ok_rows and ok_cols:
        s = sdf[sorted(sdf.columns)].sort_values(by=sorted(sdf.columns)).reset_index(drop=True)
        o = odf[sorted(odf.columns)].sort_values(by=sorted(odf.columns)).reset_index(drop=True)
        for c in s.columns:
            # The driver HASHES values, so int64 5 and float64 5.0 are
            # different even though Python `==` says equal (the r15
            # psi_drift_docs find) — shared helper so the three
            # replicas (this, tests/oracle.py, null_fuzz) stay in
            # lockstep (r15 ADVICE).
            if dtype_kind_mismatch(s[c], o[c]):
                print(f"{name}: DTYPE-KIND {c}: spark={s[c].dtype} oracle={o[c].dtype}")
                ok_vals = False
                break
            for a, b in zip(s[c].tolist(), o[c].tolist()):
                if isinstance(a, float) and isinstance(b, float):
                    if not (a == b or (math.isnan(a) and math.isnan(b))):
                        ok_vals = False; break
                elif a != b:
                    ok_vals = False; break
    status = "MATCH" if (ok_rows and ok_cols and ok_vals) else f"MISMATCH rows={ok_rows} cols={ok_cols} vals={ok_vals}"
    print(f"{name}: {status} ({len(sdf)} rows)")
    if "MISMATCH" in status: fails.append(name)
print("FAILS:", fails or "none")
spark.stop()
