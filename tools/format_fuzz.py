"""Storage-format twin: the SAME data under adversarial-but-valid
parquet physical encodings. A 100 TB lake is written by heterogeneous
writers — old Hive jobs emit v1 data pages, some pipelines disable
dictionary encoding, streaming compactors produce tiny row groups,
and column order drifts across schema evolutions. The engine's
answers must not depend on ANY of that: this twin rewrites every
testdata table value-identically with every physical knob turned
hostile, then (a) checks Spark's results on the twin are
BIT-IDENTICAL to Spark's results on the original (pure reader
invariance: same logical data, different physics), and (b) runs the
full cross-engine gate on the twin via the null_fuzz runner (Spark
and DuckDB read the same hostile files).

Knobs turned (all value-preserving; nothing that changes logical
semantics like INT96 timestamps or UTC-adjusted units):
  * data_page_version='1.0'   (legacy writers)
  * use_dictionary=False      (plain-encoded everything)
  * row_group_size=512        (compactor dust: many tiny groups)
  * compression='gzip'        (different codec path than the
                               original snappy/zstd)
  * column order REVERSED     (readers must bind by name, not
                               position)
  * write_statistics=False    (no row-group min/max: pruning must
                               degrade to correct full scans, never
                               to wrong answers)

Usage:
  python tools/format_fuzz.py build [sf_dir] [out_dir]
  python tools/format_fuzz.py spark [sf_dir] [out_dir]  # invariance
  python tools/format_fuzz.py run   [out_dir]           # cross-engine
  python tools/format_fuzz.py both  [sf_dir] [out_dir]  # build+spark+run
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import pyarrow.parquet as pq


def build(sf_dir: str, out_dir: str, row_group_size: int | None = None) -> None:
    """row_group_size scales with SF: 512 at sf0.001/sf0.01 is already
    compactor dust; at sf1 512-row groups mean ~11,700 groups per
    lineitem file, whose parquet FOOTER metadata alone OOMs a
    default-heap local JVM (measured r15) — use ~4096 there, which
    still yields ~1,500 groups of dust per big table.
    CORRAL_FORMAT_ROW_GROUP sets the DEFAULT only; an explicitly
    passed argument always wins (r15 ADVICE: env must not silently
    invert argument precedence)."""
    import os

    if row_group_size is None:
        row_group_size = int(os.environ.get("CORRAL_FORMAT_ROW_GROUP", 512))
    from corral_spark.sources.tables import TABLES, table_path

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(table_path(sf_dir, t))
        tbl = tbl.select(list(reversed(tbl.column_names)))
        dest = out / f"{t}.parquet"
        pq.write_table(
            tbl,
            dest,
            version="2.6",
            data_page_version="1.0",
            use_dictionary=False,
            compression="gzip",
            row_group_size=row_group_size,
            write_statistics=False,
            store_schema=True,
        )
        meta = pq.ParquetFile(dest).metadata
        print(
            f"{t}: {meta.num_rows} rows, {meta.num_row_groups} row "
            f"groups, cols reversed -> {dest}"
        )


def spark_invariance(sf_dir: str, twin_dir: str) -> None:
    """Spark-on-twin must be bit-identical to Spark-on-original for
    every registered query (multiset compare, NaN-safe)."""
    import math

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("format-fuzz")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import os

    import __spark_entry__ as e

    qs = e.queries()
    only = os.environ.get("CORRAL_NULLFUZZ_ONLY")
    if only:
        keep = {n.strip() for n in only.split(",") if n.strip()}
        qs = {n: f for n, f in qs.items() if n in keep}

    def canon(df):
        def norm(v):
            if isinstance(v, float):
                return math.nan if math.isnan(v) else v
            if isinstance(v, list):
                return tuple(norm(x) for x in v)
            if isinstance(v, dict):
                return tuple(sorted((k, norm(x)) for k, x in v.items()))
            return v

        cols = sorted(df.columns)
        return sorted(
            (tuple(norm(r[c]) for c in cols) for r in df.collect()),
            key=repr,
        )

    bad = []
    for name, fn in sorted(qs.items()):
        try:
            a = canon(fn(spark, sf_dir))
            b = canon(fn(spark, twin_dir))
        except Exception as exc:  # noqa: BLE001 — record and continue
            print(f"{name}: ERROR {type(exc).__name__}: {str(exc)[:160]}")
            bad.append(name)
            continue
        if a == b:
            print(f"{name}: INVARIANT ({len(a)} rows)")
        else:
            diff = next(
                (i for i, (x, y) in enumerate(zip(a, b)) if x != y),
                min(len(a), len(b)),
            )
            print(
                f"{name}: FORMAT-SENSITIVE rows {len(a)} vs {len(b)}, "
                f"first diff at {diff}"
            )
            bad.append(name)
    print("SPARK-INVARIANCE FAILS:", bad or "none")
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode == "run":
        out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfformat0.001"
        from tools.null_fuzz import run

        run(out)
    elif mode == "spark":
        sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
        out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfformat0.001"
        spark_invariance(sf, out)
    elif mode == "build":
        sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
        out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfformat0.001"
        build(sf, out)
    else:
        sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
        out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfformat0.001"
        build(sf, out)
        spark_invariance(sf, out)
        from tools.null_fuzz import run

        run(out)
