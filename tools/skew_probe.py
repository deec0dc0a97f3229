"""Hot-key skew campaign (r13, third new angle).

The driver testdata is uniformly distributed, so no join/window/agg
has ever seen a genuinely hot key — yet skew is THE failure mode of
100 TB shuffles. This tool builds a skewed twin of an sf directory:

* orders.o_custkey  -> customer 1 for ~30% of orders (join + per-key
  window skew);
* events.user_id    -> user 1 for ~40% of events (sessionization and
  stream-window skew);
* documents.source  -> 'src0' for ~50% of docs (groupBy/cap skew).

Then, for a join/window/agg-heavy query subset, it runs the normal
driver-gate compare on the twin (correctness under skew: the DuckDB
oracle sees the same skewed bytes) AND times each query on the
uniform vs skewed dir in the same session, printing one JSON line.
A pathological implementation shows up as a superlinear skewed/base
wall-clock ratio; AQE's skew-join splitting is left ON, as in the
production session defaults.

Usage:
  python tools/skew_probe.py build [sf_dir] [out_dir]
  python tools/skew_probe.py run   [sf_dir] [out_dir]
  python tools/skew_probe.py both  [sf_dir] [out_dir]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

QUERIES = [
    "shipping_priority",
    "regional_revenue",
    "window_top_orders",
    "customer_running_totals",
    "order_percentiles",
    "events_session_30m",
    "events_tumbling_1h",
    "user_rolling_1h",
    "source_capped_docs",
    "domain_mix_docs",
    "top_tokens_per_lang",
    "amplab3",
]


def _mask(keys: np.ndarray, salt: int, num: int, den: int) -> np.ndarray:
    h = (keys.astype(np.uint64) * np.uint64(2654435761)) ^ np.uint64(salt)
    h ^= h >> np.uint64(16)
    h *= np.uint64(2246822519)
    h ^= h >> np.uint64(13)
    return (h % np.uint64(den)) < num


def build(sf_dir: str, out_dir: str) -> None:
    from corral_spark.sources.tables import TABLES, table_path

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    plans = {
        "orders": ("o_custkey", 1, 3, 10, 77),
        "events": ("user_id", 1, 4, 10, 88),
        "documents": ("source", "src0", 5, 10, 99),
    }
    for t in TABLES:
        tbl = pq.read_table(table_path(sf_dir, t))
        if t in plans:
            col, hot, num, den, salt = plans[t]
            keys = (
                tbl.column(tbl.column_names[0])
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            m = _mask(keys, salt, num, den)
            idx = tbl.column_names.index(col)
            arr = tbl.column(col).combine_chunks()
            hot_arr = pa.array([hot] * len(tbl), type=arr.type)
            new = pa.compute.if_else(pa.array(m), hot_arr, arr)
            tbl = tbl.set_column(idx, col, new)
            print(f"{t}.{col}: {int(m.sum())}/{len(tbl)} rows -> {hot!r}")
        pq.write_table(tbl, out / f"{t}.parquet", version="2.6")


def run(sf_dir: str, skew_dir: str) -> None:
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("skew-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e
    from corral_spark.sources.tables import TABLES, table_path

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(skew_dir, t)}')"
        )
    qs, os_ = e.queries(), e.oracle_sql()
    report = {}
    fails = []
    for name in QUERIES:
        fn = qs[name]
        # correctness on the skewed twin
        sdf = fn(spark, skew_dir).toPandas()
        ok = True
        if name in os_:
            odf = con.execute(os_[name]).fetchdf()
            ok = len(sdf) == len(odf) and sorted(sdf.columns) == sorted(
                odf.columns
            )
            if ok:
                s = (
                    sdf[sorted(sdf.columns)]
                    .sort_values(by=sorted(sdf.columns))
                    .reset_index(drop=True)
                )
                o = (
                    odf[sorted(odf.columns)]
                    .sort_values(by=sorted(odf.columns))
                    .reset_index(drop=True)
                )
                ok = all(
                    (s[c].astype(str).values == o[c].astype(str).values).all()
                    for c in s.columns
                )
        if not ok:
            fails.append(name)
        # wall-clock base vs skew, min-of-2 each
        times = {}
        for label, d in (("base", sf_dir), ("skew", skew_dir)):
            best = None
            for _ in range(2):
                t0 = time.monotonic()
                qs[name](spark, d).count()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            times[label] = round(best, 3)
        ratio = round(times["skew"] / times["base"], 2) if times["base"] else None
        report[name] = {**times, "ratio": ratio, "oracle_ok": ok}
        print(name, report[name])
    print(json.dumps({"fails": fails, "report": report}))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfskew0.1"
    if mode in ("build", "both"):
        build(sf, out)
    if mode in ("run", "both"):
        run(sf, out)
