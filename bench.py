#!/usr/bin/env python
"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed to completion (count() of the final result —
every declared query is an agg/top-k, so result sets are small and the
full plan runs; nothing is collected to the driver beyond counts).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from corral_spark.queries import REGISTRY
    from corral_spark.session import local_session

    spark = local_session("corral_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench_queries = {n: q for n, q in REGISTRY.items() if q.headline}

    # Warm up the JVM/scan path once so timings measure the engine, not
    # first-touch class loading.
    next(iter(bench_queries.values())).spark(spark, sf_dir).count()
    # Also spin up the Arrow Python-worker fleet (one per core, each
    # importing pandas+pyarrow — ~15s of pure startup at local[32])
    # so the first pandas-UDF query times the operator, not the fleet.
    from pyspark.sql import functions as F

    from corral_spark.operators.dedup import word_shingles_arrow

    spark.range(256).select(
        word_shingles_arrow(F.lit("warm up the python workers"), 2)
    ).count()

    # min-of-3: a local[32] single-JVM host sees scheduler/JIT/GC noise
    # of up to 3x run-to-run (measured); the best of three runs is the
    # engine's actual cost.
    timings: dict[str, float] = {}
    for name, q in sorted(bench_queries.items()):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            q.spark(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    sf = sf_dir.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
