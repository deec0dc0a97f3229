"""Registry-wide partition-invariance audit (r13 campaign, kept as a
round tool like sweep.py): every query's result multiset must be
IDENTICAL under adversarial physical partitioning — 64 KB scan splits
(many input partitions), shuffle.partitions=7, AQE partition
coalescing off. The failure mode this hunts is order-dependent
aggregation (first() without ordering, window ties,
limit-without-sort, float sum order), which the DuckDB oracle can
miss when both engines happen to consume similar orders.

r13 baseline: 136/136 clean at sf0.001 (SCALE.md round-13).

Usage:
    python tools/partition_invariance.py [--sf DIR] [--only name,...]
                                         [--mode partition|plan]

--mode plan (r15) swaps the adversarial set for PHYSICAL-STRATEGY
knobs: broadcasts off, whole-stage codegen off, AQE off — the answer
must not depend on which plan Catalyst picks.
"""

from __future__ import annotations

import argparse
import math
import pathlib
import sys
import traceback

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def canon(df):
    cols = sorted(df.columns)

    def norm(v):
        if isinstance(v, float):
            return math.nan if math.isnan(v) else round(v, 9)
        if isinstance(v, list):
            return tuple(norm(x) for x in v)
        if isinstance(v, dict):
            return tuple(sorted((k, norm(x)) for k, x in v.items()))
        return v

    return sorted(
        (tuple(norm(r[c]) for c in cols) for r in df.collect()),
        key=lambda t: tuple(str(x) for x in t),
    )


ADVERSARIAL = {
    "spark.sql.files.maxPartitionBytes": "65536",
    "spark.sql.shuffle.partitions": "7",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}

# --mode plan (r15): PHYSICAL-STRATEGY invariance — the answer must
# not depend on which join/codegen/replan strategy Catalyst picks.
# Broadcasts forced off (every equi-join degrades to shuffle; hunts
# broadcast-dependent semantics like first-match ordering),
# whole-stage codegen off (interpreted expression path must agree
# with generated code), AQE off entirely (no runtime re-plan, no
# skew splitting). A DIVERGE here is a plan-sensitive answer — the
# class partition splits cannot reach.
PLAN_ADVERSARIAL = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.codegen.wholeStage": "false",
    "spark.sql.adaptive.enabled": "false",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--only", default="")
    ap.add_argument(
        "--mode",
        default="partition",
        choices=("partition", "plan"),
        help="partition = 64KB splits/7 shuffle partitions; "
        "plan = no broadcast, no codegen, no AQE",
    )
    args = ap.parse_args()

    import __spark_entry__ as entry
    from corral_spark.queries import REGISTRY
    from corral_spark.session import local_session

    spark = local_session("partition-invariance")
    # mapInPandas queries resolve the package by import on executor
    # Python workers — ship the zip exactly as the driver contract
    # does (running from a non-repo cwd without this ERRORS the three
    # multimodal queries; observed in the r13 campaign).
    entry._ship_package_to_workers(spark)
    adversarial = ADVERSARIAL if args.mode == "partition" else PLAN_ADVERSARIAL
    defaults = {k: spark.conf.get(k) for k in adversarial}

    names = args.only.split(",") if args.only else sorted(REGISTRY)
    fails = []
    for name in names:
        q = REGISTRY[name]
        try:
            for k, v in defaults.items():
                spark.conf.set(k, v)
            a = canon(q.spark(spark, args.sf))
            spark.catalog.clearCache()
            for k, v in adversarial.items():
                spark.conf.set(k, v)
            b = canon(q.spark(spark, args.sf))
            spark.catalog.clearCache()
            for (_i, rdd) in list(
                spark.sparkContext._jsc.getPersistentRDDs().items()
            ):
                rdd.unpersist()
            if a != b:
                fails.append(name)
                only_a = [r for r in a if r not in b][:3]
                only_b = [r for r in b if r not in a][:3]
                print(
                    f"DIVERGE {name}: n_a={len(a)} n_b={len(b)} "
                    f"only_a={only_a} only_b={only_b}",
                    flush=True,
                )
            else:
                print(f"ok {name} ({len(a)} rows)", flush=True)
        except Exception:
            fails.append(name)
            print(f"ERROR {name}:", flush=True)
            traceback.print_exc()
    for k, v in defaults.items():
        spark.conf.set(k, v)
    print("FAILS:", fails if fails else "none")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
