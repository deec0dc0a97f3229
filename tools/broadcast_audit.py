"""Broadcast-build audit over the whole registry (r16).

The sf3 canary exposed a class of latent scale defects: Catalyst's
size estimates reach a join through scan bytes x pruning ratios x
explode/aggregate guesses, land under the autoBroadcast threshold,
and the static plan builds a CORPUS-SCALED relation as a driver-side
broadcast hash table — fine at test SFs by luck, OOM at 30x,
catastrophic at 100 TB (fixed for the minhash/jaccard family with
the corpus-scaled join rule, dedup.py bucket_pairs). This tool makes
the remaining surface visible: for every registry query it builds
the physical plan (planning only — no execution) and reports each
BroadcastExchange with the scan relations and row-reducing operators
beneath it, so a human can triage which broadcasts are
legitimately bounded (dim tables, groupBy to fixed cardinality,
count-gated frames, LIMIT/top-k) and which scale with the corpus.

Heuristic classification (printed, not enforced). The load-bearing
distinction is WHY a broadcast can be trusted at 100x:
  BOUNDED         — build side reads only dim tables, or passes a
                    Limit/TakeOrdered/Range — small at any SF.
  SELF-CORRECTING — build side is plain scan+filter+project(+agg)
                    over a fact table. Catalyst's size estimate for
                    such chains tracks the REAL file bytes, so at
                    100x the estimate exceeds the threshold and the
                    planner flips to SMJ/SHJ by itself. Broadcasting
                    at test SF is then the RIGHT plan at test SF —
                    not a latent cliff. Listed for completeness only.
  SUSPECT         — an estimate-DISTORTING operator sits between the
                    fact scan and the exchange: Generate (explode),
                    ArrowEvalPython/BatchEvalPython/MapInPandas
                    (UDFs: Catalyst guesses output size), or
                    LogicalRDD/ExistingRDD (checkpoint barrier:
                    stats frozen/defaulted). These estimates do NOT
                    track reality, so the broadcast decision cannot
                    be trusted to self-correct at scale — exactly
                    the class that OOM'd the sf3 canary in the
                    minhash family. Each needs a boundedness
                    argument (count-gated broadcast, hot-list cap)
                    or the shuffle_hash rule.

Usage:
  python tools/broadcast_audit.py [sf_dir]    # default sf0.01
  CORRAL_SIM_ONLY=a,b  to restrict
Exit code is always 0 — this is an audit surface, the judgment call
is documented per site (see SCALE.md round-16 triage).
"""

from __future__ import annotations

import os
import pathlib
import re
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

DIM_TABLES = {"region", "nation"}
FACT_TABLES = {
    "lineitem", "orders", "events", "documents", "embeddings",
    "customer", "supplier", "part",
}
# Table names come ONLY from scan lines' parquet paths — matching the
# raw plan text false-positives on "hashpartitioning" etc.
SCAN_TABLE_RE = re.compile(r"(\w+)\.parquet")
BOUNDING_RE = re.compile(r"TakeOrderedAndProject|GlobalLimit|LocalLimit|Range")
DISTORT_RE = re.compile(
    r"Generate |ArrowEvalPython|BatchEvalPython|MapInPandas|"
    r"FlatMapGroupsInPandas|Scan ExistingRDD|LogicalRDD"
)


def _subtree(lines: list[str], i: int) -> list[str]:
    """Plan-string subtree rooted at line i (greater indent below)."""
    depth = len(lines[i]) - len(lines[i].lstrip(" :+-*"))
    out = [lines[i]]
    for j in range(i + 1, len(lines)):
        d = len(lines[j]) - len(lines[j].lstrip(" :+-*"))
        if d <= depth and lines[j].strip():
            break
        out.append(lines[j])
    return out


def classify_plan(plan: str) -> list[tuple[str, list[str]]]:
    """Classify every BroadcastExchange in a physical-plan string.
    Returns [(kind, scan_tables)] — kind is BOUNDED, SELF-CORRECTING,
    or SUSPECT(<distorting operator>). Shared by the CLI below and
    the CI pin (tests/test_broadcast_audit.py)."""
    lines = plan.splitlines()
    out: list[tuple[str, list[str]]] = []
    for i, l in enumerate(lines):
        if "BroadcastExchange" not in l:
            continue
        sub = _subtree(lines, i)
        body = "\n".join(sub)
        scans = sorted(
            {
                m.group(1).lower()
                for sl in sub
                if "Scan" in sl or "FileScan" in sl
                for m in SCAN_TABLE_RE.finditer(sl)
            }
        )
        fact_scan = bool(set(scans) & FACT_TABLES)
        distorted = DISTORT_RE.search(body)
        if "IdentityBroadcastMode" in l:
            # One-row scalar (agg-to-scalar crossJoin pattern) —
            # bounded regardless of what feeds it.
            kind = "BOUNDED"
        elif BOUNDING_RE.search(body):
            kind = "BOUNDED"
        elif distorted:
            kind = f"SUSPECT({distorted.group(0).strip()})"
        elif fact_scan:
            kind = "SELF-CORRECTING"
        else:
            kind = "BOUNDED"
        out.append((kind, scans))
    return out


def main() -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("broadcast-audit")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = e.queries()
    only = os.environ.get("CORRAL_SIM_ONLY")
    if only:
        keep = {n.strip() for n in only.split(",") if n.strip()}
        qs = {n: f for n, f in qs.items() if n in keep}

    n_bc = n_suspect = 0
    suspects: list[str] = []
    for name in sorted(qs):
        try:
            plan = (
                qs[name](spark, sf)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as exc:  # noqa: BLE001 — audit, keep going
            print(f"{name}: PLAN-ERROR {type(exc).__name__}: {str(exc)[:120]}")
            continue
        for kind, scans in classify_plan(plan):
            n_bc += 1
            if kind.startswith("SUSPECT"):
                n_suspect += 1
                suspects.append(f"{name}: {kind} build over {scans}")
    for s in suspects:
        print(s)
    print(f"audited {len(qs)} queries: {n_bc} broadcast builds, "
          f"{n_suspect} SUSPECT (fact-table scan under the exchange, "
          f"no limit)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
