"""Host-speed probe: a fixed, code-independent workload whose
round-over-round ratio separates "the host epoch got slower" from
"the engine got slower" (r8 verdict item 2: the headline total
drifted +8.5% with every query moving together and every count
canary at exactly 10.0x — the host-noise signature — but the round
comparator needs a number, not a signature).

Four fixed measurements, min-of-3 each:
  * py_single_ms  — single-core Python arithmetic loop (CPU clock)
  * py_fanout_ms  — the same loop on 8 threads via check-interval
                    round-robin is pointless under the GIL, so the
                    fan-out probe uses 8 PROCESSES (scheduler +
                    multi-core health)
  * scan_mb_s     — cold-ish sequential read of the sf0.1 parquet
                    dir through the page cache (I/O path)
  * jvm_start_ms  — `java -version` wall time (JVM spawn cost that
                    fronts every Spark action's first run)

Usage: python tools/hostprobe.py   ->  one JSON line.
Compare against the value recorded in docs/SCALE.md round 9: if the
probe moved with the headline total, the drift is the host; if the
probe held and one query moved alone, it's code.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import time


def _spin(n: int = 2_000_000) -> int:
    acc = 0
    for i in range(n):
        acc = (acc * 1103515245 + i) & 0x7FFFFFFF
    return acc


def _time(fn, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best * 1000, 1)


def light_probe() -> dict:
    """The adjudication dimensions (py_single CPU clock, 8-process
    fan-out, scan MB/s), ~3s total — cheap enough for bench.py to
    embed INSIDE its output JSON before the headline loop and again
    before the sf1 block, so every driver-run BENCH_r{N}.json carries
    its own epoch evidence (r11 verdict item 2: the driver benches
    after snapshot, so its epoch could never be probed after the
    fact). py_fanout8 joined in r13 (r12 verdict item 3): the r12
    driver headline read 45-56% above two same-code probe-paired
    runs while py_single/scan read FAST — only loadavg flagged the
    contention; a fan-out dimension MEASURES a contended scheduler
    instead of inferring it. Fork context explicitly: the probe runs
    inside a live Spark driver, and the children only execute the
    module-level arithmetic loop and exit."""
    py_single = _time(_spin)

    def fanout():
        with mp.get_context("fork").Pool(8) as p:
            p.map(_spin, [2_000_000] * 8)

    py_fanout = _time(fanout)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    total = 0

    def scan():
        nonlocal total
        total = 0
        for name in sorted(os.listdir(sf_dir)):
            path = os.path.join(sf_dir, name)
            if not os.path.isfile(path):  # dir-per-table layouts
                continue
            with open(path, "rb") as f:
                while chunk := f.read(1 << 20):
                    total += len(chunk)

    scan_ms = _time(scan)
    return {
        "py_single_ms": py_single,
        "py_fanout8_ms": py_fanout,
        "scan_mb_s": round((total / (1 << 20)) / (scan_ms / 1000), 1),
        "scan_bytes": total,
        "loadavg_1m": round(os.getloadavg()[0], 2),
    }


def main() -> None:
    out = light_probe()

    jvm = _time(
        lambda: subprocess.run(
            ["java", "-version"], capture_output=True, check=True
        )
    )
    out["jvm_start_ms"] = jvm
    print(
        json.dumps(
            {
                k: out[k]
                for k in (
                    "py_single_ms",
                    "py_fanout8_ms",
                    "scan_mb_s",
                    "scan_bytes",
                    "jvm_start_ms",
                    "loadavg_1m",
                )
            }
        )
    )


if __name__ == "__main__":
    main()
