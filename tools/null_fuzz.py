"""NULL-injection oracle campaign (r13, new correctness angle).

The driver testdata contains ZERO nulls, so the 135 oracled queries
have never executed their Spark/DuckDB pair on a null — yet 100 TB
production data is full of them, and the engines' defaults genuinely
differ (Spark ASC = NULLS FIRST, DuckDB ASC = NULLS LAST; UDF
batches see None, etc.). This tool builds a corrupted twin of an sf
directory with ~5% deterministic nulls in every non-primary-key
column (FKs included — null-key join semantics agree across engines
and dropping those rows is the interesting behavior), preserving the
original physical parquet schema via pyarrow (events.ts must stay
TIMESTAMP(NANOS): a DuckDB rewrite would silently retype it to
micros and change the nanosAsLong read path), then replays the
driver gate on the corrupted dir.

Classification, not pass/fail: a DIVERGE or ERROR here is NOT a
driver-gate failure (the gate data has no nulls) — it is a latent
at-scale defect class to triage:
  * ERROR(spark)  — operator not null-tolerant (UDF crash, cast trap)
  * DIVERGE       — Spark query and oracle SQL disagree on null
                    semantics (null ordering inside windows/limits,
                    null group keys, coalesce asymmetry)
  * MATCH         — the pair is null-clean end-to-end

Usage:
  python tools/null_fuzz.py build   [sf_dir] [out_dir]
  python tools/null_fuzz.py run     [out_dir]      # from a non-repo cwd
  python tools/null_fuzz.py both    [sf_dir] [out_dir]

Nulls are injected where xxhash-style mixing of (primary key value,
column index) lands in a 1/20 bucket — deterministic, so reruns and
both engines see the identical corrupted bytes (they read the same
parquet files; determinism only matters for rebuild reproducibility).
"""

from __future__ import annotations

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

#: first column of each table is the primary key and stays non-null
#: (lineitem also keeps l_linenumber so (orderkey, linenumber) stays
#: a usable unique key for ORDER BY determinism audits).
KEEP = {
    "region": {"r_regionkey"},
    "nation": {"n_nationkey"},
    "customer": {"c_custkey"},
    "supplier": {"s_suppkey"},
    "part": {"p_partkey"},
    "orders": {"o_orderkey"},
    "lineitem": {"l_orderkey", "l_linenumber"},
    "events": {"event_id"},
    "documents": {"doc_id"},
    "embeddings": {"vec_id"},
}
import os as _os

RATE_DEN = int(_os.environ.get("CORRAL_NULL_RATE_DEN", "20"))  # ~1/N nulls

#: Queries whose operators RAISE on null input BY DOCUMENTED CONTRACT
#: (loud beats silently-wrong); the raise message is matched so an
#: unrelated crash still reports as ERROR_SPARK.
EXPECTED_RAISES = {
    "skyline_parts": "skyline_min_max: NULL in dimension column",
    # r14 extreme campaign: the sampler ENFORCES its documented
    # weight bound (a silent BIGINT wrap would invert keep decisions
    # for an arbitrary subset — loud beats silently-wrong).
    "weighted_sampled_docs": (
        "weighted_bernoulli_sample: max(weight) must be < 2^31"
    ),
}


def _mask(keys: np.ndarray, colidx: int) -> np.ndarray:
    """Deterministic ~1/RATE_DEN boolean mask from key values."""
    h = (keys.astype(np.uint64) * np.uint64(2654435761)) ^ np.uint64(
        colidx * 40503 + 1
    )
    h ^= h >> np.uint64(16)
    h *= np.uint64(2246822519)
    h ^= h >> np.uint64(13)
    return (h % np.uint64(RATE_DEN)) == 0


def build(sf_dir: str, out_dir: str) -> None:
    from corral_spark.sources.tables import TABLES, table_path

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(table_path(sf_dir, t))
        key_col = tbl.column_names[0]
        keys = tbl.column(key_col).to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        cols = []
        n_injected = 0
        for i, name in enumerate(tbl.column_names):
            col = tbl.column(name)
            if name in KEEP[t]:
                cols.append(col)
                continue
            m = _mask(keys, i)
            n_injected += int(m.sum())
            arr = col.combine_chunks()
            pa_mask = pa.array(m)
            nulled = pa.compute.if_else(
                pa_mask, pa.nulls(len(tbl), type=arr.type), arr
            )
            cols.append(nulled)
        out_tbl = pa.Table.from_arrays(cols, schema=tbl.schema)
        dest = out / f"{t}.parquet"
        pq.write_table(out_tbl, dest, version="2.6", store_schema=True)
        print(f"{t}: {len(tbl)} rows, {n_injected} nulls -> {dest}")


def run(null_dir: str) -> None:
    import math
    import os

    import duckdb
    from pyspark.sql import SparkSession

    from tests.oracle import dtype_kind_mismatch

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("null-fuzz")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    from corral_spark.sources.tables import TABLES, table_path

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(null_dir, t)}')"
        )
    qs, os_ = e.queries(), e.oracle_sql()
    only = os.environ.get("CORRAL_NULLFUZZ_ONLY")
    if only:
        keep = {n.strip() for n in only.split(",") if n.strip()}
        qs = {n: f for n, f in qs.items() if n in keep}
    counts = {
        "MATCH": 0,
        "DIVERGE": 0,
        "ERROR_SPARK": 0,
        "ERROR_ORACLE": 0,
        "EXPECTED_RAISE": 0,
    }
    bad = []
    for name, fn in sorted(qs.items()):
        if name not in os_:
            continue  # rows-only queries have no oracle to diverge from
        try:
            sdf = fn(spark, null_dir).toPandas()
        except Exception as exc:  # noqa: BLE001 — classify and continue
            marker = EXPECTED_RAISES.get(name)
            if marker and marker in str(exc):
                # The operator's DOCUMENTED loud contract on null
                # input — the correct at-scale behavior (silently
                # wrong is the failure mode this campaign hunts).
                print(f"{name}: EXPECTED_RAISE ({marker!r})")
                counts["EXPECTED_RAISE"] += 1
                continue
            print(f"{name}: ERROR_SPARK {type(exc).__name__}: {str(exc)[:160]}")
            counts["ERROR_SPARK"] += 1
            bad.append(name)
            continue
        try:
            odf = con.execute(os_[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR_ORACLE {type(exc).__name__}: {str(exc)[:160]}")
            counts["ERROR_ORACLE"] += 1
            bad.append(name)
            continue
        ok = len(sdf) == len(odf) and sorted(sdf.columns) == sorted(odf.columns)
        why = "" if ok else f"rows {len(sdf)} vs {len(odf)}"
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
            for c in s.columns:
                # Driver-hash fidelity (r15 psi find): int-kind vs
                # float-kind on the same column diverges in the
                # driver even when every value compares == — shared
                # helper keeps the replicas in lockstep (r15 ADVICE).
                if dtype_kind_mismatch(s[c], o[c]):
                    ok = False
                    why = f"col {c}: DTYPE-KIND {s[c].dtype} vs {o[c].dtype}"
                    break
                for i, (a, b) in enumerate(zip(s[c].tolist(), o[c].tolist())):
                    an = a is None or (isinstance(a, float) and math.isnan(a))
                    bn = b is None or (isinstance(b, float) and math.isnan(b))
                    if an and bn:
                        continue
                    if an != bn or a != b:
                        ok = False
                        # Positional after multiset sort: when the two
                        # frames hold different values, NaN-last
                        # ordering can misalign rows, so the reported
                        # cell localizes the first POSITIONAL diff,
                        # not necessarily the semantically divergent
                        # group (r14 combo report's "0.0625 vs 0.0"
                        # was this artifact) — re-diff with a keyed
                        # merge when root-causing.
                        why = f"col {c} row {i}: {a!r} vs {b!r}"
                        break
                if not ok:
                    break
        if ok:
            counts["MATCH"] += 1
        else:
            counts["DIVERGE"] += 1
            bad.append(name)
            print(f"{name}: DIVERGE {why}")
    print("SUMMARY:", counts)
    print("BAD:", bad or "none")
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode == "run":
        # run takes ONE positional: the twin dir. (The old 3-arg
        # mapping silently ignored a 2nd arg and replayed the default
        # dir — the r14 combo-twin run initially tested the WRONG
        # corpus because of it; byte-identical twins masked it for
        # the plain null runs.)
        out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfnull0.001"
        run(out)
    else:
        sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
        out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfnull0.001"
        build(sf, out)
        if mode == "both":
            run(out)
