"""Duplicate-heavy corpus campaign (r13, fourth new angle).

The synthetic documents corpus is near-duplicate-POOR (random bags of
words; the standing bench canaries count a handful of natural pairs),
so the dedup family has mostly been verified in the regime where
almost nothing collides. This tool builds the opposite world — a twin
of an sf directory where

* ~30% of documents are EXACT copies of a cluster representative
  (doc_id rounded down to a multiple of 37 -> ~clusters of 5-15), and
* a further ~10% are NEAR-duplicates of their representative (one
  appended token),

then replays the driver-gate compare for the dedup/cluster family on
the twin. Oracles are brute-force quadratic by design, so run this at
sf0.001/sf0.01 only. This exercises bucket joins with REAL
collisions, verification with REAL positives, and union-find /
connected-components with REAL multi-node clusters.

Usage:
  python tools/dupheavy_probe.py build [sf_dir] [out_dir]
  python tools/dupheavy_probe.py run   [ignored] [out_dir]
  python tools/dupheavy_probe.py both  [sf_dir] [out_dir]
"""

from __future__ import annotations

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

QUERIES = [
    "dedup_exact_docs",
    "dedup_keep_longest_docs",
    "dedup_clusters_docs",
    "minhash_pairs_docs",
    "cross_corpus_near_dups",
    "gram_dedup_docs",
    "jaccard_pairs_docs",
    "ppjoin_neighbor_counts",
    "segment_dedup_docs",
    "boilerplate_removed_docs",
    "cdc_chunk_dedup_docs",
    "simhash_md5_pairs",
    "doc_fingerprint_md5",
    "incremental_dedup_new_docs",
    "pretrain_corpus",
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
    for t in TABLES:
        tbl = pq.read_table(table_path(sf_dir, t))
        if t == "documents":
            ids = tbl.column("doc_id").to_pylist()
            texts = tbl.column("text").to_pylist()
            by_id = dict(zip(ids, texts))
            keys = np.array(ids, dtype=np.int64)
            exact = _mask(keys, 7, 3, 10)
            near = _mask(keys, 13, 1, 10) & ~exact
            n_e = n_n = 0
            new_texts = []
            for pos, (i, txt) in enumerate(zip(ids, texts)):
                rep = by_id.get((i // 37) * 37, txt)
                if exact[pos] and rep is not None:
                    new_texts.append(rep)
                    n_e += 1
                elif near[pos] and rep is not None:
                    new_texts.append((rep or "") + " xyzzy")
                    n_n += 1
                else:
                    new_texts.append(txt)
            idx = tbl.column_names.index("text")
            tbl = tbl.set_column(
                idx, "text", pa.array(new_texts, type=pa.string())
            )
            print(f"documents: {n_e} exact dups, {n_n} near dups / {len(ids)}")
        pq.write_table(tbl, out / f"{t}.parquet", version="2.6")


def run(twin_dir: str) -> None:
    import math

    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("dupheavy-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e
    from corral_spark.sources.tables import TABLES, table_path

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{table_path(twin_dir, t)}')"
        )
    qs, os_ = e.queries(), e.oracle_sql()
    fails = []
    for name in QUERIES:
        sdf = qs[name](spark, twin_dir).toPandas()
        if name not in os_:
            print(f"{name}: rows-only, {len(sdf)} rows")
            continue
        odf = con.execute(os_[name]).fetchdf()
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
                for a, b in zip(s[c].tolist(), o[c].tolist()):
                    an = a is None or (isinstance(a, float) and math.isnan(a))
                    bn = b is None or (isinstance(b, float) and math.isnan(b))
                    if an and bn:
                        continue
                    if an != bn or a != b:
                        ok = False
                        why = f"col {c}: {a!r} vs {b!r}"
                        break
                if not ok:
                    break
        print(f"{name}: {'MATCH' if ok else 'DIVERGE ' + why} ({len(sdf)} rows)")
        if not ok:
            fails.append(name)
    print("FAILS:", fails or "none")
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfdup0.001"
    if mode in ("build", "both"):
        build(sf, out)
    if mode in ("run", "both"):
        run(out)
