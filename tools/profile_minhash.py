"""Stage-level wall-clock profile of the minhash_pairs_docs pipeline
at a given SF dir (r8 verdict watch item: the sf1 timing canary
drifted 4.1x -> 5.4x while every COUNT canary stayed exactly 10.0x —
adjudicate with the same prefix method that settled pretrain in r8).

Times CUMULATIVE PREFIXES of minhash_verified_pairs' internal
pipeline (shingling -> signatures -> banded candidates -> short-path
union -> exact verification), interleaved round-robin min-of-N, so
per-stage cost = successive prefix deltas and one bad host window
cannot poison a stage's samples.

Usage: python tools/profile_minhash.py [sf_dir] [passes]
Prints one JSON line:
{"sf_dir":…, "prefix_sec":{…}, "stage_delta_sec":{…}, "rows":{…}}.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def _prefixes(spark, sf_dir):
    """Ordered (name, thunk) pairs mirroring
    dedup._minhash_cands_and_verified (threshold 0.5, 64 hashes,
    32 bands, 5-shingles — the minhash_pairs_docs configuration).
    Each thunk rebuilds its whole prefix so deltas attribute cost."""
    from corral_spark.materialize import materialize
    from corral_spark.operators.dedup import (
        SHORT_DF_MAX,
        _short_exact_cands,
        _signatures_from_tokens,
        minhash_lsh_pairs,
        minhash_verified_pairs,
    )
    from corral_spark.operators.dedup import word_shingles_arrow
    from corral_spark.sources.tables import load_table

    n_hashes, bands, threshold, shingle_n = 64, 32, 0.5, 5

    def shing():
        d = load_table(spark, sf_dir, "documents")
        s = d.select(
            F.col("doc_id").alias("id"),
            word_shingles_arrow(F.col("text"), shingle_n).alias("__sh"),
        )
        return materialize(s, eager=True)

    def sigs(s):
        tok = s.select("id", F.explode("__sh").alias("__s"))
        return _signatures_from_tokens(tok, "id", "__s", n_hashes)

    def banded(s):
        from corral_spark.operators.dedup import _banded_cands

        return _banded_cands(sigs(s), "id", bands).dropDuplicates(
            ["id_a", "id_b"]
        )

    def with_short(s):
        from corral_spark.operators.dedup import _banded_cands

        small_max = int(n_hashes / threshold)
        stok = s.filter(F.size("__sh") <= small_max).select(
            "id", F.explode("__sh").alias("__s")
        )
        small_cands, _ = _short_exact_cands(
            stok, stok, threshold, df_max=SHORT_DF_MAX, symmetric=True,
            dedup=False,
        )
        return (
            _banded_cands(sigs(s), "id", bands)
            .unionByName(small_cands)
            .dropDuplicates(["id_a", "id_b"])
        )

    def full():
        d = load_table(spark, sf_dir, "documents")
        return minhash_verified_pairs(
            d, "text", "doc_id", threshold=threshold
        )

    return [
        ("shingles_materialized", lambda: shing().count()),
        ("plus_signatures", lambda: sigs(shing()).count()),
        ("plus_banded_cands", lambda: banded(shing()).count()),
        ("plus_short_path_union", lambda: with_short(shing()).count()),
        ("full_verified_pairs", lambda: full().count()),
    ]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from corral_spark.session import local_session

    spark = local_session("profile-minhash")
    spark.sparkContext.setLogLevel("ERROR")

    def _clear_storage() -> None:
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)

    names = [n for n, _ in _prefixes(spark, sf_dir)]
    runs: dict[str, list[float]] = {n: [] for n in names}
    counts: dict[str, int] = {}
    for _ in range(passes):
        for name, thunk in _prefixes(spark, sf_dir):
            t0 = time.perf_counter()
            try:
                counts[name] = thunk()
            except Exception as exc:  # noqa: BLE001 — host flake
                print(
                    f"# {name}: sample lost ({type(exc).__name__})",
                    file=sys.stderr,
                )
                _clear_storage()
                continue
            runs[name].append(round(time.perf_counter() - t0, 3))
            _clear_storage()
    prefix = {n: (min(r) if r else None) for n, r in runs.items()}
    stage = {}
    prev = 0.0
    for n in names:
        if prefix[n] is None:
            stage[n] = None
            continue
        stage[n] = round(prefix[n] - prev, 3)
        prev = prefix[n]
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "passes": passes,
                "prefix_sec": prefix,
                "stage_delta_sec": stage,
                "rows": counts,
                "all_runs": runs,
            }
        )
    )


if __name__ == "__main__":
    main()
