"""Unicode-injection oracle campaign (r13, second new angle after
tools/null_fuzz.py).

The driver testdata is pure ASCII, so no oracled query has ever
executed its Spark/DuckDB pair on a non-ASCII byte — yet the engines'
string stacks genuinely differ in reach: JDK case folding vs
utf8proc (İ, ß, ligatures), Java regex vs RE2 escapes (\\s and NBSP,
fullwidth digits), codepoint- vs byte-based levenshtein, JSON
extraction of non-ASCII values. This tool builds a corrupted twin of
an sf directory with deterministic unicode mutations in the free-text
columns and replays the driver gate on it:

* documents.text — ~20% of docs get a unicode token PREPENDED and a
  different ~10% get one APPENDED (tokens chosen by doc_id hash from
  a pool covering case folding, combining marks, CJK, fullwidth
  digits, NBSP, ligatures, emoji);
* customer.c_name — ~20% get a unicode suffix (exercises the fuzzy
  levenshtein family: two names that collide after mutation probe
  byte-vs-codepoint distance);
* events.props — ~10% of JSON payloads gain a key with a non-ASCII
  value (exercises get_json_object vs json_extract on multibyte).

Like null_fuzz, a DIVERGE here is a latent cross-engine defect class
to triage, not a driver-gate failure (the gate data is ASCII).

Usage:
  python tools/unicode_fuzz.py build [sf_dir] [out_dir]
  python tools/unicode_fuzz.py run   [out_dir]
  python tools/unicode_fuzz.py both  [sf_dir] [out_dir]
"""

from __future__ import annotations

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

#: deliberately adversarial pool: case folding that changes length
#: (İ, ẞ), a combining mark, CJK, fullwidth digits (not [0-9] in
#: either regex engine), NBSP (not \s in Java or RE2), a ligature,
#: an astral-plane emoji, and plain Latin-1 accents.
POOL = [
    "café",
    "Straße",
    "İstanbul",
    "ẞHARP",
    "中文字",
    "Ёлка",
    "ﬁle",
    "１２３",
    "naïve",
    "a b",
    "éclair",
    "🦀crab",
]


def _h(keys: np.ndarray, salt: int) -> np.ndarray:
    h = (keys.astype(np.uint64) * np.uint64(2654435761)) ^ np.uint64(salt)
    h ^= h >> np.uint64(16)
    h *= np.uint64(2246822519)
    h ^= h >> np.uint64(13)
    return h


def build(sf_dir: str, out_dir: str) -> None:
    from corral_spark.sources.tables import TABLES, table_path

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(table_path(sf_dir, t))
        keys = (
            tbl.column(tbl.column_names[0])
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        n_mut = 0

        def mutate(col_name: str, fn) -> None:
            nonlocal tbl, n_mut
            idx = tbl.column_names.index(col_name)
            vals = tbl.column(col_name).to_pylist()
            new = []
            for k, v in zip(keys, vals):
                nv = fn(int(k), v)
                if nv is not v:
                    n_mut += 1
                new.append(nv)
            tbl = tbl.set_column(idx, col_name, pa.array(new, type=pa.string()))

        if t == "documents":

            def mut_text(k: int, v):
                if v is None:
                    return v
                h1 = int(_h(np.array([k]), 11)[0])
                h2 = int(_h(np.array([k]), 22)[0])
                if h1 % 5 == 0:
                    return POOL[h1 % len(POOL)] + " " + v
                if h2 % 10 == 0:
                    return v + " " + POOL[h2 % len(POOL)]
                return v

            mutate("text", mut_text)
        elif t == "customer":

            def mut_name(k: int, v):
                if v is None:
                    return v
                h1 = int(_h(np.array([k]), 33)[0])
                if h1 % 5 == 0:
                    return v + " " + POOL[h1 % len(POOL)]
                return v

            mutate("c_name", mut_name)
        elif t == "events":

            def mut_props(k: int, v):
                if v is None or not isinstance(v, str) or not v.endswith("}"):
                    return v
                h1 = int(_h(np.array([k]), 44)[0])
                if h1 % 10 == 0:
                    tok = POOL[h1 % len(POOL)].replace('"', "")
                    return v[:-1] + f', "s": "{tok}"}}'
                return v

            mutate("props", mut_props)
        dest = out / f"{t}.parquet"
        pq.write_table(tbl, dest, version="2.6", store_schema=True)
        print(f"{t}: {len(tbl)} rows, {n_mut} mutated -> {dest}")


def run(twin_dir: str) -> None:
    # Reuse the null_fuzz runner verbatim — same compare, same
    # classification; EXPECTED_RAISES does not apply here (no nulls),
    # but keeping it is harmless.
    from tools.null_fuzz import run as _run

    _run(twin_dir)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode == "run":
        # run takes ONE positional: the twin dir (see null_fuzz).
        out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfuni0.001"
        run(out)
    else:
        sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
        out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfuni0.001"
        build(sf, out)
        if mode == "both":
            run(out)
