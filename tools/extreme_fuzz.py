"""Extreme-value oracle campaign (r14, new correctness angle).

The r13 sf1 gate caught a REAL boundary bug the null/unicode/skew
campaigns could not see: ``pricing_summary.sum_charge`` off by one
double ULP once the scale-6 decimal sum crossed 2^53 (fixed by
``det.dsum_money``). That bug class — values near representation
boundaries, degenerate-but-legal values — had no systematic probe.
100 TB production data WILL contain zero-norm embeddings, empty and
5 KB strings, epoch-adjacent timestamps, 2^53-scale integers, -0.0,
and malformed JSON.

This tool builds a corrupted twin of an sf directory where ~1/20 of
each non-primary-key column's rows (deterministic mask, same
machinery as null_fuzz) are replaced with a type-appropriate EXTREME
from a fixed palette, preserving the physical parquet schema via
pyarrow, then replays the full driver gate (Spark query vs DuckDB
oracle) on the twin via null_fuzz's runner — same classification:

  * MATCH        — the pair is boundary-clean end-to-end
  * DIVERGE      — engines disagree on extreme-value semantics
  * ERROR_*      — an operator (or its oracle) cannot ingest the value

Palette (cycled per masked row by key value):
  int64    0, -1, 2^53-1, -(2^53-1), 2^31-1
  int32    0, -1, 2^31-1, -2^31+1
  double   0.0, -0.0, 1e15, -1e15, 1e-15, 123456789.123456789
  ts[us]   1970-01-01T00:00:00, 1899-12-31T23:59:59,
           2199-01-01T00:00:00, 1969-12-31T23:59:59.999999
  string   '', ' ', 'x', '-1', 'a'*5000   (text-bearing columns get a
           5 KB token-repeat document instead of 'a'*5000 so
           tokenizers see a long-but-real doc)
  props    '{}', '', '{"a":"1e999"}', '{"n":99999999999999999999}',
           '[1,2]'   (valid-empty, invalid, overflow-adjacent,
           non-object roots — the schema-on-read gauntlet)
  list<f>  [], [0,0,...] (zero norm), [1e30,...], half-length vector

Usage:
  python tools/extreme_fuzz.py build [sf_dir] [out_dir]
  python tools/extreme_fuzz.py run   [out_dir]           # non-repo cwd
  python tools/extreme_fuzz.py both  [sf_dir] [out_dir]
"""

from __future__ import annotations

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from tools.null_fuzz import KEEP, _mask

INT64_PALETTE = [0, -1, 2**53 - 1, -(2**53) + 1, 2**31 - 1]
INT32_PALETTE = [0, -1, 2**31 - 1, -(2**31) + 1]
DOUBLE_PALETTE = [0.0, -0.0, 1e15, -1e15, 1e-15, 123456789.123456789]
#: micros since epoch
TS_PALETTE = [
    0,                      # 1970-01-01T00:00:00
    -2208988801_000000,     # 1899-12-31T23:59:59
    7226582400_000000,      # 2199-01-02T00:00:00
    -1,                     # 1969-12-31T23:59:59.999999
]
STRING_PALETTE = ["", " ", "x", "-1", "a" * 5000]
TEXT_PALETTE = ["", " ", "x", "-1", ("lorem ipsum " * 420).strip()]
PROPS_PALETTE = [
    "{}",
    "",
    '{"a":"1e999"}',
    '{"n":99999999999999999999}',
    "[1,2]",
]

#: text-shaped columns get real-looking long docs, not 'aaaa...'
TEXT_COLS = {"text"}
PROPS_COLS = {"props"}


def _palette_for(name: str, typ: pa.DataType):
    if name in PROPS_COLS:
        return PROPS_PALETTE
    if name in TEXT_COLS:
        return TEXT_PALETTE
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return STRING_PALETTE
    if pa.types.is_int64(typ):
        return INT64_PALETTE
    if pa.types.is_int32(typ):
        return INT32_PALETTE
    if pa.types.is_floating(typ):
        return DOUBLE_PALETTE
    if pa.types.is_timestamp(typ):
        return TS_PALETTE
    return None


def _build_column(name, arr, typ, m, keys):
    """Replace masked rows of ``arr`` with palette extremes."""
    if pa.types.is_list(typ):
        # embeddings: build python lists (row count is small at the
        # fuzz SF; the twin build is offline tooling, not a data path)
        vals = arr.to_pylist()
        dim = next((len(v) for v in vals if v is not None), 8)
        lp = [
            [],                          # empty
            [0.0] * dim,                 # zero norm
            [1e30] * dim,                # huge magnitude
            [1.0] * max(1, dim // 2),    # wrong length
        ]
        out = [
            lp[int(keys[i]) % len(lp)] if m[i] else vals[i]
            for i in range(len(vals))
        ]
        return pa.array(out, type=typ), int(m.sum())
    pal = _palette_for(name, typ)
    if pal is None:
        return arr, 0
    vals = arr.to_pylist()
    if pa.types.is_timestamp(typ):
        import datetime as dt

        unit_pal = [
            dt.datetime(1970, 1, 1)
            + dt.timedelta(microseconds=us)
            for us in pal
        ]
        pal = unit_pal
    out = [
        pal[int(keys[i]) % len(pal)] if m[i] else vals[i]
        for i in range(len(vals))
    ]
    return pa.array(out, type=typ), int(m.sum())


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
        cols, n_injected = [], 0
        for i, name in enumerate(tbl.column_names):
            col = tbl.column(name).combine_chunks()
            if name in KEEP[t]:
                cols.append(col)
                continue
            m = _mask(keys, i)
            new, n = _build_column(name, col, col.type, m, keys)
            n_injected += n
            cols.append(new)
        out_tbl = pa.Table.from_arrays(cols, schema=tbl.schema)
        dest = out / f"{t}.parquet"
        pq.write_table(out_tbl, dest, version="2.6", store_schema=True)
        print(f"{t}: {len(tbl)} rows, {n_injected} extremes -> {dest}")


def run(twin_dir: str) -> None:
    from tools.null_fuzz import run as _run

    _run(twin_dir)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    if mode == "run":
        # run takes ONE positional: the twin dir (see null_fuzz).
        out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfextreme0.001"
        run(out)
    else:
        sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
        out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfextreme0.001"
        build(sf, out)
        if mode == "both":
            run(out)
