#!/usr/bin/env python
"""PassJoin candidate-count model for fuzzy_customer_pairs_lev2
(r16 verdict item 3: model BEFORE code — the session-6 lesson was
that the probe-restriction idea, modeled after implementation,
DOUBLED raw pairs).

PassJoin (Li, Deng, Feng, ICDE 2011) partitions each index string
into d+1 disjoint segments; by pigeonhole, lev(a, b) <= d implies b
contains at least one of a's segments verbatim (at a position shifted
by at most d). The candidate join is (segment_idx, segment_string)
equality between the index segments and the probe's enumerated
substrings of matching length within the +-d position window.

This script computes, exactly and offline, what that join would admit
on the corpus the registry query actually runs on
(sf0.1 customer.c_name: 15,000 strings "Customer#%09d", length 18,
d=2 -> 3 segments of 6 chars):

    index rows   = 45,000      (3 per string)
    probe rows   = 165,000     (length-6 substrings, |shift| <= 2)
    raw join products   = 450,045,000
    distinct pairs >= 112,492,500   (EVERY pair shares segment 0
                                     "Custom" at position 0)

vs the shipped symmetric-delete blocking, measured in r16 session 6:
raw variant-key pairs 31,735,600 and distinct candidates 17,359,986
(verified output 4,083,571). The 12-char shared template means
PassJoin's positional pigeonhole cannot discriminate at all on the
corpus's head segments: segment 0 is one hot key holding all 15,000
strings, so the candidate set degenerates to ALL pairs — a >= 6.5x
distinct-candidate and ~14x raw-volume REGRESSION. Rejected on the
model; no implementation. (PassJoin pays off when string CONTENT
varies across the prefix — real-name corpora — not on templated keys
whose variation concentrates in one suffix segment.)

Usage: python tools/passjoin_model.py [parquet_path] [d]
"""

from __future__ import annotations

import sys
from collections import Counter


def model(path: str, d: int = 2) -> dict:
    import pandas as pd

    names = pd.read_parquet(path, columns=["c_name"])["c_name"].tolist()
    lens = {len(s) for s in names}
    L = max(lens)
    seglen = L // (d + 1)
    index: Counter = Counter()
    for s in names:
        for i in range(d + 1):
            st = i * seglen
            index[(i, s[st : st + seglen])] += 1
    probe: Counter = Counter()
    for s in names:
        for i in range(d + 1):
            lo = max(0, i * seglen - d)
            hi = min(len(s) - seglen, i * seglen + d)
            for st in range(lo, hi + 1):
                probe[(i, s[st : st + seglen])] += 1
    raw = sum(c * probe.get(k, 0) for k, c in index.items())
    seg0 = Counter(s[:seglen] for s in names)
    lb = sum(c * (c - 1) // 2 for c in seg0.values())
    return {
        "strings": len(names),
        "lengths": sorted(lens),
        "segments_per_string": d + 1,
        "seglen": seglen,
        "index_rows": sum(index.values()),
        "probe_rows": sum(probe.values()),
        "raw_join_products": raw,
        "distinct_pair_lower_bound_seg0": lb,
    }


if __name__ == "__main__":
    path = sys.argv[1] if len(sys.argv) > 1 else (
        "/root/testdata/sf0.1/customer.parquet"
    )
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    for k, v in model(path, d).items():
        print(f"{k}: {v:,}" if isinstance(v, int) else f"{k}: {v}")
