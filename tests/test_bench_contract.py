"""Pins on bench.py's driver contract (r11 verdict items 2-3).

The driver captures only the final 2000 characters of bench.py's
stdout and json-parses the LAST line; from r8 through r11 the line
outgrew the window (runs arrays inline) and every BENCH_r{N}.json
recorded "parsed": null with the tail starting mid-object. r12 split
the output: a diagnostic line first (full per-run arrays), a compact
contract line last. These tests pin (a) the compact line's size
budget against a pessimistically-wide synthetic instance of the exact
structure bench.py emits, (b) bench_doc.py's reconstruction path for
the r9-r11 legacy files, and (c) the probe fields' presence so
driver-run benches stay self-adjudicating.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

# Keys must mirror the dicts bench.py assembles; widths are pessimistic
# (five-digit seconds, nine-digit counts) so the pin fails BEFORE a
# real run would overflow the window.
_PROBE = {
    "py_single_ms": 99999.9,
    "py_fanout8_ms": 99999.9,
    "scan_mb_s": 99999.9,
    "scan_bytes": 999999999,
    "loadavg_1m": 99.99,
}
_MINHASH_METRICS = (
    "candidates",
    "pairs",
    "short_candidates",
    "hot_shingles",
    "hot_heavy_docs",
)
_GRAM_METRICS = ("windows", "coverage_rows", "distinct_grams")
_SF1_NAMES = ("minhash_pairs_docs", "pretrain_corpus", "gram_dedup_docs")


def _triples(metrics) -> dict:
    return {m: [999999999, 9999999999, 10.0] for m in metrics}


def _synthetic_contract_line() -> str:
    from corral_spark.queries import REGISTRY

    headline = [n for n, q in REGISTRY.items() if q.headline]
    assert headline, "no headline queries registered"
    out = {
        "metric": "headline_queries_total",
        "value": 99999.999,
        "unit": "sec",
        "queries": {n: 99999.999 for n in headline},
        "probe": dict(_PROBE),
        "sf": 0.1,
        "sf1": {
            "probe": dict(_PROBE),
            "queries": {n: 99999.999 for n in _SF1_NAMES},
            "ratio_vs_base": {n: 999.9 for n in _SF1_NAMES},
            "minhash_counts": _triples(_MINHASH_METRICS),
            "gram_counts": _triples(_GRAM_METRICS),
            "cross_corpus_counts": _triples(_MINHASH_METRICS),
            "fuzzy_counts": _triples(("variant_rows", "pairs")),
            "fuzzy_replicas": [1, 10],
            "fuzzy_d2_counts": _triples(("variant_rows", "pairs")),
            "fuzzy_d2_replicas": [1, 3],
            "gram_dedup_value_path": [99999.999, 99999.999, 99.9],
        },
    }
    # bench.py prints with compact separators — mirror that here.
    return json.dumps(out, separators=(",", ":"))


def test_bench_line_budget():
    line = _synthetic_contract_line()
    # 2000-char driver window minus headroom for a trailing newline
    # and a few extra headline queries before the next failure.
    assert len(line) <= 1900, (
        f"bench.py contract line is {len(line)} chars with pessimistic "
        "widths; the driver tail window is 2000 — move detail to the "
        "diagnostic line"
    )


def test_bench_doc_reconstructs_legacy_tail():
    """BENCH_r11.json (committed) is the canonical parsed-null case:
    the tail starts mid-runs-dict. Reconstruction must recover every
    base min (as min-of-runs) and the complete sf1 block."""
    from tools.bench_doc import reconstruct_from_tail, render

    wrapper = json.loads((REPO / "BENCH_r11.json").read_text())
    assert wrapper["parsed"] is None
    bench = reconstruct_from_tail(wrapper["tail"])
    assert bench["queries"]["minhash_pairs_docs"] == 4.464
    assert bench["queries"]["wordcount"] == 0.538
    sf1 = bench["sf1"]
    assert sf1["queries"]["minhash_pairs_docs"] == 56.654
    assert sf1["minhash_counts"]["candidates"]["ratio"] == 10.0
    assert sf1["fuzzy_counts"]["pairs"]["ratio"] == 10.0
    md = render(wrapper, 11)
    assert "| minhash_pairs_docs | 4.464 | 56.654 | 12.7x |" in md


def test_bench_doc_tail_starting_inside_sf1_block():
    """r12 ADVICE pin: when the tail window happens to start INSIDE
    the sf1 block, the first '\"sf1\":' occurrence in the tail is an
    inner per-metric {"base","sf1","ratio"} dict — reconstruction
    must skip it and brace-match the real section (validated by its
    own "queries" key), never silently return the inner scalar dict."""
    from tools.bench_doc import reconstruct_from_tail

    tail = (
        '{"wordcount":[0.5,0.4]},"watch":{"sf1":{"t":9.9}},'
        '"sf1":{"queries":{"minhash_pairs_docs":5.0},'
        '"ratio_vs_base":{"minhash_pairs_docs":1.1}}}\n'
    )
    bench = reconstruct_from_tail(tail)
    assert bench["queries"]["wordcount"] == 0.4
    assert bench["sf1"]["queries"]["minhash_pairs_docs"] == 5.0


def test_bench_doc_renders_compact_format():
    """The r12+ triple form renders through the same tables, and the
    probe fields appear so the section is epoch-adjudicable."""
    from tools.bench_doc import render

    bench = json.loads(_synthetic_contract_line())
    md = render(bench, 12)
    assert "| minhash.candidates | 999999999 | 9999999999 | **10.0x** |" in md
    assert "| fuzzy_d2.pairs |" in md
    assert "fuzzy d=2 replicas (data-derived) | 1 | 3 | expected **3.0x**" in md
    assert "py_single 99999.9ms" in md
    assert "no count() join pruning): 99999.999s -> 99999.999s" in md


def test_light_probe_shape():
    from tools.hostprobe import light_probe

    p = light_probe()
    assert set(p) == set(_PROBE)
    assert p["py_single_ms"] > 0 and p["scan_mb_s"] > 0
