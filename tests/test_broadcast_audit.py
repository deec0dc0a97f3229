"""CI pin for the corpus-scaled join rule (r16, SCALE.md round-16).

The sf3 canary exposed Catalyst static-planning driver-side
broadcasts of corpus-scaled relations wherever an estimate-distorting
operator (explode / Arrow UDF / checkpoint LogicalRDD) sits between
the fact scan and the exchange — fine at test SFs by luck, OOM at
30x, catastrophic at 100 TB. The rule (documented at
dedup.bucket_pairs): such joins carry explicit shuffle_hash hints;
bounded builds (fixed-size sketch registers, count-gated hot lists,
eval-set grams, dims, scalars) stay broadcastable on purpose.

This pin runs the audit classifier (tools/broadcast_audit.classify_
plan — planning only, no execution) over the queries the r16 waves
fixed, asserting the SUSPECT count per query never exceeds its
triaged allowlist. A regression — someone dropping a hint, or a new
estimate-distorted broadcast appearing in these plans — fails CI
with the query named. The full-registry sweep stays the round tool.
"""

from __future__ import annotations

import pathlib
import sys

import pytest

sys.path.insert(
    0, str(pathlib.Path(__file__).resolve().parent.parent / "tools")
)
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

SF = "/root/testdata/sf0.001"

# query -> max allowed SUSPECT builds, with the triage reason for
# each allowed residue (all bounded-by-construction; SCALE.md r16).
ALLOWED = {
    # zero-residue queries: every broadcast build is BOUNDED or
    # SELF-CORRECTING after the r16 hint passes.
    "minhash_pairs_docs": 0,
    "jaccard_pairs_docs": 0,
    "cross_corpus_near_dups": 0,
    "gram_dedup_docs": 0,
    "segment_dedup_docs": 0,
    "tfidf_top_terms": 0,
    "part_pairs_lift": 0,
    "bigram_logprob_docs": 0,
    "unigram_logprob_docs": 0,
    "cdc_chunk_dedup_docs": 0,
    # bloom register tables: m_bits/64 rows, fixed by construction.
    "bloom_new_docs": 2,
    # cms d x w counter grid (<= depth*width rows, fixed).
    "cms_bigram_counts": 1,
    # benchmark n-gram set — eval sets bounded by contract.
    "decontaminate_docs": 1,
    # count-gated hot-segment list (dedup hot_side) — ExistingRDD.
    "boilerplate_removed_docs": 1,
    # benchmark grams (bounded by contract); candidate-id joins hinted.
    "hygiene_filtered_docs": 1,
}


@pytest.fixture(scope="module")
def plans(spark):
    import __spark_entry__ as e

    qs = e.queries()
    return {
        name: qs[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
        for name in ALLOWED
    }


@pytest.mark.parametrize("name", sorted(ALLOWED))
def test_no_unexpected_corpus_scaled_broadcast(plans, name):
    from broadcast_audit import classify_plan

    suspects = [
        (kind, scans)
        for kind, scans in classify_plan(plans[name])
        if kind.startswith("SUSPECT")
    ]
    assert len(suspects) <= ALLOWED[name], (
        f"{name}: {len(suspects)} estimate-distorted broadcast builds "
        f"(allowlist {ALLOWED[name]}): {suspects} — a corpus-scaled "
        "relation is being built as a driver broadcast; apply the "
        "shuffle_hash rule (dedup.bucket_pairs docstring) or extend "
        "the triaged allowlist with a boundedness argument"
    )
