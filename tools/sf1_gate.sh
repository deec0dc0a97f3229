#!/bin/sh
# sf1 oracle gate (the 10x-scale correctness run; r13 verdict item —
# kept per round). Runs driver_sim against the /tmp/sf1 replication
# set (build it with: python tools/scale_data.py 10 /tmp/sf1) over
# every oracled query EXCEPT the 15 pair/cluster-family queries whose
# oracles are DELIBERATELY brute-force quadratic (all-pairs
# levenshtein/jaccard — the right oracle shape at sf0.01, 11-billion-
# pair intractable at sf1; their sf1 behavior is covered by the bench
# count canaries, exactly 10.0x/3.0x every round).
#
# Usage:  sh tools/sf1_gate.sh   (from anywhere; runs from /tmp —
#         non-repo cwd is load-bearing, see .claude/skills/verify)
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ONLY=$(python - <<EOF
import sys
sys.path.insert(0, "$REPO")
from corral_spark.queries import REGISTRY
EXCL = {
    "cross_corpus_near_dups", "dedup_clusters_docs",
    "emb_near_dup_planted", "fuzzy_customer_pairs",
    "fuzzy_customer_pairs_capped", "fuzzy_customer_pairs_lev2",
    "gram_dedup_docs", "jaccard_pairs_docs", "minhash_pairs_docs",
    "ppjoin_neighbor_counts", "pretrain_corpus",
    "pretrain_corpus_full", "pretrain_corpus_provenance",
    "semantic_dedup_docs", "simhash_md5_pairs",
}
print(",".join(sorted(n for n, q in REGISTRY.items()
                      if q.oracle and n not in EXCL)))
EOF
)
cd /tmp
CORRAL_SIM_ONLY="$ONLY" \
CORRAL_SIM_SF_DIR="${1:-/tmp/sf1}" \
PYSPARK_SUBMIT_ARGS="--driver-memory 8g pyspark-shell" \
exec python "$REPO/tools/driver_sim.py"
