"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` exposes every declared operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the
equivalent DuckDB SQL per query (omitted for non-SQL-expressible ops,
which get a rows-only check).

All real logic lives in the ``corral_spark`` package; this module is
a thin adapter over its query registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make corral_spark importable no matter the driver's cwd.
_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from corral_spark.queries import REGISTRY  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _ship_package_to_workers(spark: SparkSession) -> None:
    """Make ``corral_spark`` importable on executor Python workers.

    Arrow/pandas UDFs pickle references to this package; workers
    resolve them by import. When the driver process runs from a cwd
    other than the repo (and without PYTHONPATH), that import fails —
    so ship the package as a zip via addPyFile, once per session.
    """
    sc = spark.sparkContext
    if getattr(sc, "_corral_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_root = Path(__file__).resolve().parent / "corral_spark"
    zpath = Path(tempfile.gettempdir()) / "corral_spark_pkg.zip"
    with zipfile.ZipFile(zpath, "w") as zf:
        for py in sorted(pkg_root.rglob("*.py")):
            zf.write(py, py.relative_to(pkg_root.parent))
    sc.addPyFile(str(zpath))
    sc._corral_pkg_shipped = True


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship_package_to_workers(spark)
        return fn(spark, sf_dir)

    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q3-style join+agg+topk) on sf0.001."""
    return _wrap(REGISTRY["shipping_priority"].spark)(spark, SMOKE_SF_DIR)


# The driver's correctness gate records rows for the FIRST 50 queries
# only (a prefix cap). Order queries() so the cap lands where it costs
# least: in-head oracled queries first, then _DEMOTED (oracled queries
# with a prior hash-green driver row whose semantics are redundantly
# covered by in-head rows), then rows-only checks last. Every demoted
# query stays oracle-gated by pytest (tests/test_correctness.py — at
# sf0.001 by default; sf0.01 via CORRAL_TEST_SF_DIR or
# tools/driver_sim.py, which replicates the real gate exactly).
#
# ROTATION POLICY (judge round-2 item 4): each round, swap the
# longest-demoted queries back into the head and demote the freshest
# double-green queries so no oracled query's newest driver row goes
# more than ~2 rounds stale.
#
# Round 13 (final state after the two mid-round amendments — the full
# narrative lives in docs/NEXT.md ROUND 13 LEDGER): the head = the 32
# obligated r10-greens at the 2-round policy limit + FOUR r13-open
# substitutions (part_bfs_hops, part_pagerank, pretrain_corpus,
# semantic_dedup_docs — r12 implementation changes) + THREE new
# extensions12 queries (bm25_top_docs, mmr_diverse_topk,
# psi_drift_docs — new queries take head slots directly) + SIX
# NULL-campaign substitutions (orders_rollup_ivm,
# orders_minmax_refresh, ann_ivf_probes, pq_ann_topk,
# emb_near_dup_planted, segment_dedup_docs — their operators gained
# defined NULL semantics mid-r13) + ZERO alphabetical promotions:
# every r11-green alphabetical promotion was displaced by the
# amendments and returns r14 at exactly the limit.
#
# LEDGER (r14 obligations, precomputed in docs/NEXT.md):
#   r14 MUST hold the 37 r11-green queries below (2 rounds stale at
#   r14, incl. the 9 displaced), leaving 13 slots for the 48
#   r12-greens demoted below (alphabetical, amplab3 ..
#   dedup_clusters_docs; remainder due r15 at exactly the limit).
#   Steady state stays sound: 135 oracled queries / 3-round max
#   staleness = 45 required slots/round < 50.
_DEMOTED = (
    # -- r12-green, rotated out fresh (newest driver row = r12; the
    #    first 18 alphabetical are due back at r14, the rest at r15 —
    #    both precomputed in docs/NEXT.md ROUND 14 LEDGER). Every one
    #    stays oracle-gated by pytest + the full driver_sim replica
    #    every round; the benched ones (amplab3, events_tumbling_1h
    #    among them) are additionally timed by bench.py every round. --
    "amplab3",
    "big_orders_in_subquery",
    "bigram_logprob_docs",
    "bottomk_doc_stats",
    "cdc_chunk_dedup_docs",
    "click_purchase_within_1h",
    "cube_sales",
    "customer_cohort_retention",
    "customer_id_parse",
    "customers_without_orders",
    "daily_revenue_gapfill",
    "decontaminate_docs",
    "dedup_clusters_docs",
    "dedup_keep_longest_docs",
    "distinct_parts_per_flag",
    "doc_chunks",
    "doc_fingerprint_md5",
    "doc_provenance",
    "doc_repetition_stats",
    "event_hourly_anomalies",
    "event_transition_matrix",
    "events_tumbling_1h",
    "heavy_hitter_tokens",
    "high_value_order_exists",
    "incremental_dedup_new_docs",
    "multimodal_ppm_decode",
    "multimodal_wav_decode",
    "nation_set_ops",
    "nations_above_global_share",
    "null_semantics",
    "order_item_arrays",
    "order_latency",
    "order_percentiles",
    "orders_above_customer_avg",
    "orders_by_month",
    "orders_merge_upsert",
    "pack_docs_2k",
    "part_price_bins",
    "phrase_mining_docs",
    "priority_pivot",
    "quality_score_docs",
    "simhash_md5_pairs",
    "top_revenue_supplier",
    "top_tokens_per_lang",
    "udtf_sentences_docs",
    "union_all_parties",
    "weighted_sampled_docs",
    "window_top_orders",
    # -- r11-green, second round out (newest driver row = r11, 2
    #    rounds stale at r14: ALL 37 MUST take r14 head slots — the
    #    NEXT.md ROUND 14 LEDGER obligated block IS this list; the
    #    first six were displaced mid-r13 by the NULL-campaign
    #    substitutions, the next three by the new extensions12
    #    queries per the standing new-query allowance) --
    "amplab1",
    "amplab2",
    "bloom_new_docs",
    "bloom_new_docs_registers",
    "click_purchase_leftouter",
    "cms_bigram_counts",
    "cross_corpus_near_dups",
    "customer_name_features",
    "customer_running_totals",
    "dedup_exact_docs",
    "dq_report",
    "emb_int8_topk",
    "event_funnel_stages",
    "event_props_json",
    "event_props_map",
    "events_session_30m",
    "events_sliding_1h_30m",
    "fuzzy_customer_pairs",
    "fuzzy_customer_pairs_capped",
    "fuzzy_customer_pairs_lev2",
    "gram_dedup_docs",
    "hll_token_overlap_sources",
    "layout_skipping_report",
    "part_pairs_lift",
    "ppjoin_neighbor_counts",
    "price_histogram_quantiles",
    "price_outliers_mad",
    "pricing_summary",
    "purchase_by_tier_scd2",
    "qty_discount_linreg",
    "regional_revenue",
    "shipping_priority",
    "skyline_parts",
    "strong_coorder_triangles",
    "user_value_ewma",
    "wordcount",
    "zorder_parts_locality",
)


def _ordered_names() -> list[str]:
    oracled = [n for n, q in REGISTRY.items() if q.oracle is not None]
    rows_only = [n for n, q in REGISTRY.items() if q.oracle is None]
    head = [n for n in oracled if n not in _DEMOTED]
    tail = [n for n in _DEMOTED if n in REGISTRY]
    return head + tail + rows_only


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(REGISTRY[name].spark) for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }
