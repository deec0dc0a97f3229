"""Round-14 extension: reciprocal-rank-fusion hybrid retrieval —
the combiner that completes the retrieval stack (bm25_top_docs for
lexical scoring, ann_* for dense, mmr_diverse_topk for
diversification; this row fuses RANKINGS).

* rrf_hybrid_docs — fuse two retrievers over the documents corpus
  with standard RRF (Cormack, Clarke & Buettcher 2009, public):
  fused(d) = sum over systems of 1/(k + rank_s(d)), k = 60. The two
  systems are deliberately different retrieval families over the
  SAME fixed query vocabulary (extensions12._BM25_TERMS):
    A. graded lexical — the BM25 scoring frame (shared builder
       ``bm25_scored``; identical plan to bm25_top_docs), ranked by
       (bm25_micro DESC, doc_id);
    B. coordination-level boolean — Lucene-coord-style
       (n_matching_terms DESC, total tf DESC, doc_id), NO length
       normalization — the coarse retriever RRF papers fuse against
       graded ones.
  Each system contributes its top-50; fusion scores are integer
  micros (round(1e6 / (60 + rank)) — exact: no achievable rank in
  1..50 puts 1e6/(60+r) on a .5 rounding boundary, since 2e6/(60+r)
  is even for every divisor in 61..110), so the fused ordering is
  an exact BIGINT sort both engines replay bit-identically.

Scale shape: each ranking is a TakeOrderedAndProject over the shared
single-pass scoring frame (no global sort), the two 50-row lists
join by doc_id (broadcast — bounded by 2x50 rows), and the output is
a 15-row report. At 100 TB the cost is ONE corpus scan for the
scoring frame; everything after is constant-size.

No reference analog (bcongdon/corral is a Go MapReduce framework,
/root/reference/README.md — no retrieval surface); extends SURVEY
§2.4's similarity-search/retrieval family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from corral_spark.queries.extensions12 import (
    _PSI_NBIN,
    _bm25_scored_sql,
    _t,
    bm25_scored,
)
from corral_spark.queries.registry import register

_RRF_K = 60
_RRF_DEPTH = 50  # per-retriever candidate depth
_RRF_OUT = 15


def _rrf_oracle() -> str:
    return (
        _bm25_scored_sql()
        + f""",
    ra AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY bm25_micro DESC, doc_id)
                  AS INT) AS bm25_rank
      FROM scored WHERE bm25_micro > 0
      ORDER BY bm25_rank LIMIT {_RRF_DEPTH}
    ),
    rb AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (
               ORDER BY n_terms DESC, tf_total DESC, doc_id)
                  AS INT) AS bool_rank
      FROM scored WHERE n_terms > 0
      ORDER BY bool_rank LIMIT {_RRF_DEPTH}
    ),
    fused AS (
      SELECT COALESCE(ra.doc_id, rb.doc_id) AS doc_id,
             ra.bm25_rank, rb.bool_rank,
             CAST(COALESCE(ROUND(1000000.0 / ({_RRF_K} + ra.bm25_rank)), 0)
                + COALESCE(ROUND(1000000.0 / ({_RRF_K} + rb.bool_rank)), 0)
                AS BIGINT) AS rrf_micro
      FROM ra FULL OUTER JOIN rb ON ra.doc_id = rb.doc_id
    )
    SELECT doc_id, bm25_rank, bool_rank, rrf_micro
    FROM fused
    ORDER BY rrf_micro DESC, doc_id
    LIMIT {_RRF_OUT}
    """
    )


@register(
    "rrf_hybrid_docs",
    oracle=_rrf_oracle(),
    tags=("text", "retrieval", "fusion", "extension"),
)
def rrf_hybrid_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF fusion of the BM25 and coordination-boolean rankings (see
    module docstring for semantics and the exactness argument).

    Plan: ONE shared scoring pass (bm25_scored — cached so the two
    rankings don't re-scan the corpus), two TakeOrderedAndProject
    top-50s, a full-outer join of two 50-row frames, and a final
    15-row TakeOrderedAndProject on the exact integer fusion score.
    """
    scored = bm25_scored(spark, sf_dir).cache()
    ra = (
        scored.filter(F.col("bm25_micro") > 0)
        .orderBy(F.desc("bm25_micro"), F.asc("doc_id"))
        .limit(_RRF_DEPTH)
        .select(
            "doc_id",
            F.row_number()
            .over(
                Window.orderBy(F.desc("bm25_micro"), F.asc("doc_id"))
            )
            .cast("int")
            .alias("bm25_rank"),
        )
    )
    rb = (
        scored.filter(F.col("n_terms") > 0)
        .orderBy(
            F.desc("n_terms"), F.desc("tf_total"), F.asc("doc_id")
        )
        .limit(_RRF_DEPTH)
        .select(
            "doc_id",
            F.row_number()
            .over(
                Window.orderBy(
                    F.desc("n_terms"),
                    F.desc("tf_total"),
                    F.asc("doc_id"),
                )
            )
            .cast("int")
            .alias("bool_rank"),
        )
    )

    def _contrib(rank_col: str):
        return F.coalesce(
            F.round(F.lit(1000000.0) / (F.lit(_RRF_K) + F.col(rank_col))),
            F.lit(0.0),
        )

    fused = (
        ra.join(rb, "doc_id", "full_outer")
        .select(
            "doc_id",
            "bm25_rank",
            "bool_rank",
            (_contrib("bm25_rank") + _contrib("bool_rank"))
            .cast("bigint")
            .alias("rrf_micro"),
        )
    )
    return fused.orderBy(F.desc("rrf_micro"), F.asc("doc_id")).limit(
        _RRF_OUT
    )


# ------------------------------------------------------- PSI probe
#
# Diagnostic decomposition of psi_drift_docs' pipeline into
# per-stage INTEGER outputs (r14 verdict item 1). psi was the lone
# driver red for two consecutive rounds while NINE same-data local
# replicas matched; r15 root-caused it locally (the oracle's un-cast
# window SUM(BIGINT) -> HUGEINT -> float64 under fetchdf, vs Spark's
# int64 — numerically equal, hash-different) and fixed the cast.
# This probe stays registered as the driver-side witness: if psi
# ever reds again, this row's green/red splits the pipeline —
# red here = counts/smoothing/ln stage; green here + psi red =
# the final product/round/window-sum stage (or the harness).
#
# Quantizations and their measured boundary distances (sf0.001/
# sf0.01/sf0.1, docs/SCALE.md round-15): p,q at 1e12 — single IEEE
# divisions of exactly representable operands, bit-identical on any
# IEEE engine, so ANY nonzero distance-to-tie is safe (measured
# floors 4.4e-2/4.9e-3/4.0e-2); round(ln,6)*1e6 is integral by
# construction (distance exactly 0.5) and the 6dp ln itself is
# audited at a 3.2e-2 floor by test_transcendental_guard.py.

_PSI_PROBE_BASE = f"""
    WITH long AS (
      SELECT 'n_chars_bin' AS feature, {_PSI_NBIN} AS bin,
             CASE WHEN TRY_CAST(substr(source, 4) AS INT) < 10
                  THEN 'ref' ELSE 'cur' END AS side
      FROM documents
      UNION ALL
      SELECT 'lang' AS feature, lang AS bin,
             CASE WHEN TRY_CAST(substr(source, 4) AS INT) < 10
                  THEN 'ref' ELSE 'cur' END AS side
      FROM documents
    ),
    cnts AS (
      SELECT feature, bin,
             CAST(SUM(CASE WHEN side = 'ref' THEN 1 ELSE 0 END)
                  AS BIGINT) AS ref_cnt,
             CAST(SUM(CASE WHEN side = 'cur' THEN 1 ELSE 0 END)
                  AS BIGINT) AS cur_cnt
      FROM long GROUP BY feature, bin
    ),
    smoothed AS (
      SELECT feature, bin, ref_cnt, cur_cnt,
             (CAST(ref_cnt AS DOUBLE) + 0.5e0)
               / (CAST(SUM(ref_cnt) OVER (PARTITION BY feature)
                       AS DOUBLE)
               + 0.5e0 * CAST(COUNT(*) OVER (PARTITION BY feature)
                              AS DOUBLE)) AS p,
             (CAST(cur_cnt AS DOUBLE) + 0.5e0)
               / (CAST(SUM(cur_cnt) OVER (PARTITION BY feature)
                       AS DOUBLE)
               + 0.5e0 * CAST(COUNT(*) OVER (PARTITION BY feature)
                              AS DOUBLE)) AS q
      FROM cnts
    )
"""


@register(
    "psi_drift_probe",
    oracle=_PSI_PROBE_BASE
    + """
    SELECT feature, bin, ref_cnt, cur_cnt,
           CAST(round(p * 1e12) AS BIGINT) AS p_pico,
           CAST(round(q * 1e12) AS BIGINT) AS q_pico,
           CAST(round(round(ln(q / p), 6) * 1e6) AS BIGINT)
             AS lnr_micro
    FROM smoothed
    ORDER BY feature, bin
    """,
    tags=("quality", "drift", "diagnostic", "extension"),
)
def psi_drift_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage-decomposed integer witness for psi_drift_docs: the
    side-split counts, the smoothed shares as exact-division picos,
    and the 6dp-quantized ln as micros — every hashed column BIGINT
    or string, every stage independently comparable. Same plan shape
    as psi itself: one scan stacked long, one tiny combined groupBy,
    window functions over a <=2*(bins+langs)-row frame."""
    docs = _t(spark, sf_dir, "documents")
    side = F.when(
        F.substring("source", 4, 10).try_cast("int") < 10, F.lit("ref")
    ).otherwise(F.lit("cur"))
    long = docs.select(
        F.expr(
            f"stack(2, 'n_chars_bin', {_PSI_NBIN}, 'lang', lang)"
            " AS (feature, bin)"
        ),
        side.alias("side"),
    )
    cnts = long.groupBy("feature", "bin").agg(
        F.sum((F.col("side") == "ref").cast("int"))
        .cast("bigint")
        .alias("ref_cnt"),
        F.sum((F.col("side") == "cur").cast("int"))
        .cast("bigint")
        .alias("cur_cnt"),
    )
    w = Window.partitionBy("feature")
    smoothed = cnts.select(
        "*",
        (
            (F.col("ref_cnt") + F.lit(0.5))
            / (
                F.sum("ref_cnt").over(w)
                + F.lit(0.5) * F.count(F.lit(1)).over(w)
            )
        ).alias("p"),
        (
            (F.col("cur_cnt") + F.lit(0.5))
            / (
                F.sum("cur_cnt").over(w)
                + F.lit(0.5) * F.count(F.lit(1)).over(w)
            )
        ).alias("q"),
    )
    return smoothed.select(
        "feature",
        "bin",
        "ref_cnt",
        "cur_cnt",
        F.round(F.col("p") * F.lit(1e12)).cast("bigint").alias("p_pico"),
        F.round(F.col("q") * F.lit(1e12)).cast("bigint").alias("q_pico"),
        F.round(
            F.round(F.log(F.col("q") / F.col("p")), 6) * F.lit(1e6)
        )
        .cast("bigint")
        .alias("lnr_micro"),
    ).orderBy("feature", "bin")
