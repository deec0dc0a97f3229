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
    _bm25_scored_sql,
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
