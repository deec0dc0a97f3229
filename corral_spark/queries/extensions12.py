"""Round-13 extensions: three first-class LLM-pipeline operators the
registry did not yet cover —

* bm25_top_docs — Okapi BM25 retrieval over the documents corpus for
  a fixed query-term set. Unlike tfidf_top_terms (per-document
  characteristic terms), this is the retrieval direction: score every
  document against a query and return the global top-k. The plan is
  deliberately shuffle-free: per-term tf and doc length are array
  expressions on the tokenized text (no explode, no (doc, term)
  shuffle), corpus stats (N, sum dl, per-term df) are ONE single-row
  aggregate broadcast back, and the top-k is TakeOrderedAndProject.
  At 100 TB this is two column-pruned scans (the stats pass must
  finish before scoring — the scalar-subquery shape) and zero wide
  shuffles — the cheapest retrieval plan for a bounded query
  vocabulary.
* psi_drift_docs — population-stability-index drift report between
  two corpus snapshots (sources src0-9 = reference, src10-19 =
  current), per feature (n_chars bins, lang shares). The standard
  pre-training data-quality gate for "did the new crawl shift the
  distribution". One scan -> stack to (feature, bin) long format ->
  one tiny groupBy; PSI terms are integer micros so the per-feature
  total is an EXACT bigint sum (order-free), with the single ln per
  bin quantized to 6dp before multiplication (the unigram_logprob
  ln-determinism convention).
* mmr_diverse_topk — greedy maximal-marginal-relevance selection
  over the embeddings corpus (operators.similarity.mmr_topk): k
  rounds of distributed argmax of ``lam*sim(q,d) - (1-lam)*max sim(d,
  selected)``. The oracle unrolls all k rounds as cumulative CTEs;
  every similarity is quantized to 4dp before the argmax (the
  ann_cosine_topk convention) so the selection replays bit-exactly.

No reference analog (bcongdon/corral is a Go MapReduce framework,
/root/reference/README.md — no retrieval/drift/diversity surface);
these extend SURVEY §2.4's LLM-pipeline families (similarity search,
quality gates, corpus curation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from corral_spark.functions.text import tokenize
from corral_spark.operators.similarity import mmr_topk
from corral_spark.queries.registry import register
from corral_spark.sources.tables import load_table

#: DuckDB mirror of functions.text.tokenize (same string as the
#: tfidf/dedup oracles — extensions2._TOK_SQL).
_TOK_SQL = (
    "list_filter(string_split_regex(trim(lower("
    "regexp_replace({col}, '[^a-zA-Z0-9\\s]+', ' ', 'g'))), '\\s+'),"
    " x -> x <> '')"
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------- BM25
#
# Fixed query vocabulary: three corpus terms spanning the df range.
# k1/b are the Robertson defaults; idf is the Lucene non-negative
# variant ln(1 + (N - df + .5)/(df + .5)). The ONLY transcendental is
# the idf — 3 values per corpus — quantized to 6dp in the stats row,
# so the per-doc score is pure IEEE-rational arithmetic on identical
# doubles in both engines and the micro-integer quantization cannot
# diverge (ln ulp exposure is 3 trials per corpus, not 3-per-doc).

_BM25_TERMS = ("spark", "window", "merge")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20


def _bm25_scored_sql() -> str:
    """Shared oracle CTE prefix: perdoc/stats/scored — every BM25-
    scored document with its dl, matched-term count, total tf, and
    integer-micro score. Used by the bm25_top_docs oracle and by the
    rrf_hybrid_docs oracle (extensions13), so the two replays cannot
    drift."""
    tok = _TOK_SQL.format(col="text")
    tf_cols = ",\n             ".join(
        f"CAST(len(list_filter({tok}, x -> x = '{t}')) AS BIGINT) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ",\n             ".join(
        f"CAST(SUM(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    idf_cols = ",\n             ".join(
        f"round(ln(1 + (n_docs - df{i} + 0.5) / (df{i} + 0.5)), 6) AS idf{i}"
        for i in range(len(_BM25_TERMS))
    )
    score_terms = "\n           + ".join(
        f"(CASE WHEN tf{i} > 0 THEN CAST(round(idf{i} * (tf{i} * {_BM25_K1 + 1})"
        f" / (tf{i} + {_BM25_K1} * ({1 - _BM25_B} + {_BM25_B} * dl / avg_dl))"
        f" * 1000000) AS BIGINT) ELSE 0 END)"
        for i in range(len(_BM25_TERMS))
    )
    n_terms = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END)"
        for i in range(len(_BM25_TERMS))
    )
    tf_total = " + ".join(f"tf{i}" for i in range(len(_BM25_TERMS)))
    return f"""
    WITH perdoc AS (
      SELECT doc_id, CAST(len({tok}) AS BIGINT) AS dl,
             {tf_cols}
      FROM documents
      WHERE text IS NOT NULL
    ),
    stats0 AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS BIGINT) AS sum_dl,
             {df_cols}
      FROM perdoc
    ),
    stats AS (
      SELECT *, CAST(sum_dl AS DOUBLE) / n_docs AS avg_dl,
             {idf_cols}
      FROM stats0
    ),
    scored AS (
      SELECT doc_id, dl, CAST({n_terms} AS INT) AS n_terms,
             CAST({tf_total} AS BIGINT) AS tf_total,
             ({score_terms}) AS bm25_micro
      FROM perdoc, stats
    )
    """


def _bm25_oracle() -> str:
    return (
        _bm25_scored_sql()
        + f"""
    SELECT doc_id, dl, n_terms, bm25_micro
    FROM scored
    WHERE bm25_micro > 0
    ORDER BY bm25_micro DESC, doc_id
    LIMIT {_BM25_TOPK}
    """
    )


def bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every BM25-scored document (doc_id, dl, n_terms, tf_total,
    bm25_micro) — the shared scoring frame behind bm25_top_docs and
    rrf_hybrid_docs (extensions13). Plan shape documented on
    bm25_top_docs; the SQL twin is _bm25_scored_sql()."""
    return _bm25_scored_frame(spark, sf_dir)


@register(
    "bm25_top_docs",
    oracle=_bm25_oracle(),
    tags=("text", "retrieval", "extension"),
)
def bm25_top_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 documents for a 3-term query with no wide
    shuffle: tf per term and doc length are array expressions over
    the tokenize (no explode, no (doc, term) groupBy), corpus stats
    (N, sum dl, df per term) are a single-row aggregate broadcast
    back via crossJoin (BNLJ over ONE row — the audited
    scalar-subquery shape, test_plans allowlist), and the top-20 is
    TakeOrderedAndProject. Two column-pruned scans total. idf is
    quantized to 6dp in the stats row (3 ln calls per corpus, not
    3 per doc) so the per-doc arithmetic is engine-identical IEEE
    rationals; scores emitted as integer micros."""
    scored = bm25_scored(spark, sf_dir).drop("tf_total").filter(
        F.col("bm25_micro") > 0
    )
    return scored.orderBy(F.desc("bm25_micro"), F.asc("doc_id")).limit(
        _BM25_TOPK
    )


def _bm25_scored_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")

    # NB: the predicate must be an ARITY-1 lambda — F.filter treats a
    # two-parameter lambda as (element, index), so the usual
    # ``lambda w, t=t`` closure idiom silently binds t to the index
    # column and the filter matches nothing.
    def _eq(term: str):
        return lambda w: w == F.lit(term)

    # Tokenize in its OWN projection: dl + the per-term tfs reference
    # the array 4x, and CollapseProject declines to re-inline a
    # multiply-referenced non-cheap expression — so the regex
    # tokenizer runs once per row instead of four times (verified in
    # the physical plan: 1 regexp_replace per scan, was 4).
    # NULL text is not a retrievable document (r13 convention:
    # explicit boundary on BOTH sides, so the semantics don't depend
    # on spark.sql.ansi.enabled / legacy.sizeOfNull — under the
    # repo's legacy session size(NULL) = -1 would otherwise poison
    # sum_dl and shift every doc's avg_dl/bm25_micro).
    with_toks = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", tokenize(F.col("text")).alias("__toks")
    )
    perdoc = with_toks.select(
        "doc_id",
        F.size("__toks").cast("bigint").alias("dl"),
        *[
            F.size(F.filter(F.col("__toks"), _eq(t)))
            .cast("bigint")
            .alias(f"tf{i}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    )
    stats = perdoc.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("int"))
            .cast("bigint")
            .alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    ).select(
        "*",
        (F.col("sum_dl").cast("double") / F.col("n_docs")).alias("avg_dl"),
        *[
            F.round(
                F.log(
                    F.lit(1)
                    + (F.col("n_docs") - F.col(f"df{i}") + F.lit(0.5))
                    / (F.col(f"df{i}") + F.lit(0.5))
                ),
                6,
            ).alias(f"idf{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    joined = perdoc.crossJoin(F.broadcast(stats))
    score_terms = [
        F.when(
            F.col(f"tf{i}") > 0,
            F.round(
                F.col(f"idf{i}")
                * (F.col(f"tf{i}") * F.lit(_BM25_K1 + 1))
                / (
                    F.col(f"tf{i}")
                    + F.lit(_BM25_K1)
                    * (
                        F.lit(1 - _BM25_B)
                        + F.lit(_BM25_B) * F.col("dl") / F.col("avg_dl")
                    )
                )
                * F.lit(1000000)
            ).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        for i in range(len(_BM25_TERMS))
    ]
    bm25 = score_terms[0]
    for t in score_terms[1:]:
        bm25 = bm25 + t
    n_terms = None
    for i in range(len(_BM25_TERMS)):
        c = (F.col(f"tf{i}") > 0).cast("int")
        n_terms = c if n_terms is None else n_terms + c
    tf_total = None
    for i in range(len(_BM25_TERMS)):
        c = F.col(f"tf{i}")
        tf_total = c if tf_total is None else tf_total + c
    return joined.select(
        "doc_id",
        "dl",
        n_terms.cast("int").alias("n_terms"),
        tf_total.cast("bigint").alias("tf_total"),
        bm25.alias("bm25_micro"),
    )


# ---------------------------------------------------------------- PSI
#
# Snapshot split: sources src0-src9 are the "reference" corpus,
# src10-src19 the "current" crawl — pure arithmetic on the source
# suffix, so the oracle rebuilds the same split. Smoothing is the
# add-half convention: p = (cnt + .5)/(N + .5k) over the k bins
# OBSERVED for the feature (a bin absent from BOTH sides does not
# exist; absent from one side gets the smoothed floor).

_PSI_NBIN = (
    "CASE WHEN n_chars < 150 THEN 'c000_149' "
    "WHEN n_chars < 250 THEN 'c150_249' "
    "WHEN n_chars < 350 THEN 'c250_349' "
    "WHEN n_chars < 450 THEN 'c350_449' "
    "ELSE 'c450_plus' END"
)


@register(
    "psi_drift_docs",
    oracle=f"""
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
             CAST(SUM(CASE WHEN side = 'ref' THEN 1 ELSE 0 END) AS BIGINT)
               AS ref_cnt,
             CAST(SUM(CASE WHEN side = 'cur' THEN 1 ELSE 0 END) AS BIGINT)
               AS cur_cnt
      FROM long GROUP BY feature, bin
    ),
    smoothed AS (
      -- Every smoothing term is explicitly DOUBLE (0.5e0 literals +
      -- CAST of the BIGINT window sums) so p, q, and q/p resolve to
      -- IEEE-double arithmetic under ANY oracle version's
      -- DECIMAL-vs-DOUBLE division rules — the same precedent as
      -- det.dsum_money's round-before-cast (r13, a5c90e8). An engine
      -- that resolved `BIGINT + 0.5` to DECIMAL division would
      -- quantize p/q and shift (q-p)*ln*1e6 by whole micros.
      SELECT feature, bin, ref_cnt, cur_cnt,
             (CAST(ref_cnt AS DOUBLE) + 0.5e0)
               / (CAST(SUM(ref_cnt) OVER (PARTITION BY feature) AS DOUBLE)
               + 0.5e0 * CAST(COUNT(*) OVER (PARTITION BY feature)
                              AS DOUBLE)) AS p,
             (CAST(cur_cnt AS DOUBLE) + 0.5e0)
               / (CAST(SUM(cur_cnt) OVER (PARTITION BY feature) AS DOUBLE)
               + 0.5e0 * CAST(COUNT(*) OVER (PARTITION BY feature)
                              AS DOUBLE)) AS q
      FROM cnts
    ),
    terms AS (
      SELECT feature, bin, ref_cnt, cur_cnt,
             CAST(round((q - p) * round(ln(q / p), 6) * 1000000)
                  AS BIGINT) AS psi_term_micro
      FROM smoothed
    )
    SELECT feature, bin, ref_cnt, cur_cnt, psi_term_micro,
           -- CAST is load-bearing: DuckDB's SUM(BIGINT) returns
           -- HUGEINT, which fetchdf() renders as float64 while the
           -- Spark side is int64 — numerically equal, but the
           -- driver HASHES values, so 5 vs 5.0 diverge. This single
           -- un-cast window sum was the r13+r14 driver red
           -- (reproduced locally by driver_sim's dtype-kind check).
           CAST(SUM(psi_term_micro) OVER (PARTITION BY feature)
                AS BIGINT) AS total_psi_micro
    FROM terms
    ORDER BY feature, bin
    """,
    tags=("quality", "drift", "extension"),
)
def psi_drift_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift between two corpus snapshots
    (source suffix < 10 = reference, else current), per feature
    (n_chars fixed-width bins; lang shares). One scan stacked to
    (feature, bin, side) long format -> ONE map-side-combined groupBy
    whose shuffle carries <= 2 * (bins + langs) rows; the per-feature
    totals/bin counts are window functions over that tiny frame. PSI
    terms are integer micros (the one ln per bin quantized to 6dp
    first), so the per-feature total is an exact order-free bigint —
    at 100 TB the cost is the scan, nothing else."""
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
    terms = smoothed.select(
        "feature",
        "bin",
        "ref_cnt",
        "cur_cnt",
        F.round(
            (F.col("q") - F.col("p"))
            * F.round(F.log(F.col("q") / F.col("p")), 6)
            * F.lit(1000000)
        )
        .cast("bigint")
        .alias("psi_term_micro"),
    )
    return terms.select(
        "*",
        F.sum("psi_term_micro").over(w).alias("total_psi_micro"),
    ).orderBy("feature", "bin")


# ---------------------------------------------------------------- MMR

_MMR_K = 5
_MMR_LAM = 0.7
_MMR_QID = 0


def _mmr_oracle(k: int = _MMR_K, lam: float = _MMR_LAM) -> str:
    """Unrolled greedy MMR: round i picks the argmax of
    lam*qsim - (1-lam)*max(pairwise sim to rounds 1..i-1), every
    similarity rounded to 4dp before the argmax, ties to lowest id."""
    parts = [
        f"""q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
      WHERE vec_id = {_MMR_QID} AND embedding IS NOT NULL AND len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') > 0
    ),
    cand AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             round(list_cosine_similarity(
               CAST(embedding AS DOUBLE[]), q.qv), 4) AS qsim
      FROM embeddings, q
      WHERE vec_id <> {_MMR_QID} AND embedding IS NOT NULL AND len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') > 0
    ),
    s1 AS (
      SELECT vec_id, v, qsim, {lam} * qsim AS score
      FROM cand ORDER BY {lam} * qsim DESC, vec_id LIMIT 1
    ),
    sel1 AS (SELECT vec_id, v FROM s1)"""
    ]
    for i in range(2, k + 1):
        parts.append(f"""s{i} AS (
      SELECT vec_id, ANY_VALUE(v) AS v, qsim,
             {lam} * qsim - {1 - lam} * MAX(pairsim) AS score
      FROM (
        SELECT c.vec_id, c.v, c.qsim,
               round(list_cosine_similarity(c.v, s.v), 4) AS pairsim
        FROM cand c CROSS JOIN sel{i - 1} s
        WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
      )
      GROUP BY vec_id, qsim
      ORDER BY score DESC, vec_id LIMIT 1
    ),
    sel{i} AS (SELECT vec_id, v FROM sel{i - 1}
               UNION ALL SELECT vec_id, v FROM s{i})""")
    unions = "\n      UNION ALL ".join(
        f"SELECT {i} AS rnk, vec_id, qsim AS relevance,"
        f" round(score, 4) AS mmr_score FROM s{i}"
        for i in range(1, k + 1)
    )
    return (
        "\n    WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT CAST(rnk AS INT) AS rnk, vec_id, relevance, mmr_score
    FROM ({unions})
    ORDER BY rnk
    """
    )


@register(
    "mmr_diverse_topk",
    oracle=_mmr_oracle(),
    tags=("similarity", "diversity", "extension"),
)
def mmr_diverse_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy MMR-diversified top-5 of the embeddings corpus against
    the vec_id=0 query vector (lambda 0.7): k distributed argmax
    rounds (TakeOrderedAndProject each — no full sort), selected
    vectors re-entering as broadcast literals in the next round's
    penalty expression (operators.similarity.mmr_topk). Similarities
    quantized to 4dp before every argmax so the unrolled SQL oracle
    replays the selection bit-exactly."""
    from corral_spark.operators.similarity import valid_vecs

    emb = valid_vecs(_t(spark, sf_dir, "embeddings"), dim=64)
    qrow = (
        emb.filter(F.col("vec_id") == _MMR_QID)
        .select(
            F.transform("embedding", lambda x: x.cast("double")).alias("qv")
        )
        .collect()
    )
    if not qrow:  # empty corpus / missing query vector -> empty result
        return spark.createDataFrame(
            [], "rnk int, vec_id long, relevance double, mmr_score double"
        )
    qv = list(qrow[0]["qv"])
    return mmr_topk(
        emb, qv, k=_MMR_K, lam=_MMR_LAM, exclude_ids=(_MMR_QID,)
    )
