"""Round-7 second-wave extensions: SemDeDup-style semantic dedup over
the embedding space, int8 scalar-quantized similarity search, and
domain-mixture sampling to explicit target shares — three
training-data-pipeline operators the registry did not yet cover
(semantic dedup prunes what MinHash cannot see: same meaning,
different words; int8 quantization is the standard 4x memory/IO
reduction for billion-vector ANN; target-share mixing is the "50% en,
30% code" pretraining recipe step).

No reference analog (bcongdon/corral is a MapReduce framework with no
vector or sampling surface); these extend SURVEY §2.4's mandated
LLM-pipeline families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from corral_spark.functions.vectors import dot_long, l2_normalize, quantize_int8
from corral_spark.operators.sampling import target_share_sample
from corral_spark.operators.similarity import semantic_dedup
from corral_spark.queries.registry import register
from corral_spark.sources.tables import load_table


@register(
    "semantic_dedup_docs",
    oracle="""
    WITH RECURSIVE
    v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
          WHERE embedding IS NOT NULL AND len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') > 0),
    cen AS (
      SELECT vec_id AS cell_id, ve AS cv FROM v ORDER BY vec_id LIMIT 16
    ),
    assign AS (
      SELECT vec_id, cell_id AS cell FROM (
        SELECT v.vec_id, cen.cell_id,
               ROW_NUMBER() OVER (
                 PARTITION BY v.vec_id
                 ORDER BY round(list_cosine_similarity(v.ve, cen.cv), 6) DESC,
                          cen.cell_id
               ) AS rn
        FROM v CROSS JOIN cen
      ) WHERE rn = 1
    ),
    edges AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM assign a
      JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id
      JOIN v va ON va.vec_id = a.vec_id
      JOIN v vb ON vb.vec_id = b.vec_id
      WHERE round(list_cosine_similarity(va.ve, vb.ve), 4) >= 0.3
    ),
    sym AS (
      SELECT id_a AS u, id_b AS w FROM edges
      UNION
      SELECT id_b AS u, id_a AS w FROM edges
    ),
    reach(node, root) AS (
      SELECT vec_id, vec_id FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') > 0
      UNION
      SELECT s.w, r.root FROM reach r JOIN sym s ON s.u = r.node
    )
    SELECT node AS vec_id,
           MIN(root) AS cluster_rep,
           (MIN(root) = node) AS is_rep
    FROM reach
    GROUP BY node
    ORDER BY vec_id
    """,
    tags=("similarity", "dedup", "extension"),
)
def semantic_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) end-to-end: assign every embedding
    to its nearest of 16 deterministic coarse centroids (assignment
    cosine quantized to 6 dp, ties to the lowest cell), score ONLY
    within-cell pairs exactly, connect pairs with cosine >= 0.3 into
    components, and give every vector its component's min id as dedup
    representative (operators.similarity.semantic_dedup +
    operators.graph). Cross-cell pairs are skipped BY DESIGN — that
    pruning is what makes semantic dedup tractable at corpus scale —
    and the oracle replays the identical cell restriction, so the
    driver row proves assignment, blocking, scoring, and the
    component fixpoint all at once."""
    from corral_spark.operators.similarity import valid_vecs

    emb = valid_vecs(load_table(spark, sf_dir, "embeddings"), dim=64)
    return semantic_dedup(emb, ncells=16, threshold=0.3).orderBy("vec_id")


@register(
    "emb_int8_topk",
    oracle="""
    WITH n0 AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve,
             sqrt(list_aggregate(
               list_transform(CAST(embedding AS DOUBLE[]), x -> x * x),
               'sum')) AS nrm
      FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') > 0
    ),
    q8 AS (
      SELECT vec_id,
             list_transform(
               ve, x -> CAST(floor(round(x / nrm, 6) * 127 + 0.5) AS BIGINT)
             ) AS qv
      FROM n0
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id,
             CAST(list_dot_product(q.qv, c.qv) AS BIGINT) AS qdot
      FROM q8 q
      JOIN q8 c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < 5
    )
    SELECT query_id, vec_id, qdot, rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY qdot DESC, vec_id) AS rnk
      FROM scored
    )
    WHERE rnk <= 10
    ORDER BY query_id, rnk
    """,
    tags=("similarity", "extension"),
)
def emb_int8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized similarity search: unit-normalize every
    embedding (components quantized to 6 dp), quantize to symmetric
    int8 (q = floor(127x + 0.5)), then rank neighbors of 5 query
    vectors by the INTEGER dot product — exact BIGINT arithmetic, so
    the ranking has no float tie hazard on any engine
    (functions.vectors.l2_normalize / quantize_int8 / dot_long).

    This is the memory/IO story for billion-vector search: int8 codes
    are 4x smaller than float32, the scan stays JVM-side (transform/
    zip_with/aggregate — no Python), and recall vs the exact float
    top-k is pinned by pytest. Output: (query_id, vec_id, qdot, rnk).

    Malformed-embedding ingress (valid_vecs, r14): a zero-norm
    vector has no direction — l2_normalize would divide by zero
    (ANSI raise / engine-specific NaN).
    """
    from corral_spark.operators.similarity import valid_vecs

    emb = valid_vecs(load_table(spark, sf_dir, "embeddings"), dim=64)
    q8 = emb.select(
        "vec_id", quantize_int8(l2_normalize(F.col("embedding"))).alias("qv")
    )
    queries = q8.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("__qqv")
    )
    scored = (
        q8.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            dot_long(F.col("__qqv"), F.col("qv")).alias("qdot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("qdot"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 10)
        .orderBy("query_id", "rnk")
    )


@register(
    "domain_mix_docs",
    oracle="""
    WITH tok AS (
      SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS tokg
      FROM documents
      WHERE lang IN ('en', 'de', 'fr', 'zh')
      GROUP BY lang
    ),
    t(lang, w) AS (VALUES ('en', 50), ('de', 30), ('fr', 10), ('zh', 10)),
    kept AS (
      SELECT d.lang, d.doc_id, d.n_chars
      FROM documents d
      JOIN tok ON d.lang = tok.lang
      JOIN t ON d.lang = t.lang
      WHERE CAST(CAST(('0x' || substr(
                md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
              AS HUGEINT) * 100 * tok.tokg
            < CAST(80000 AS HUGEINT) * t.w * 4294967296
    )
    SELECT lang,
           COUNT(*) AS docs_kept,
           CAST(SUM(n_chars) AS BIGINT) AS chars_kept
    FROM kept
    GROUP BY lang
    ORDER BY lang
    """,
    tags=("sampling", "documents", "extension"),
)
def domain_mix_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture sampling APPLIED to explicit target shares —
    50% en / 30% de / 10% fr / 10% zh of an 80k-char budget, with
    'es' deliberately absent (a mixture spec is a whitelist; unlisted
    domains drop). Per-group keep rate min(1, T*w/(W*tok_g)) under
    the integer-exact DECIMAL(38,0) rule of
    operators.sampling.target_share_sample, so the oracle replays
    the kept set bit-for-bit via HUGEINT. At sf0.001 every listed
    group is under budget (the rate>=1 cap branch); at sf0.01 'de'
    caps while the rest thin — both branches cross the gate. Output:
    per-lang kept-doc and kept-char totals."""
    docs = load_table(spark, sf_dir, "documents")
    kept = target_share_sample(
        docs,
        "lang",
        "doc_id",
        "n_chars",
        targets={"en": 50, "de": 30, "fr": 10, "zh": 10},
        token_budget=80000,
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs_kept"),
            F.sum("n_chars").cast("long").alias("chars_kept"),
        )
        .orderBy("lang")
    )
