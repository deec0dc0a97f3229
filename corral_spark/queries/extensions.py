"""North-star extension queries (SURVEY §2.4): dedup, similarity
search, text analysis, multimodal plumbing — each op declared over the
driver's documents/embeddings tables, with a DuckDB oracle wherever
the semantics are SQL-expressible (hash-based ops are rows-only: the
hash functions are Spark-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corral_spark.operators.dedup import (
    dedup_exact,
    jaccard_pairs,
    minhash_lsh_pairs,
    minhash_signatures,
    minhash_verified_pairs,
    simhash64,
    simhash_pairs,
)
from corral_spark.operators.multimodal import assets_from_documents, extract_features
from corral_spark.operators.similarity import (
    cosine_near_dup_pairs,
    cosine_topk,
    ivf_topk,
)
from corral_spark.operators.textanalysis import (
    LANG_MARKERS,
    doc_fingerprint,
    lang_id,
    text_stats,
    token_count_bpe,
)
from corral_spark.queries.registry import register
from corral_spark.sources.tables import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Corpus boundary: malformed embeddings (NULL, NULL-element,
    # zero-norm, wrong-length) are not vectors — r14 extreme-value
    # campaign rule, mirrored in every ANN oracle's predicate.
    from corral_spark.operators.similarity import valid_vecs

    return valid_vecs(load_table(spark, sf_dir, "embeddings"), dim=64)


def _sql_list(words) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@register(
    "dedup_exact_docs",
    oracle="""
    SELECT doc_id, lang, source
    FROM (
      SELECT doc_id, lang, source,
             ROW_NUMBER() OVER (
               PARTITION BY array_to_string(list_slice(string_split(text, ' '), 1, 10), ' ')
               ORDER BY doc_id) AS rn
      FROM documents
    )
    WHERE rn = 1
    ORDER BY doc_id
    """,
    headline=True,
    tags=("dedup", "extension"),
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a normalized content key (first 10 words), keep
    the smallest doc_id per key. The generated corpus has no full-text
    duplicates but does share prefixes, so the operator is exercised
    for real. One shuffle on the key; deterministic winner."""
    docs = _docs(spark, sf_dir).withColumn(
        "__key", F.array_join(F.slice(F.split("text", " "), 1, 10), " ")
    )
    return (
        dedup_exact(docs, ["__key"], "doc_id")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


@register(
    "jaccard_pairs_docs",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(
               regexp_replace(text, '[^a-zA-Z0-9\\s]+', ' ', 'g'))), '\\s+'),
               x -> x <> '') AS words
      FROM documents
    ),
    tok AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(words) - 4, 1) + 1),
               i -> array_to_string(list_slice(words, i, i + 4), ' ')))) AS token
      FROM w WHERE len(words) > 0
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.2
    ORDER BY id_a, id_b
    """,
    tags=("dedup", "similarity", "extension"),
)
def jaccard_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-word-shingle Jaccard >= 0.2 pairs via inverted-index
    join (operators.dedup.jaccard_pairs) — the exact-scoring backbone
    that MinHash approximates. Shingles (not tokens) keep the index
    selective: the corpus vocabulary is tiny, so a token index would
    fan out quadratically."""
    return (
        jaccard_pairs(_docs(spark, sf_dir), "text", "doc_id", threshold=0.2)
        .orderBy("id_a", "id_b")
    )


@register(
    "dedup_clusters_docs",
    oracle="""
    WITH RECURSIVE
    w AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(
               regexp_replace(text, '[^a-zA-Z0-9\\s]+', ' ', 'g'))), '\\s+'),
               x -> x <> '') AS words
      FROM documents
    ),
    tok AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(words) - 4, 1) + 1),
               i -> array_to_string(list_slice(words, i, i + 4), ' ')))) AS token
      FROM w WHERE len(words) > 0
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT id_a, id_b
      FROM inter JOIN sizes sa ON sa.doc_id = id_a
                 JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.2
    ),
    sym AS (
      SELECT id_a AS u, id_b AS v FROM edges
      UNION
      SELECT id_b AS u, id_a AS v FROM edges
    ),
    reach(node, root) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT s.v, r.root FROM reach r JOIN sym s ON s.u = r.node
    )
    SELECT node AS doc_id,
           MIN(root) AS cluster_rep,
           (MIN(root) = node) AS is_rep
    FROM reach
    GROUP BY node
    ORDER BY doc_id
    """,
    tags=("dedup", "graph", "extension"),
)
def dedup_clusters_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster resolution: exact-Jaccard>=0.2 pairs become
    dedup GROUPS via iterative hash-min connected components
    (operators.graph); every doc gets its component's min doc_id as
    canonical representative. The oracle reproduces the fixpoint with
    a recursive CTE — one of the few iterative algorithms with an
    exact SQL twin."""
    from corral_spark.operators.graph import dedup_clusters

    docs = _docs(spark, sf_dir)
    pairs = jaccard_pairs(docs, "text", "doc_id", threshold=0.2)
    return dedup_clusters(docs, pairs, "doc_id").orderBy("doc_id")


@register(
    "minhash_pairs_docs",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(
               regexp_replace(text, '[^a-zA-Z0-9\\s]+', ' ', 'g'))), '\\s+'),
               x -> x <> '') AS words
      FROM documents
    ),
    tok AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(words) - 4, 1) + 1),
               i -> array_to_string(list_slice(words, i, i + 4), ' ')))) AS token
      FROM w WHERE len(words) > 0
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
    ORDER BY id_a, id_b
    """,
    headline=True,
    tags=("dedup", "lsh", "extension"),
)
def minhash_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase MinHash dedup (operators.dedup.minhash_verified_pairs):
    MinHash(64)+LSH(16 bands) candidate generation, exact
    shingle-Jaccard verification of candidates only, threshold 0.5.
    Verification makes the output exact, so the oracle is the exact
    all-pairs Jaccard set — the driver row proves the whole LSH
    pipeline end-to-end (a candidate miss or bogus candidate would
    break the hash match). Candidate-phase recall is additionally
    pinned by pytest against exact Jaccard."""
    return (
        minhash_verified_pairs(
            _docs(spark, sf_dir), "text", "doc_id", threshold=0.5
        )
        .orderBy("id_a", "id_b")
    )


@register(
    "simhash_pairs_docs",
    tags=("dedup", "extension"),  # rows-only
)
def simhash_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs at hamming <= 3 via 4x16-bit pigeonhole
    banding (operators.dedup.simhash_pairs). Rows-only gate."""
    sims = simhash64(_docs(spark, sf_dir), "text", "doc_id")
    return simhash_pairs(sims, "doc_id", max_hamming=3).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@register(
    "ann_cosine_topk",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 5 AND embedding IS NOT NULL AND len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') > 0
    ),
    scored AS (
      SELECT q.query_id, e.vec_id,
             round(list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])), 4) AS sim
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id <> q.query_id AND e.embedding IS NOT NULL AND len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') > 0
    )
    SELECT query_id, vec_id, sim, rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, vec_id) AS rnk
      FROM scored
    )
    WHERE rnk <= 10
    ORDER BY query_id, rnk
    """,
    headline=True,
    tags=("similarity", "extension"),
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for 5 query vectors against the
    corpus: broadcast queries, JVM-side zip_with/aggregate dot
    products, per-query window top-k. Similarity quantized to 4dp so
    rank order is engine-stable."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk(emb, queries, k=10).orderBy("query_id", "rnk")


@register(
    "ann_ivf_topk",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 5 AND embedding IS NOT NULL AND len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') > 0
    ),
    scored AS (
      SELECT q.query_id, e.vec_id,
             round(list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])), 4) AS sim
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id <> q.query_id AND e.embedding IS NOT NULL AND len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') > 0
    )
    SELECT query_id, vec_id, sim, rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, vec_id) AS rnk
      FROM scored
    )
    WHERE rnk <= 10
    ORDER BY query_id, rnk
    """,
    tags=("similarity", "extension"),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-10 (16 cells) for the same 5 queries, probing ALL cells
    so the result is exact and equals the brute-force oracle — the
    driver row proves the IVF machinery (centroid assignment, per-cell
    scoring, cross-cell merge) loses nothing. The probe-limited scale
    path (nprobe << ncells, ~ncells/nprobe scoring cost reduction) is
    the same code; its recall at nprobe=4 is pinned by pytest against
    ann_cosine_topk."""
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(emb, queries, ncells=16, nprobe=16, k=10).orderBy(
        "query_id", "rnk"
    )


@register(
    "emb_near_dup_pairs",
    tags=("similarity", "dedup", "extension"),  # rows-only: LSH recall < 1
)
def emb_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-duplicate pairs (cosine >= 0.45) via
    sign-random-projection LSH with exact verification
    (operators.similarity.cosine_near_dup_pairs). Rows-only gate BY
    NATURE: the testdata corpus has no planted embedding dups, so the
    pairs above 0.45 sit exactly where sign-LSH band recall is
    probabilistic (~12% at cosine 0.45 with 24x12 bands) — set
    equality with an exact all-pairs oracle cannot hold. The oracled
    twin is emb_near_dup_planted (guaranteed-recall construction);
    recall on synthetic planted near-dups is pinned by pytest."""
    return cosine_near_dup_pairs(_emb(spark, sf_dir), threshold=0.45).orderBy(
        "id_a", "id_b"
    )


@register(
    "emb_near_dup_planted",
    oracle="""
    WITH aug AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') > 0
      UNION ALL
      SELECT vec_id + 100000,
             list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2)
      FROM embeddings WHERE vec_id < 50 AND embedding IS NOT NULL AND len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') > 0
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.e, b.e), 6) AS cos_sim
    FROM aug a JOIN aug b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.e, b.e), 6) >= 0.99
    ORDER BY id_a, id_b
    """,
    tags=("similarity", "dedup", "extension"),
)
def emb_near_dup_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH near-dup detection with an exact oracle: plant 50
    scaled duplicates (vec_id+100000, embedding*2) into the corpus and
    find pairs with cosine >= 0.99. Scaling by 2 keeps the hyperplane
    sign pattern bit-identical (doubling is exact in IEEE), so LSH
    candidate recall on the planted pairs is GUARANTEED 1.0 — not
    probabilistic — and cos(a, 2a) rounds to exactly 1.0 in both
    engines. The 0.99 floor (not 0.9) keeps the claim data-
    independent: any NATURAL pair that qualifies is within 8 degrees,
    where 24x12 sign-LSH misses with probability ~1e-9 — at 0.9 a
    natural pair would be missed ~2% of the time, a latent gate flake
    if a corpus drop ever contains one. A hash match proves the full
    pipeline: banding UDF, bucket join, exact verification."""
    emb = _emb(spark, sf_dir)
    dup = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: (x * F.lit(2.0)).cast("float")).alias(
            "embedding"
        ),
    )
    aug = emb.select("vec_id", "embedding").unionByName(dup)
    return cosine_near_dup_pairs(aug, threshold=0.99).orderBy("id_a", "id_b")


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_EN_STOP_SQL = _sql_list(LANG_MARKERS["en"])


@register(
    "text_stats_docs",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> x <> '') AS words
      FROM documents
    )
    SELECT doc_id,
           len(words) AS n_words,
           len(list_distinct(words)) AS n_distinct_words,
           CASE WHEN len(words) > 0 THEN
             CAST(list_reduce(list_transform(words, x -> length(x)), (a, b) -> a + b) AS DOUBLE)
               / len(words) END AS avg_word_len,
           CASE WHEN len(words) > 0 THEN
             CAST(len(list_distinct(words)) AS DOUBLE) / len(words)
             END AS distinct_ratio,
           CASE WHEN len(list_distinct(words)) > 0 THEN
             CAST(len(list_intersect(words, {_EN_STOP_SQL})) AS DOUBLE)
               / len(list_distinct(words)) END AS stopword_ratio
    FROM w
    ORDER BY doc_id
    """,
    tags=("text", "extension"),
)
def text_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality statistics (operators.textanalysis.
    text_stats): counts and IEEE-stable ratios for filtering a
    training corpus by quality."""
    return text_stats(_docs(spark, sf_dir)).orderBy("doc_id")


def _lang_id_oracle() -> str:
    score = {
        lang: f"len(list_intersect(wd, {_sql_list(m)}))"
        for lang, m in sorted(LANG_MARKERS.items())
    }
    greatest = "greatest(" + ", ".join(score.values()) + ")"
    case = " ".join(
        f"WHEN {score[lang]} = __best THEN '{lang}'" for lang in sorted(LANG_MARKERS)
    )
    return f"""
    WITH w AS (
      SELECT doc_id,
             list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS wd
      FROM documents
    ),
    s AS (SELECT doc_id, wd, {greatest} AS __best FROM w)
    SELECT doc_id, CASE {case} END AS pred_lang, __best AS marker_hits
    FROM s
    ORDER BY doc_id
    """


@register(
    "lang_id_docs",
    oracle=_lang_id_oracle(),
    tags=("text", "extension"),
)
def lang_id_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-stopword language ID (operators.textanalysis.lang_id):
    distinct-marker hit count per language, argmax with code-order tie
    break."""
    return lang_id(_docs(spark, sf_dir)).orderBy("doc_id")


@register(
    "token_count_docs",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_words,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpe_tokens
    FROM documents
    ORDER BY doc_id
    """,
    tags=("text", "extension"),
)
def token_count_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (operators.textanalysis.token_count_bpe):
    whitespace words + BPE-ish regex tokens for LLM budget
    estimation."""
    return token_count_bpe(_docs(spark, sf_dir)).orderBy("doc_id")


@register(
    "doc_fingerprint_md5",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(
               regexp_replace(text, '[^a-zA-Z0-9\\s]+', ' ', 'g'))), '\\s+'),
               x -> x <> '') AS words
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(words) - 4, 1) + 1),
               i -> array_to_string(list_slice(words, i, i + 4), ' ')))) AS s
      FROM w
    )
    SELECT doc_id,
           MIN(md5(s)) AS fp_min,
           MAX(md5(s)) AS fp_max,
           COUNT(*) AS n_shingles
    FROM sh
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("text", "fingerprint", "extension"),
)
def doc_fingerprint_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine-checkable content fingerprint: min/max md5 over
    5-word shingles (md5 exists identically in every engine, so this
    variant is oracle-gated exactly; the xxhash64 variant below stays
    for speed in production paths)."""
    from corral_spark.operators.dedup import word_shingles_arrow

    docs = _docs(spark, sf_dir)
    sh = word_shingles_arrow(F.col("text"), 5)
    ex = docs.select("doc_id", F.explode(sh).alias("s"))
    return (
        ex.groupBy("doc_id")
        .agg(
            F.min(F.md5("s")).alias("fp_min"),
            F.max(F.md5("s")).alias("fp_max"),
            F.count(F.lit(1)).alias("n_shingles"),
        )
        .orderBy("doc_id")
    )


@register(
    "doc_fingerprint_docs",
    tags=("text", "extension"),  # rows-only: xxhash64 fingerprints
)
def doc_fingerprint_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shingle-hash document fingerprints (min/max/xor-fold of
    xxhash64 over 5-word shingles). Rows-only gate; determinism is
    pinned by a pytest golden."""
    return doc_fingerprint(_docs(spark, sf_dir)).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Data quality & text hygiene
# ---------------------------------------------------------------------------


@register(
    "dq_report",
    oracle="""
    SELECT 'lineitem_orphans' AS check_name,
           (SELECT COUNT(*) FROM lineitem
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)) AS n_bad
    UNION ALL
    SELECT 'orders_null_custkey',
           (SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL)
    UNION ALL
    SELECT 'duplicate_orderkeys',
           (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders
                                  GROUP BY o_orderkey HAVING COUNT(*) > 1))
    UNION ALL
    SELECT 'customer_orphans',
           (SELECT COUNT(*) FROM orders
            WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey))
    ORDER BY check_name
    """,
    tags=("quality", "extension"),
)
def dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint report across tables: referential integrity (orphan
    lineitems/orders), null keys, duplicate primary keys — one row per
    check (operators.quality). The ingestion gate every 100 TB
    pipeline runs before training."""
    from corral_spark.operators.quality import duplicate_key_report, orphan_report

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")

    checks = [
        ("lineitem_orphans", orphan_report(li, orders, "l_orderkey", "o_orderkey")),
        ("orders_null_custkey", orders.filter(F.col("o_custkey").isNull())),
        ("duplicate_orderkeys", duplicate_key_report(orders, ["o_orderkey"])),
        ("customer_orphans", orphan_report(orders, customer, "o_custkey", "c_custkey")),
    ]
    parts = [
        df.agg(F.count(F.lit(1)).alias("n_bad")).select(
            F.lit(name).alias("check_name"), "n_bad"
        )
        for name, df in checks
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("check_name")


@register(
    "normalized_redacted_docs",
    oracle="""
    SELECT doc_id,
           trim(regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(lower(text), '\\s+', ' ', 'g'),
                 '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
             '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>', 'g')) AS clean_text,
           length(text) AS raw_len
    FROM documents
    ORDER BY doc_id
    """,
    tags=("quality", "text", "extension"),
)
def normalized_redacted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text hygiene: normalize (lowercase, whitespace collapse, trim)
    then redact PII patterns (operators.quality.redact_pii) — the
    standard pre-training scrub, at scan speed."""
    from corral_spark.operators.quality import normalize_text, redact_pii

    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        redact_pii(normalize_text(F.col("text"))).alias("clean_text"),
        F.length("text").alias("raw_len"),
    ).orderBy("doc_id")


@register(
    "incremental_dedup_new_docs",
    oracle="""
    WITH keyed AS (
      SELECT doc_id,
             array_to_string(list_slice(string_split(text, ' '), 1, 10), ' ') AS k
      FROM documents
    ),
    existing AS (SELECT * FROM keyed WHERE doc_id < 250),
    incoming AS (SELECT * FROM keyed WHERE doc_id >= 250)
    SELECT i.doc_id, (e.k IS NOT NULL) AS dup_of_corpus
    FROM incoming i
    LEFT JOIN (SELECT DISTINCT k FROM existing) e ON i.k = e.k
    ORDER BY i.doc_id
    """,
    tags=("dedup", "incremental", "extension"),
)
def incremental_dedup_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (production) dedup: incoming batch checked against
    the existing corpus by content key — at 100 TB the corpus side is
    a bucketed key table and this is one co-located join, never a full
    re-dedup. Here: docs >= 250 are 'incoming', < 250 are 'corpus'."""
    docs = _docs(spark, sf_dir).withColumn(
        "k", F.array_join(F.slice(F.split("text", " "), 1, 10), " ")
    )
    existing = docs.filter(F.col("doc_id") < 250).select("k").distinct()
    incoming = docs.filter(F.col("doc_id") >= 250)
    return (
        incoming.join(
            existing.withColumn("__hit", F.lit(1)), on="k", how="left"
        )
        .select(
            "doc_id", F.col("__hit").isNotNull().alias("dup_of_corpus")
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Reproducible sampling
# ---------------------------------------------------------------------------


@register(
    "sample_docs_10pct",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE substring(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 8) < '19999999'
    ORDER BY doc_id
    """,
    tags=("sampling", "extension"),
)
def sample_docs_10pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample by md5 content hash (operators.
    sampling.deterministic_sample): same rows every run and on every
    engine — the reproducible alternative to seeded RNG sampling.
    (0.1 * 2^32 = 0x19999999.)"""
    from corral_spark.operators.sampling import deterministic_sample

    return (
        deterministic_sample(_docs(spark, sf_dir), "doc_id", 0.1)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


@register(
    "train_test_split_counts",
    oracle="""
    SELECT CASE WHEN substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc'
                THEN 'train' ELSE 'test' END AS split,
           lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    ORDER BY split, lang
    """,
    tags=("sampling", "extension"),
)
def train_test_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/20 train/test split by hashed doc id (operators.sampling.
    train_test_split), reported per language — the reproducible-split
    primitive every training pipeline needs. (0.8 * 2^32 = 0xcccccccc.)"""
    from corral_spark.operators.sampling import train_test_split

    return (
        train_test_split(_docs(spark, sf_dir), "doc_id", 0.8)
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split", "lang")
    )


@register(
    "stratified_sample_orders",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_sampled
    FROM orders
    WHERE (o_orderstatus = 'F' AND substring(md5('strata:' || CAST(o_orderkey AS VARCHAR)), 1, 8) < '33333333')
       OR (o_orderstatus = 'O' AND substring(md5('strata:' || CAST(o_orderkey AS VARCHAR)), 1, 8) < '19999999')
       OR (o_orderstatus = 'P' AND substring(md5('strata:' || CAST(o_orderkey AS VARCHAR)), 1, 8) < '80000000')
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("sampling", "extension"),
)
def stratified_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling (operators.sampling.
    stratified_sample): downsample common order statuses, keep more of
    the rare 'P' class — class rebalancing with exact reproducibility.
    (F: 20%, O: 10%, P: 50%.)"""
    from corral_spark.operators.sampling import stratified_sample

    orders = load_table(spark, sf_dir, "orders")
    sampled = stratified_sample(
        orders, "o_orderstatus", "o_orderkey", {"F": 0.2, "O": 0.1, "P": 0.5}
    )
    return (
        sampled.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .orderBy("o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------


@register(
    "pretrain_corpus",
    oracle="""
    WITH RECURSIVE
    clean AS (
      SELECT doc_id,
             trim(regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(lower(text), '\\s+', ' ', 'g'),
                   '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
                 '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
               '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>', 'g')) AS clean_text
      FROM documents
    ),
    scored AS (
      SELECT doc_id, clean_text,
             len(list_filter(string_split(clean_text, ' '), x -> x <> ''))
               AS n_words,
             CAST(len(list_distinct(list_filter(string_split(clean_text, ' '),
               x -> x <> ''))) AS DOUBLE)
               / NULLIF(len(list_filter(string_split(clean_text, ' '),
                 x -> x <> '')), 0) AS dr
      FROM clean
    ),
    filtered AS (
      SELECT doc_id, clean_text, CAST(n_words AS INT) AS n_words
      FROM scored WHERE n_words >= 20 AND dr >= 0.3
    ),
    exact AS (
      SELECT doc_id, clean_text, n_words FROM (
        SELECT *, MIN(doc_id) OVER (PARTITION BY clean_text) AS keep
        FROM filtered
      ) WHERE doc_id = keep
    ),
    w AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(
               regexp_replace(clean_text, '[^a-zA-Z0-9\\s]+', ' ', 'g'))), '\\s+'),
               x -> x <> '') AS words
      FROM exact
    ),
    tok AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(words) - 4, 1) + 1),
               i -> array_to_string(list_slice(words, i, i + 4), ' ')))) AS token
      FROM w WHERE len(words) > 0
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT id_a, id_b
      FROM inter JOIN sizes sa ON sa.doc_id = id_a
                 JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
    ),
    sym AS (
      SELECT id_a AS u, id_b AS v FROM edges
      UNION
      SELECT id_b AS u, id_a AS v FROM edges
    ),
    reach(node, root) AS (
      SELECT doc_id, doc_id FROM exact
      UNION
      SELECT s.v, r.root FROM reach r JOIN sym s ON s.u = r.node
    ),
    reps AS (
      SELECT node AS doc_id FROM reach GROUP BY node
      HAVING MIN(root) = node
    )
    SELECT e.doc_id, e.clean_text, e.n_words,
           CASE WHEN substring(md5('split:' || CAST(e.doc_id AS VARCHAR)), 1, 8)
                     < 'e6666666'
                THEN 'train' ELSE 'test' END AS split
    FROM exact e JOIN reps USING (doc_id)
    ORDER BY e.doc_id
    """,
    headline=True,
    tags=("pipeline", "dedup", "quality", "sampling", "extension"),
)
def pretrain_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone: the composed pretraining corpus-prep pipeline
    (corral_spark.pipelines.prepare_pretraining_corpus): normalize +
    redact -> quality filter -> exact dedup (min-id winner) ->
    verified MinHash near-dedup (LSH candidates + exact
    shingle-Jaccard >= 0.5) -> connected components (keep reps) ->
    reproducible md5 split. With the verified pair set the whole
    pipeline is deterministic relational algebra, so the oracle
    restates it: regex hygiene, window-min exact dedup, all-pairs
    Jaccard edges, recursive-CTE components, md5-threshold split —
    the full five-stage funnel hash-checked end-to-end."""
    from corral_spark.pipelines import prepare_pretraining_corpus

    corpus, _report = prepare_pretraining_corpus(
        _docs(spark, sf_dir), with_report=False, near_dup="verified"
    )
    return corpus.orderBy("doc_id")


# DuckDB mirror of operators.multimodal.decode_fake: byte k of the
# sha256 digest, recovered by parsing hex chars 2k+1..2k+2 of the hex
# string (sha256(varchar) hashes the UTF-8 bytes in both engines).
_HEXB = (
    "((strpos('0123456789abcdef', substr(sha, {a}, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr(sha, {b}, 1)) - 1))"
)


@register(
    "multimodal_features",
    oracle=f"""
    WITH h AS (
      SELECT doc_id AS asset_id,
             'image/fake' AS media_type,
             CAST(strlen(text) AS BIGINT) AS n_bytes,
             sha256(text) AS sha
      FROM documents WHERE text IS NOT NULL
    )
    SELECT asset_id, media_type, n_bytes,
           CAST(64 + {_HEXB.format(a=1, b=2)} % 192 AS INT) AS width,
           CAST(64 + {_HEXB.format(a=3, b=4)} % 192 AS INT) AS height,
           sha AS sha256
    FROM h
    ORDER BY asset_id
    """,
    tags=("multimodal", "extension"),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-asset pipeline: documents -> binary payload column ->
    Arrow-batched mapInPandas feature extraction (decode stubbed with
    a deterministic fake; see operators.multimodal). Exercises the
    real schema/batch plumbing a media pipeline needs. The fake decode
    is sha256-arithmetic over the payload bytes, so the whole pipeline
    (payload encode, batch iteration, feature derivation) is DuckDB-
    oracle-checkable: width/height re-derive from digest bytes 0/1 in
    SQL."""
    assets = assets_from_documents(_docs(spark, sf_dir))
    return extract_features(assets).orderBy("asset_id")
