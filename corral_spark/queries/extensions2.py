"""Second extension wave: fuzzy entity matching, TF-IDF term scoring,
and event interval self-joins — LLM-pipeline adjacents on top of the
round-1 dedup/quality family (SURVEY §2.4; no reference analog — its
text handling is the word_count tokenizer, examples
word_count.go:14-27).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from corral_spark.functions.text import tokenize
from corral_spark.operators.fuzzy import fuzzy_join_lev1
from corral_spark.queries.registry import register
from corral_spark.sources.tables import load_table

#: DuckDB mirror of functions.text.tokenize (same as the dedup oracle
#: shingle pipelines): sanitize -> lower -> split -> drop empties.
_TOK_SQL = (
    "list_filter(string_split_regex(trim(lower("
    "regexp_replace({col}, '[^a-zA-Z0-9\\s]+', ' ', 'g'))), '\\s+'),"
    " x -> x <> '')"
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "fuzzy_customer_pairs",
    oracle="""
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INT) AS lev
    FROM customer a JOIN customer b
      ON a.c_custkey < b.c_custkey
     AND levenshtein(a.c_name, b.c_name) <= 1
    ORDER BY id_a, id_b
    """,
    tags=("fuzzy", "dedup", "join", "gap"),
)
def fuzzy_customer_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance<=1 name pairs via symmetric-delete blocking
    (operators.fuzzy.fuzzy_join_lev1): deletion-neighborhood explode,
    equi-join on variant, exact levenshtein refine — provably the same
    pair set as the oracle's all-pairs scan, at O(n x len) index cost
    instead of O(n^2). The oracle IS the naive cross join, so a green
    row proves blocking completeness end-to-end."""
    pairs = fuzzy_join_lev1(
        _t(spark, sf_dir, "customer"), "c_name", "c_custkey"
    )
    return pairs.select(
        "id_a", "id_b", F.col("lev").cast("int").alias("lev")
    ).orderBy("id_a", "id_b")


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOK_SQL.format(col='text')}) AS term
      FROM documents
    ),
    tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY 1, 2
    ),
    df AS (
      SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
      FROM tok GROUP BY 1
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             CAST((tf.tf * n.n_docs * 1000000) // df.df AS BIGINT)
               AS score_micro
      FROM tf JOIN df USING (term), n
    )
    SELECT doc_id, term, tf, df, score_micro,
           CAST(rnk AS INT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score_micro DESC, term) AS rnk
      FROM scored
    )
    WHERE rnk <= 3
    ORDER BY doc_id, rnk
    """,
    tags=("text", "tfidf", "extension"),
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most characteristic terms per document by linear-idf
    TF-IDF (score = tf * N / df, quantized to integer millionths so
    both engines rank on EXACT bigint arithmetic — a log-idf double
    would reintroduce cross-engine ulp risk; the linear variant is
    rank-equivalent for the common single-occurrence df range).
    Two shuffles (tf group-by, df group-by); the df side is
    VOCABULARY-sized, i.e. corpus-scaled, so the tf-df join carries
    the shuffle_hash corpus-scaled-join hint (r16 broadcast audit —
    the earlier "broadcast the tiny df side" was a small-SF estimate
    Catalyst would happily keep at 100 TB through the explode).
    Only the one-row n_docs frame broadcasts. Ties broken by term."""
    docs = _t(spark, sf_dir, "documents")
    # n_docs joins in lazily (one-row cross join, broadcast) — an
    # eager docs.count() here would run a full-scan job at
    # query-CONSTRUCTION time, paid even by plan-only inspections.
    n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    tok = docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("term")
    )
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("tf")
    )
    df = tok.groupBy("term").agg(
        F.count_distinct("doc_id").cast("bigint").alias("df")
    )
    scored = (
        tf.join(df.hint("shuffle_hash"), on="term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.expr("CAST((tf * n_docs * 1000000) DIV df AS BIGINT)").alias(
                "score_micro"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), F.col("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "tf", "df", "score_micro", "rnk")
        .orderBy("doc_id", "rnk")
    )


@register(
    "click_purchase_within_1h",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS delta_us
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1 HOUR
    ORDER BY click_id, purchase_id
    """,
    tags=("interval-join", "events", "streaming", "gap"),
)
def click_purchase_within_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event interval self-join: every purchase within one hour after
    a click by the same user — the batch form of a stream-stream
    interval join (streaming.ops has the watermarked streaming form).
    The equi key (user_id) carries the shuffle; the time bound is a
    post-join filter, so this is one hash join, not a range scan.
    Delta emitted in integer micros (no timestamp affinity)."""
    from corral_spark.operators.timeseries import event_micros

    ev = _t(spark, sf_dir, "events")
    ts_us = event_micros(ev, "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        ts_us.alias("click_us"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        ts_us.alias("purchase_us"),
    )
    hour_us = 3600 * 1_000_000
    return (
        clicks.join(purchases, on="user_id")
        .filter(
            (F.col("purchase_us") >= F.col("click_us"))
            & (F.col("purchase_us") < F.col("click_us") + hour_us)
        )
        .select(
            "click_id",
            "purchase_id",
            "user_id",
            (F.col("purchase_us") - F.col("click_us")).alias("delta_us"),
        )
        .orderBy("click_id", "purchase_id")
    )


@register(
    "doc_chunks",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, {_TOK_SQL.format(col='text')} AS words FROM documents
    ),
    n AS (
      SELECT doc_id, words, len(words) AS nw,
             greatest(1, CAST(ceil((len(words) - 10) / 30.0) AS INT))
               AS n_chunks
      FROM w
    )
    SELECT doc_id,
           CAST(c.i AS INT) AS chunk_id,
           -- Scoped COALESCE: a zero-word document yields its one
           -- EMPTY chunk (DuckDB's array_to_string([]) is NULL where
           -- Spark's array_join([]) is '' — the r14 empty-rebuild
           -- convention, same as order_item_arrays), while a
           -- NULL-text document keeps its NULL chunk on both engines
           -- (both engines' greatest(1, NULL) = 1 emits the row).
           CASE WHEN words IS NOT NULL THEN
             COALESCE(array_to_string(
               list_slice(words, c.i * 30 + 1, c.i * 30 + 40), ' '), '')
           END AS chunk_text,
           CAST(len(list_slice(words, c.i * 30 + 1, c.i * 30 + 40)) AS INT)
             AS n_words
    FROM n, unnest(generate_series(0, n_chunks - 1)) AS c(i)
    ORDER BY doc_id, chunk_id
    """,
    tags=("chunking", "text", "extension"),
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG/pretraining chunker (operators.chunking.chunk_documents):
    40-word chunks, 10-word overlap (stride 30 — several chunks per
    document at this corpus's ~100-word lengths), pure
    slice+posexplode — linear in corpus words, shuffle-free. The
    oracle mirrors the slicing arithmetic exactly with list_slice."""
    from corral_spark.operators.chunking import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"), "text", "doc_id", 40, 10
    ).orderBy("doc_id", "chunk_id")


@register(
    "pack_docs_2k",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len({_TOK_SQL.format(col='text')}) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             CAST(COALESCE(SUM(n_tokens) OVER (
               ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS BIGINT) AS excl
      FROM t
    )
    SELECT doc_id, n_tokens,
           excl // 2048 AS pack_id,
           excl % 2048 AS pack_offset
    FROM c
    ORDER BY doc_id
    """,
    tags=("packing", "text", "extension"),
)
def pack_docs_2k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (operators.chunking.pack_sequences): documents
    in doc_id order filled into ~2048-token packs via one windowed
    exclusive cumsum — the deterministic streaming approximation of
    first-fit (exact bin packing is sequential/NP-hard). pack_offset
    gives each doc's start position inside its pack."""
    from corral_spark.functions.text import tokenize
    from corral_spark.operators.chunking import pack_sequences

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(tokenize(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    return pack_sequences(docs, "doc_id", "n_tokens", 2048).orderBy("doc_id")


def _simhash_md5_oracle() -> str:
    """Generate the 60-bit md5-SimHash oracle: per-token-occurrence
    hashes, 60 bit-vote sums, majority fingerprint, all-pairs hamming
    <= 3. The oracle side may be naive (all pairs) — it defines the
    semantics; the Spark side must reach the same set via banding."""
    csums = ",\n             ".join(
        f"SUM((h >> {b}) & 1) AS c{b}" for b in range(60)
    )
    fp = " + ".join(
        f"(CASE WHEN c{b} > n / 2.0 THEN CAST({1 << b} AS BIGINT) "
        f"ELSE 0 END)"
        for b in range(60)
    )
    tok = _TOK_SQL.format(col="text")
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest({tok}) AS t FROM documents
    ),
    h AS (
      SELECT doc_id,
             CAST('0x' || substring(md5(t), 1, 15) AS BIGINT) AS h
      FROM tok
    ),
    votes AS (
      SELECT doc_id,
             {csums},
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM h GROUP BY doc_id
    ),
    fp AS (SELECT doc_id, {fp} AS simhash FROM votes)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    ORDER BY id_a, id_b
    """


@register(
    "simhash_md5_pairs",
    oracle=_simhash_md5_oracle(),
    tags=("dedup", "simhash", "extension"),
)
def simhash_md5_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs, cross-engine-checkable variant
    (operators.dedup.simhash_md5): md5-derived 60-bit fingerprints,
    4x15-bit pigeonhole banding, hamming <= 3. The oracle computes
    the SAME fingerprints naively over all pairs, so a green row
    proves both the fingerprint math and the banding completeness —
    the md5 twin of the fast xxhash simhash_pairs_docs path."""
    from corral_spark.operators.dedup import simhash_md5, simhash_pairs

    sims = simhash_md5(_t(spark, sf_dir, "documents"), "text", "doc_id")
    return (
        simhash_pairs(sims, "doc_id", max_hamming=3, width=15)
        .select(
            "id_a", "id_b", F.col("hamming").cast("int").alias("hamming")
        )
        .orderBy("id_a", "id_b")
    )


def _profile_oracle() -> str:
    """Per-column UNION ALL profile over orders, mirroring
    operators.quality.profile_table's type-aware stringification."""
    parts = []
    for col, fmt in (
        ("o_orderkey", "CAST({a} AS VARCHAR)"),
        ("o_custkey", "CAST({a} AS VARCHAR)"),
        ("o_orderstatus", "CAST({a} AS VARCHAR)"),
        ("o_totalprice", "CAST(CAST({a} AS DECIMAL(18,2)) AS VARCHAR)"),
        ("o_orderdate", "strftime({a}, '%Y-%m-%d %H:%M:%S')"),
        ("o_orderpriority", "CAST({a} AS VARCHAR)"),
    ):
        parts.append(
            f'SELECT \'{col}\' AS "column", COUNT(*) AS n_rows,'
            f" COUNT(*) - COUNT({col}) AS n_nulls,"
            f" CAST(COUNT(DISTINCT {col}) AS BIGINT) AS n_distinct,"
            f" {fmt.format(a=f'MIN({col})')} AS min_value,"
            f" {fmt.format(a=f'MAX({col})')} AS max_value"
            f" FROM orders"
        )
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'


@register(
    "profile_orders",
    oracle=_profile_oracle(),
    tags=("quality", "profiling", "extension"),
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler (operators.quality.profile_table): nulls,
    exact distinct count, and canonical-text min/max for every orders
    column in ONE aggregation pass — the first query a user runs
    against an unknown data drop. The oracle restates it as one
    UNION ALL branch per column; matching proves the type-aware
    stringification (decimal money, fixed-format timestamps) is
    cross-engine canonical."""
    from corral_spark.operators.quality import profile_table

    return profile_table(_t(spark, sf_dir, "orders")).orderBy("column")
