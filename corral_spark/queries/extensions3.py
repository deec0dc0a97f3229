"""Third extension wave (round 2 tail): heavy-hitter sketch, SQL
UDTF surface, outer-mode interval join, and deterministic capped
fuzzy blocking — each an operator family SURVEY §2.4 scopes in with
no reference analog (the reference's text surface is the word_count
tokenizer, examples/word_count/word_count.go:14-27).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corral_spark.functions.text import tokenize
from corral_spark.functions.udtfs import register_udtfs
from corral_spark.operators.fuzzy import fuzzy_join_lev1
from corral_spark.operators.sketches import frequent_items
from corral_spark.queries.registry import register
from corral_spark.sources.tables import load_table

#: DuckDB mirror of functions.text.tokenize (same as the dedup/tfidf
#: oracles): sanitize -> lower -> split -> drop empties.
_TOK_SQL = (
    "list_filter(string_split_regex(trim(lower("
    "regexp_replace({col}, '[^a-zA-Z0-9\\s]+', ' ', 'g'))), '\\s+'),"
    " x -> x <> '')"
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register(
    "heavy_hitter_tokens",
    oracle=f"""
    WITH tokens AS (
      SELECT unnest({_TOK_SQL.format(col='text')}) AS term FROM documents
    ),
    n AS (SELECT COUNT(*) AS n FROM tokens)
    SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM tokens, n
    GROUP BY term, n.n
    HAVING COUNT(*) * 1000 >= n.n
    ORDER BY term
    """,
    # 'extension' tag: the MG candidate pass is a (deliberate, Arrow-
    # batched) Python stage, so this query is exempt from the
    # no-Python plan purity gate that pins the relational set.
    tags=("sketch", "heavy-hitters", "documents", "gap", "extension"),
)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens with frequency >= 1/1000 of the corpus token count, with
    exact counts — via the two-pass Misra-Gries scheme
    (operators.sketches.frequent_items): a narrow per-partition MG
    candidate pass (provable superset, bounded output) then an exact
    verify pass that shuffles only candidate rows.  The oracle is the
    naive full GROUP BY + HAVING, so a green row proves the sketch's
    superset guarantee AND the exact verification end-to-end.  At
    100 TB the full-vocabulary shuffle the oracle implies is the cost
    this operator exists to avoid."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(tokenize(F.col("text"))).alias("item"))
    out = frequent_items(toks, "item", num=1, den=1000)
    return (
        out.select(F.col("item").alias("term"), F.col("cnt"))
        .orderBy("term")
    )


@register(
    "udtf_sentences_docs",
    oracle="""
    WITH segs AS (
      SELECT doc_id,
             generate_subscripts(
               string_split_regex(text, '[.!?]+\\s+'), 1) AS idx,
             unnest(string_split_regex(text, '[.!?]+\\s+')) AS sentence
      FROM documents
    )
    SELECT doc_id, CAST(idx AS INT) AS idx, sentence
    FROM segs
    WHERE sentence <> ''
    ORDER BY doc_id, idx
    """,
    # 'extension' tag: this query is Python-by-design (the UDTF runs
    # ArrowEvalPythonUDTF), so it is exempt from the no-EvalPython
    # plan purity test that gates the relational set.
    tags=("udtf", "sql-surface", "documents", "gap", "extension"),
)
def udtf_sentences_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence explosion through the SQL UDTF surface: a Python UDTF
    (functions.udtfs.SplitSentences, Arrow-optimized) registered as a
    table function and invoked via LATERAL — the one-row-to-many
    extension point for SQL users (DataFrame users get explode /
    mapInPandas).  idx is the 1-based raw-split position, aligning
    with the oracle's generate_subscripts; empty segments are dropped
    on both sides.  UDTFs are row-at-a-time Python — API surface, not
    the hot path (the JVM formulation is explode(split(...)); this
    query exists to pin the UDTF contract cross-engine)."""
    register_udtfs(spark)
    docs = _t(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.idx, s.sentence
        FROM __udtf_docs d, LATERAL split_sentences(d.text) s
        ORDER BY d.doc_id, s.idx
        """
    )


@register(
    "click_purchase_leftouter",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS delta_us
    FROM events c LEFT JOIN events p
      ON c.user_id = p.user_id
     AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1 HOUR
    WHERE c.event_type = 'click'
    ORDER BY click_id, purchase_id
    """,
    tags=("interval-join", "outer-join", "events", "streaming", "gap"),
)
def click_purchase_leftouter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer interval join: every click, with its within-1h
    purchases OR one null-padded row if none — the EXACT batch form of
    the streaming outer join: this query calls
    streaming.ops.interval_join_stream(how='left_outer') on batch
    frames, so the oracle gates the one implementation the streaming
    path runs (where outer rows are emitted once the watermark proves
    no match can arrive).  The purchase-side time predicates live in
    the join condition, not a post-filter — pushing them below the
    outer join would silently turn it inner (the round-2 review-pass
    bug class).  One hash join on the user_id equi key."""
    from corral_spark.streaming.ops import interval_join_stream

    ev = _t(spark, sf_dir, "events")
    return interval_join_stream(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        within="1 hour",
        how="left_outer",
    ).orderBy("click_id", "purchase_id")


#: Deterministic per-block cap for the capped fuzzy query; small so
#: the cap actually binds at every SF (customer name blocks are big).
_FUZZY_CAP = 5

_FUZZY_CAPPED_ORACLE = f"""
    WITH ex AS (
      SELECT c_custkey AS id, c_name AS txt,
             unnest(list_distinct(list_prepend(c_name,
               [substr(c_name, 1, i-1) || substr(c_name, i+1, length(c_name))
                for i in range(1, length(c_name)+1)]))) AS v
      FROM customer
    ),
    capped AS (
      SELECT id, txt, v,
             row_number() OVER (PARTITION BY v ORDER BY id, txt) AS rn
      FROM ex
    ),
    k AS (SELECT id, txt, v FROM capped WHERE rn <= {_FUZZY_CAP}),
    pairs AS (
      SELECT DISTINCT a.id AS id_a, b.id AS id_b,
             a.txt AS text_a, b.txt AS text_b
      FROM k a JOIN k b ON a.v = b.v AND a.id < b.id
    )
    SELECT id_a, id_b, CAST(levenshtein(text_a, text_b) AS INT) AS lev
    FROM pairs
    WHERE levenshtein(text_a, text_b) <= 1
    ORDER BY id_a, id_b
    """


@register(
    "fuzzy_customer_pairs_capped",
    oracle=_FUZZY_CAPPED_ORACLE,
    tags=("fuzzy", "dedup", "join", "bounded-fanout", "gap"),
)
def fuzzy_customer_pairs_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The boilerplate-ceiling variant of fuzzy_customer_pairs: each
    deletion-variant block keeps only its {_FUZZY_CAP} smallest ids
    (row_number over the block key), bounding fan-out at cap^2
    candidate pairs per key no matter how degenerate the corpus — the
    guard a 100 TB run needs against million-row identical-string
    blocks, where the uncapped join's output itself is quadratic.
    The cap rule is rank-based and deterministic, so the oracle
    replicates the exact algorithm (explode -> rank -> cap -> join ->
    refine) rather than the declarative all-pairs spec — a green row
    pins implementation equivalence cross-engine."""
    pairs = fuzzy_join_lev1(
        _t(spark, sf_dir, "customer"),
        "c_name",
        "c_custkey",
        cap_per_block=_FUZZY_CAP,
    )
    return pairs.select(
        "id_a", "id_b", F.col("lev").cast("int").alias("lev")
    ).orderBy("id_a", "id_b")


# Interpolate the cap into the (plain-literal) docstring so published
# docs show the actual value, not the placeholder.
fuzzy_customer_pairs_capped.__doc__ = fuzzy_customer_pairs_capped.__doc__.replace(
    "{_FUZZY_CAP}", str(_FUZZY_CAP)
)
