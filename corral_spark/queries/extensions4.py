"""Fourth extension wave: pretraining-hygiene operators — benchmark
decontamination, repetition quality signals, unigram-LM quality
scoring, groupwise heavy hitters, trailing range-frame rollups, and
temperature-resampled language weights.

Every query here is fully oracle-gated. The reference has no analog
for any of these (its text surface is the word-count tokenizer,
examples/word_count/word_count.go:14-27); they are SURVEY §2.4
training-data-pipeline extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corral_spark.functions.text import tokenize
from corral_spark.operators.contamination import flag_contaminated
from corral_spark.operators.sketches import grouped_top_k
from corral_spark.operators.textanalysis import repetition_stats, unigram_logprob
from corral_spark.operators.timeseries import rolling_range_agg
from corral_spark.queries.registry import register
from corral_spark.sources.tables import load_table

#: DuckDB mirror of functions.text.tokenize (shared with the
#: dedup/tfidf/heavy-hitter oracles).
_TOK_SQL = (
    "list_filter(string_split_regex(trim(lower("
    "regexp_replace({col}, '[^a-zA-Z0-9\\s]+', ' ', 'g'))), '\\s+'),"
    " x -> x <> '')"
)

#: DuckDB mirror of operators.dedup.word_shingles_arrow (shared with
#: the jaccard/minhash oracles): distinct 5-word shingles with the
#: short-doc whole-text clamp.
_SHINGLE5_SQL = (
    "list_distinct(list_transform("
    "range(1, greatest(len(words) - 4, 1) + 1),"
    " i -> array_to_string(list_slice(words, i, i + 4), ' ')))"
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _max_run_sql(arr: str, length: str) -> str:
    """DuckDB twin of textanalysis._max_run via change-point indices:
    run lengths are diffs of consecutive positions where the value
    changes (the Spark side uses a fold; results are identical exact
    integers)."""
    cp = (
        f"list_filter(range(1, {length} + 1),"
        f" i -> i = 1 OR {arr}[i] <> {arr}[i-1])"
    )
    return (
        f"COALESCE(list_max(list_transform(range(1, len({cp}) + 1),"
        f" k -> (CASE WHEN k < len({cp}) THEN ({cp})[k+1]"
        f" ELSE {length} + 1 END) - ({cp})[k])), 0)"
    )


@register(
    "decontaminate_docs",
    oracle="""
    WITH w AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(trim(lower(
               regexp_replace(text, '[^a-zA-Z0-9\\s]+', ' ', 'g'))), '\\s+'),
               x -> x <> '') AS words
      FROM documents
    ),
    tok AS (
      SELECT doc_id, source,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(words) - 4, 1) + 1),
               i -> array_to_string(list_slice(words, i, i + 4), ' ')))) AS gram
      FROM w WHERE len(words) > 0
    ),
    bench AS (SELECT DISTINCT gram FROM tok WHERE source = 'src0')
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
    FROM tok JOIN bench USING (gram)
    WHERE source <> 'src0'
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("decontamination", "documents", "gap", "extension"),
)
def decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators.contamination): treat the
    'src0' slice of the corpus as the eval benchmark; flag every other
    document sharing at least one distinct 5-word shingle with it,
    with its overlapping-gram count. The benchmark n-gram set is
    broadcast by construction (eval suites are MBs regardless of
    corpus SF)."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    cands = docs.filter(F.col("source") != "src0")
    return flag_contaminated(cands, bench, "doc_id", "text", n=5).orderBy(
        "doc_id"
    )


@register(
    "doc_repetition_stats",
    oracle=f"""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split(COALESCE(text, ''), ' '),
                         x -> x <> '') AS words
      FROM documents
    ),
    s AS (
      SELECT doc_id, words, len(words) AS n,
             list_sort(words) AS sw,
             list_sort(list_transform(range(1, len(words)),
               i -> words[i] || ' ' || words[i+1])) AS sbg
      FROM w
    )
    SELECT doc_id,
           n AS n_words,
           CASE WHEN n > 0 THEN
             round(CAST({_max_run_sql('sw', 'n')} AS DOUBLE) / n, 4)
           END AS top_token_fraction,
           CASE WHEN len(sbg) > 0 THEN
             round(CAST({_max_run_sql('sbg', 'len(sbg)')} AS DOUBLE)
                   / len(sbg), 4)
           END AS top_bigram_fraction,
           {_max_run_sql('words', 'n')} AS max_token_run
    FROM s
    ORDER BY doc_id
    """,
    tags=("text", "quality", "gap"),
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (operators.textanalysis.
    repetition_stats): top-word share, top-bigram share, and longest
    consecutive-repeat run per document — the standard boilerplate/
    spam filters for corpus curation. Pure map stage (array folds),
    no shuffle.

    NULL text is the EMPTY document (r13 hygiene-boundary convention,
    COALESCE both sides): n_words 0, NULL fractions, max_token_run 0
    — not legacy size(NULL) = -1 leaking into the stats."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "text", F.coalesce(F.col("text"), F.lit(""))
    )
    return repetition_stats(docs).orderBy("doc_id")


@register(
    "unigram_logprob_docs",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOK_SQL.format(col='text')}) AS term
      FROM documents
    ),
    counts AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term),
    total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM counts)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           round(AVG(ln(CAST(cnt AS DOUBLE) / total)), 4) AS mean_logprob
    FROM tok JOIN counts USING (term), total
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("text", "quality", "gap"),
)
def unigram_logprob_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean unigram log-probability per document under the corpus's
    own unigram LM (operators.textanalysis.unigram_logprob) — the
    CCNet-style perplexity proxy for quality bucketing. Model join is
    hint-free (AQE broadcasts the vocabulary-sized side when small)."""
    return unigram_logprob(_t(spark, sf_dir, "documents")).orderBy("doc_id")


@register(
    "top_tokens_per_lang",
    oracle=f"""
    WITH tok AS (
      SELECT lang, unnest({_TOK_SQL.format(col='text')}) AS term
      FROM documents
    ),
    counts AS (
      SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM tok GROUP BY lang, term
    ),
    ranked AS (
      SELECT lang, term, cnt,
             CAST(row_number() OVER (
               PARTITION BY lang ORDER BY cnt DESC, term ASC) AS INT)
               AS rank
      FROM counts
    )
    SELECT lang, term, cnt, rank FROM ranked
    WHERE rank <= 5
    ORDER BY lang, rank
    """,
    tags=("sketch", "heavy-hitters", "documents", "gap"),
)
def top_tokens_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Groupwise heavy hitters (operators.sketches.grouped_top_k):
    top-5 tokens per language by frequency, ties broken by token.
    WindowGroupLimit prunes each map task to its local top-5 per
    language before the window exchange — the bounded-groups
    formulation that makes per-group top-k scale."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("lang", F.explode(tokenize(F.col("text"))).alias("term"))
    return (
        grouped_top_k(toks, "lang", "term", k=5)
        .orderBy("lang", "rank")
    )


@register(
    "user_rolling_1h",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_win,
           round(CAST(SUM(TRY_CAST(value AS DECIMAL(12,2))) OVER w
                      AS DOUBLE), 2) AS sum_win
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY epoch_us(ts)
      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    ORDER BY event_id
    """,
    tags=("timeseries", "window", "events", "gap"),
)
def user_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour per-user rollup (operators.timeseries.
    rolling_range_agg): for every event, the count and value-sum of
    that user's events in the preceding hour — RANGE frame over exact
    epoch-microseconds, so tied timestamps aggregate as peers and the
    result is set-determined."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    return (
        rolling_range_agg(ev, "user_id", "ts", "value", 3600)
        .select("event_id", "user_id", "n_win", "sum_win")
        .orderBy("event_id")
    )


@register(
    "lang_sampling_weights",
    oracle="""
    WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
               FROM documents GROUP BY lang),
    t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS total FROM c),
    p AS (SELECT lang, n_docs,
                 pow(CAST(n_docs AS DOUBLE) / total, 0.3) AS pw
          FROM c, t),
    z AS (SELECT SUM(pw) AS z FROM p)
    SELECT lang, n_docs, round(pw / z, 4) AS weight
    FROM p, z
    ORDER BY lang
    """,
    tags=("sampling", "documents", "gap"),
)
def lang_sampling_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-resampled language sampling weights (alpha = 0.3,
    the multilingual-pretraining convention): w_l proportional to
    (n_l/N)^alpha, normalized. Two tiny aggregations over per-language
    counts; the per-language table is broadcast both times."""
    docs = _t(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("total"))
    p = counts.crossJoin(F.broadcast(total)).withColumn(
        "pw", F.pow(F.col("n_docs").cast("double") / F.col("total"), F.lit(0.3))
    )
    z = p.agg(F.sum("pw").alias("z"))
    return (
        p.crossJoin(F.broadcast(z))
        .select(
            "lang",
            "n_docs",
            F.round(F.col("pw") / F.col("z"), 4).alias("weight"),
        )
        .orderBy("lang")
    )


@register(
    "hygiene_filtered_docs",
    oracle="""
    WITH cand AS (SELECT * FROM documents WHERE source <> 'src0'),
    shw AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(trim(lower(
               regexp_replace(text, '[^a-zA-Z0-9\\s]+', ' ', 'g'))), '\\s+'),
               x -> x <> '') AS words
      FROM documents
    ),
    tok5 AS (
      SELECT doc_id, source,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(words) - 4, 1) + 1),
               i -> array_to_string(list_slice(words, i, i + 4), ' ')))) AS gram
      FROM shw WHERE len(words) > 0
    ),
    bench AS (SELECT DISTINCT gram FROM tok5 WHERE source = 'src0'),
    contaminated AS (
      SELECT DISTINCT doc_id FROM tok5 JOIN bench USING (gram)
      WHERE source <> 'src0'
    ),
    rw AS (
      SELECT doc_id,
             list_sort(list_filter(string_split(text, ' '), x -> x <> ''))
               AS sw,
             len(list_filter(string_split(text, ' '), x -> x <> '')) AS n
      FROM cand
    ),
    rep AS (
      SELECT doc_id,
             CASE WHEN n > 0 THEN round(CAST(
               COALESCE(list_max(list_transform(
                 range(1, len(list_filter(range(1, n + 1),
                   i -> i = 1 OR sw[i] <> sw[i-1])) + 1),
                 k -> (CASE WHEN k < len(list_filter(range(1, n + 1),
                         i -> i = 1 OR sw[i] <> sw[i-1]))
                       THEN (list_filter(range(1, n + 1),
                         i -> i = 1 OR sw[i] <> sw[i-1]))[k+1]
                       ELSE n + 1 END)
                      - (list_filter(range(1, n + 1),
                         i -> i = 1 OR sw[i] <> sw[i-1]))[k])), 0)
               AS DOUBLE) / n, 4) END AS top_token_fraction
      FROM rw
    ),
    tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(trim(lower(
               regexp_replace(text, '[^a-zA-Z0-9\\s]+', ' ', 'g'))), '\\s+'),
               x -> x <> '')) AS term
      FROM cand
    ),
    counts AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term),
    total AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM counts),
    lp AS (
      SELECT doc_id,
             round(AVG(ln(CAST(cnt AS DOUBLE) / total)), 4) AS mean_logprob
      FROM tok JOIN counts USING (term), total
      GROUP BY doc_id
    )
    SELECT c.doc_id, rep.top_token_fraction, lp.mean_logprob
    FROM cand c
    JOIN rep USING (doc_id)
    JOIN lp USING (doc_id)
    WHERE c.doc_id NOT IN (SELECT doc_id FROM contaminated)
      AND rep.top_token_fraction <= 0.15
      AND lp.mean_logprob >= -3.6
    ORDER BY c.doc_id
    """,
    tags=("quality", "decontamination", "documents", "gap", "extension"),
)
def hygiene_filtered_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed corpus-hygiene filter: candidates (source != 'src0')
    that survive benchmark decontamination AND the Gopher top-token
    repetition bound (<= 0.15) AND the unigram-LM quality band
    (mean log-prob >= -3.6, model fit on the candidate corpus), with
    their signals. Thresholds compare the 4dp-ROUNDED signals — the
    same values both engines emit — so boundary docs classify
    identically cross-engine. One scan feeds the shingle pass, one
    the repetition fold, one the LM explode; all three joins are
    id-keyed."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0")
    cands = docs.filter(F.col("source") != "src0")
    from corral_spark.operators.contamination import decontaminate

    clean = decontaminate(cands, bench, "doc_id", "text", n=5)
    rep = repetition_stats(cands).select("doc_id", "top_token_fraction")
    lp = unigram_logprob(cands).select("doc_id", "mean_logprob")
    return (
        # clean/rep/lp are all per-candidate-document (corpus-scaled)
        # — shuffle_hash per the corpus-scaled join rule (r16 audit:
        # Catalyst static-planned the surviving-ids set as a driver
        # broadcast build).
        clean.select("doc_id")
        .join(rep.hint("shuffle_hash"), "doc_id")
        .join(lp.hint("shuffle_hash"), "doc_id")
        .filter(
            (F.col("top_token_fraction") <= 0.15)
            & (F.col("mean_logprob") >= -3.6)
        )
        .orderBy("doc_id")
    )
