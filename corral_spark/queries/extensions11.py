"""Round-9 extensions: driver-gated row for the phrase-mining module
(the r8 verdict's one hygiene finding — operators/phrases.py was the
repo's only module outside the engine's gates: real, documented code
with zero registry consumers and zero tests).

* phrase_mining_docs — word2phrase/BPE-style iterative merge
  learning (operators.phrases.learn_phrases): k rounds of "count
  adjacent token pairs, merge the globally most frequent pair
  everywhere" over the documents corpus. Each round is one
  full-corpus pair aggregation (shuffle carries one row per DISTINCT
  pair, map-side combined) plus a single-row argmax collect —
  bounded driver-side control flow, the k-means-iteration shape.
  Counts are exact integers and the merge rule (two passes of the
  literal ``' a b '`` -> ``' a@b '`` rewrite) is engine-identical,
  so the oracle replays all four iterations unrolled and the result
  hash-matches bit-exactly.

No reference analog (bcongdon/corral is a Go MapReduce framework
with no tokenizer-vocabulary surface); extends SURVEY §2.4's
LLM-pipeline family (phrase vocabulary growth for tokenizers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from corral_spark.operators.phrases import learn_phrases
from corral_spark.queries.registry import register
from corral_spark.sources.tables import load_table


def _phrase_iteration_sql(n: int) -> str:
    """One unrolled learn iteration: argmax bigram of corpus c{n-1},
    then the two-pass literal merge rewrite producing corpus c{n}."""
    prev = f"c{n - 1}"
    return f"""
    p{n} AS (
      SELECT pair, COUNT(*) AS cnt FROM (
        SELECT unnest(list_transform(range(1, len(toks)),
                      i -> toks[i] || ' ' || toks[i + 1])) AS pair
        FROM (SELECT list_filter(string_split(trim(s), ' '),
                                 w -> w <> '') AS toks FROM {prev})
      ) GROUP BY pair ORDER BY cnt DESC, pair LIMIT 1
    ),
    c{n} AS (
      SELECT regexp_replace(regexp_replace(s,
               ' ' || p{n}.pair || ' ',
               ' ' || replace(p{n}.pair, ' ', '@') || ' ', 'g'),
               ' ' || p{n}.pair || ' ',
               ' ' || replace(p{n}.pair, ' ', '@') || ' ', 'g') AS s
      FROM {prev}, p{n}
    )"""


_PHRASE_ORACLE = (
    """
    WITH c0 AS (
      SELECT ' ' || array_to_string(list_filter(string_split_regex(
               trim(lower(regexp_replace(text,
                 '[^a-zA-Z0-9\\s]+', ' ', 'g'))),
               '\\s+'), w -> w <> ''), ' ') || ' ' AS s
      FROM documents
    ),"""
    + ",".join(_phrase_iteration_sql(n) for n in (1, 2, 3, 4))
    + """
    SELECT iteration, pair, cnt FROM (
      SELECT CAST(1 AS INTEGER) AS iteration, pair,
             CAST(cnt AS BIGINT) AS cnt FROM p1
      UNION ALL SELECT 2, pair, CAST(cnt AS BIGINT) FROM p2
      UNION ALL SELECT 3, pair, CAST(cnt AS BIGINT) FROM p3
      UNION ALL SELECT 4, pair, CAST(cnt AS BIGINT) FROM p4
    ) ORDER BY iteration
    """
)


@register(
    "phrase_mining_docs",
    oracle=_PHRASE_ORACLE,
    tags=("text", "iterative", "extension"),
)
def phrase_mining_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-4 learned phrase merges over the documents corpus
    (operators.phrases.learn_phrases, word2phrase-style collocation
    learning): (iteration, pair, cnt) — the pair merged in each round
    and its pre-merge exact occurrence count. The oracle unrolls the
    four iterations (argmax bigram + the same deterministic two-pass
    literal rewrite) so the gate independently replays the whole
    greedy merge trajectory, tie-breaks included."""
    docs = load_table(spark, sf_dir, "documents")
    return learn_phrases(docs, text_col="text", k=4).orderBy("iteration")
