"""Round-7 extension wave: the 100 TB-posture branches driven through
the driver's oracle gate.

``bloom_new_docs_registers`` exercises the DISTRIBUTED register-file
Bloom filter (the branch sized for 10^9+ keys, previously pytest-only);
``pretrain_corpus_provenance`` ships the fully-composed hygiene
capstone WITH scan-resolved row provenance, so every surviving corpus
row names its source shard and physical row — the takedown/forensics
contract, oracled end to end.

No reference analog — the reference's closest surfaces are the
word_count example and the byte-offset input splits
(reference split.go:15-19); both rows are SURVEY §2.4 extension
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corral_spark.queries.extensions6 import _FULL_ORACLE
from corral_spark.queries.registry import register
from corral_spark.sources.tables import load_table


@register(
    "bloom_new_docs_registers",
    oracle="""
    WITH existing AS (
      SELECT text FROM documents WHERE doc_id % 2 = 0
    ),
    incoming AS (
      SELECT doc_id, lang, source, text FROM documents WHERE doc_id % 2 = 1
    )
    SELECT i.doc_id, i.lang, i.source
    FROM incoming i
    WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.text = i.text)
    ORDER BY i.doc_id
    """,
    tags=("dedup", "sketch", "extension"),
)
def bloom_new_docs_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The register-file Bloom branch through the driver gate: same
    incremental-dedup semantics as ``bloom_new_docs`` (even-id docs
    are the seen corpus, odd-id the incoming batch; output = never-
    seen incoming docs, EXACTLY the anti-join the oracle runs), but
    with m_bits = 2^28 — past BLOOM_DENSE_MAX_BITS (2^27), so
    ``bloom_new_rows`` must route through the distributed (word, bits)
    register file and probe by word-index equi-join
    (sketches.bloom_build_registers / bloom_might_contain_registers).
    No single-row array, no broadcast ceiling, no driver collect: the
    shape that lets the filter be sized for 10^9+ keys at 100 TB. The
    hash match proves the big-m branch — sparse build, word join,
    k-bit AND, exact verification of the "maybe" fraction — computes
    the same exact result the dense broadcast branch does."""
    from corral_spark.operators.sketches import bloom_new_rows

    docs = load_table(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") % 2 == 0)
    incoming = docs.filter(F.col("doc_id") % 2 == 1)
    new = bloom_new_rows(existing, incoming, "text", m_bits=1 << 28)
    return new.select("doc_id", "lang", "source").orderBy("doc_id")


@register(
    "pretrain_corpus_provenance",
    oracle=f"""
    WITH prov AS (
      SELECT doc_id,
             'documents.parquet' AS source_file,
             CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT)
               AS source_row
      FROM documents
    )
    SELECT b.doc_id, b.clean_text, b.n_words, b.split,
           p.source_file, p.source_row
    FROM (
      {_FULL_ORACLE}
    ) b JOIN prov p USING (doc_id)
    ORDER BY b.doc_id
    """,
    tags=("pipeline", "provenance", "extension"),
)
def pretrain_corpus_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The all-stages hygiene capstone (pretrain_corpus_full's exact
    stage order and parameters) with ``provenance=True``: every
    surviving corpus row carries (source_file, source_row) resolved
    from the parquet scan's hidden ``_metadata`` struct BEFORE the
    funnel and joined back after the split — the audit-traceability
    contract a shipped training corpus needs (takedowns, contamination
    forensics name the source shard + physical row, not just a doc
    id). The oracle replays the full composed funnel AND the
    provenance rank (the driver testdata's verified property: the
    documents file is written in doc_id order, so physical row index
    == doc_id rank over the WHOLE file — the filter to non-src0
    sources happens after the scan and must not renumber rows, which
    the hash match proves)."""
    from corral_spark.pipelines import prepare_pretraining_corpus

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("source") == "src0").select("doc_id", "text")
    cands = docs.filter(F.col("source") != "src0").select("doc_id", "text")
    corpus, _report = prepare_pretraining_corpus(
        cands,
        with_report=False,
        near_dup="verified",
        benchmark=bench,
        max_top_token_fraction=0.2,
        boilerplate_max_df=2,
        gram_dedup_k=8,
        provenance=True,
    )
    return corpus.select(
        "doc_id", "clean_text", "n_words", "split", "source_file", "source_row"
    ).orderBy("doc_id")


@register(
    "dedup_keep_longest_docs",
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
    ),
    comps AS (SELECT node AS doc_id, MIN(root) AS comp FROM reach GROUP BY node),
    ranked AS (
      SELECT d.doc_id, d.n_chars,
             ROW_NUMBER() OVER (PARTITION BY c.comp
                                ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn
      FROM documents d JOIN comps c USING (doc_id)
    )
    SELECT doc_id, n_chars FROM ranked WHERE rn = 1
    ORDER BY doc_id
    """,
    tags=("dedup", "graph", "quality", "extension"),
)
def dedup_keep_longest_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup survivor selection
    (operators.graph.dedup_keep_best): within each exact-Jaccard>=0.2
    cluster (same edges as dedup_clusters_docs), keep the LONGEST
    document (n_chars, ties to smallest id) instead of the arbitrary
    min-id winner — the RefinedWeb-style rule that dedup should retain
    content at its most complete version. The oracle replays the
    recursive-CTE components fixpoint plus the per-component arg-max,
    so the hash match proves cluster resolution AND winner selection
    end to end."""
    from corral_spark.operators.dedup import jaccard_pairs
    from corral_spark.operators.graph import dedup_keep_best

    docs = load_table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, "text", "doc_id", threshold=0.2)
    return (
        dedup_keep_best(
            docs.select("doc_id", "n_chars"), pairs, "doc_id", "n_chars"
        )
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
    )
