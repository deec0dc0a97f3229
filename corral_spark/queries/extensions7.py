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
