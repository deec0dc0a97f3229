"""Round-6 extension wave: the fully-composed hygiene capstone.

``pretrain_corpus`` oracle-checks the base five-stage funnel; the
optional hygiene stages (benchmark decontamination, C4 boilerplate
removal, sliding-gram substring dedup, Gopher repetition bound) were
each individually oracled but their COMPOSITION was pytest-only (r5
verdict item 6). ``pretrain_corpus_full`` runs the pipeline with every
stage enabled and replays the entire composed funnel in one DuckDB
statement, stage order and all — the stage CTEs are the already-green
component oracles chained in the pipeline's order.

No reference analog — the reference's closest surface is the
word_count example (examples/word_count/word_count.go); the composed
corpus-prep pipeline is SURVEY §2.4 extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corral_spark.queries.extensions4 import _max_run_sql
from corral_spark.queries.registry import register
from corral_spark.sources.tables import load_table

# Stage order replayed below (must match pipelines.pretrain):
#   decontaminate (raw text, 5-gram vs the src0 slice)
#   -> normalize + redact
#   -> boilerplate removal (10-word segments, max_df=2)
#   -> sliding 8-gram substring dedup
#   -> quality filter (n_words >= 20, distinct_ratio >= 0.3,
#      top_token_fraction <= 0.2)
#   -> exact dedup (min-id winner)
#   -> verified near-dup (5-gram Jaccard >= 0.5) -> components -> reps
#   -> md5 split
_FULL_ORACLE = """
    WITH RECURSIVE
    cand AS (
      SELECT doc_id, text FROM documents WHERE source <> 'src0'
    ),
    dw AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(
               regexp_replace(text, '[^a-zA-Z0-9\\s]+', ' ', 'g'))), '\\s+'),
               x -> x <> '') AS words
      FROM cand
    ),
    bw AS (
      SELECT list_filter(string_split_regex(trim(lower(
               regexp_replace(text, '[^a-zA-Z0-9\\s]+', ' ', 'g'))), '\\s+'),
               x -> x <> '') AS words
      FROM documents WHERE source = 'src0'
    ),
    btok AS (
      SELECT DISTINCT unnest(list_distinct(list_transform(
               range(1, greatest(len(words) - 4, 1) + 1),
               i -> array_to_string(list_slice(words, i, i + 4), ' ')))) AS gram
      FROM bw WHERE len(words) > 0
    ),
    ctok AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(words) - 4, 1) + 1),
               i -> array_to_string(list_slice(words, i, i + 4), ' ')))) AS gram
      FROM dw WHERE len(words) > 0
    ),
    contaminated AS (
      SELECT DISTINCT c.doc_id FROM ctok c JOIN btok USING (gram)
    ),
    decon AS (
      SELECT c.doc_id, c.text FROM cand c
      ANTI JOIN contaminated x ON c.doc_id = x.doc_id
    ),
    clean AS (
      SELECT doc_id,
             trim(regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(lower(text), '\\s+', ' ', 'g'),
                   '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
                 '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
               '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>', 'g')) AS t
      FROM decon
    ),
    bbase AS (
      SELECT doc_id,
             list_filter(string_split(t, ' '), x -> x <> '') AS words,
             CAST(ceil(len(list_filter(string_split(t, ' '), x -> x <> ''))
                       / 10.0) AS INT) AS nseg
      FROM clean
    ),
    bsegs AS (
      SELECT doc_id, CAST(j AS INT) AS seg_idx,
             array_to_string(list_slice(words, j*10 + 1, j*10 + 10), ' ') AS seg
      FROM bbase, unnest(range(0, nseg)) AS t1(j)
    ),
    bhot AS (
      SELECT seg FROM bsegs GROUP BY seg HAVING COUNT(DISTINCT doc_id) > 2
    ),
    bkept AS (
      SELECT s.* FROM bsegs s WHERE s.seg NOT IN (SELECT seg FROM bhot)
    ),
    bp AS (
      SELECT b.doc_id, COALESCE(r.ct, '') AS t
      FROM bbase b LEFT JOIN (
        SELECT doc_id, string_agg(seg, ' ' ORDER BY seg_idx) AS ct
        FROM bkept GROUP BY doc_id
      ) r USING (doc_id)
    ),
    gbase AS (
      SELECT doc_id,
             list_filter(string_split(t, ' '), x -> x <> '') AS words,
             CAST(len(list_filter(string_split(t, ' '), x -> x <> ''))
                  AS INT) AS n
      FROM bp
    ),
    gtok AS (
      SELECT doc_id, CAST(i AS INT) AS i, words[CAST(i AS INT) + 1] AS w
      FROM gbase, unnest(range(0, n)) AS t2(i)
    ),
    gwins AS (
      SELECT doc_id, CAST(j AS INT) AS pos,
             array_to_string(list_slice(words, CAST(j AS INT) + 1,
                                        CAST(j AS INT) + 8), ' ') AS gram
      FROM gbase, unnest(range(0, n - 8 + 1)) AS t3(j)
      WHERE n >= 8
    ),
    gocc AS (
      SELECT doc_id, pos,
             (ROW_NUMBER() OVER (PARTITION BY gram
                                 ORDER BY doc_id, pos) > 1) AS dup
      FROM gwins
    ),
    gremoved AS (
      SELECT doc_id, CAST(pos + c AS INT) AS i
      FROM gocc, unnest(range(0, 8)) AS t4(c)
      GROUP BY doc_id, CAST(pos + c AS INT)
      HAVING bool_and(dup)
    ),
    gkept AS (
      SELECT t.doc_id, t.i, t.w FROM gtok t
      ANTI JOIN gremoved r ON t.doc_id = r.doc_id AND t.i = r.i
    ),
    gd AS (
      SELECT b.doc_id, COALESCE(r.ct, '') AS clean_text
      FROM gbase b LEFT JOIN (
        SELECT doc_id, string_agg(w, ' ' ORDER BY i) AS ct
        FROM gkept GROUP BY doc_id
      ) r USING (doc_id)
    ),
    qs AS (
      SELECT doc_id, clean_text,
             len(list_filter(string_split(clean_text, ' '), x -> x <> '')) AS n,
             CAST(len(list_distinct(list_filter(string_split(clean_text, ' '),
               x -> x <> ''))) AS DOUBLE)
               / NULLIF(len(list_filter(string_split(clean_text, ' '),
                 x -> x <> '')), 0) AS dr,
             list_sort(list_filter(string_split(clean_text, ' '),
               x -> x <> '')) AS sw
      FROM gd
    ),
    filtered AS (
      SELECT doc_id, clean_text, CAST(n AS INT) AS n_words
      FROM qs
      WHERE n >= 20 AND dr >= 0.3
        AND round(CAST(__MAXRUN__ AS DOUBLE) / n, 4) <= 0.2
    ),
    exact AS (
      SELECT doc_id, clean_text, n_words FROM (
        SELECT *, MIN(doc_id) OVER (PARTITION BY clean_text) AS keep
        FROM filtered
      ) WHERE doc_id = keep
    ),
    w2 AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(
               regexp_replace(clean_text, '[^a-zA-Z0-9\\s]+', ' ', 'g'))), '\\s+'),
               x -> x <> '') AS words
      FROM exact
    ),
    tok2 AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, greatest(len(words) - 4, 1) + 1),
               i -> array_to_string(list_slice(words, i, i + 4), ' ')))) AS token
      FROM w2 WHERE len(words) > 0
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok2 GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM tok2 a JOIN tok2 b ON a.token = b.token AND a.doc_id < b.doc_id
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
""".replace("__MAXRUN__", _max_run_sql("sw", "n"))


@register(
    "multimodal_ppm_decode",
    oracle="""
    SELECT doc_id AS asset_id,
           -- positive modulus on the data-derived dimension: a
           -- negative n_chars must yield a VALID width (r14 extreme
           -- campaign; the raw % would build a negative-width header)
           CAST(8 + ((n_chars % 24) + 24) % 24 AS INT) AS width,
           CAST(4 + doc_id % 16 AS INT) AS height,
           CAST(9 + length(CAST(8 + ((n_chars % 24) + 24) % 24 AS VARCHAR))
                  + length(CAST(4 + doc_id % 16 AS VARCHAR))
                  + (8 + ((n_chars % 24) + 24) % 24) * (4 + doc_id % 16) * 3
                AS BIGINT) AS n_bytes
    FROM documents
    WHERE n_chars IS NOT NULL
    ORDER BY asset_id
    """,
    tags=("multimodal", "extension"),
)
def multimodal_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode in the driver gate: manufacture a binary PPM
    (P6) payload per document (dims derived from row data, pixel body
    sized to match), push it through the SAME Arrow mapInPandas
    feature extractor as the fake-decode row — but with the native
    zero-dependency P6 parser (multimodal.decode_ppm via decode_auto)
    — and emit the parsed width/height plus the payload byte length.
    The oracle recomputes the encoded dimensions and the exact header
    + 3wh byte length arithmetically: a hash match proves the parser
    EXTRACTED what the payload ENCODED, end to end through Spark.
    Compressed codecs stay behind the charter-limited PIL seam; this
    row retires the 'decode is stubbed' caveat for uncompressed
    formats."""
    from corral_spark.operators.multimodal import (
        decode_auto,
        extract_features,
    )

    # A NULL payload is not an asset (r13 assets_from_documents rule
    # applied to this generator): a NULL n_chars would build a NULL
    # payload and kill the whole Arrow batch in the decoder.
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    )
    w = (F.lit(8) + F.pmod(F.col("n_chars"), F.lit(24))).cast("int")
    h = (F.lit(4) + F.col("doc_id") % 16).cast("int")
    payload = F.encode(
        F.concat(
            F.lit("P6\n"),
            w.cast("string"),
            F.lit(" "),
            h.cast("string"),
            F.lit("\n255\n"),
            F.repeat(F.lit("x"), w * h * 3),
        ),
        "UTF-8",
    )
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image/ppm").alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )
    return (
        extract_features(assets, decoder=decode_auto)
        .select("asset_id", "width", "height", "n_bytes")
        .orderBy("asset_id")
    )


def _le16(col):
    """Little-endian 2-byte hex of a 0..65535 column (RIFF fields are
    LE; Spark's hex() is big-endian, so swap the byte pairs)."""
    h = F.lpad(F.hex(col), 4, "0")
    return F.concat(F.substring(h, 3, 2), F.substring(h, 1, 2))


def _le32(col):
    h = F.lpad(F.hex(col), 8, "0")
    return F.concat(
        F.substring(h, 7, 2),
        F.substring(h, 5, 2),
        F.substring(h, 3, 2),
        F.substring(h, 1, 2),
    )


@register(
    "multimodal_wav_decode",
    oracle="""
    SELECT doc_id AS asset_id,
           CAST(8000 AS INT) AS sample_rate,
           CAST(1 AS INT) AS channels,
           CAST(16 AS INT) AS bits_per_sample,
           CAST(4 + doc_id % 64 AS BIGINT) AS n_frames,
           CAST((4 + doc_id % 64) * 1000 // 8000 AS BIGINT) AS duration_ms,
           -- positive modulus: the amplitude is an UNSIGNED PCM
           -- sample, so a negative n_chars must wrap into 0..1023 on
           -- both engines (Spark % and DuckDB % both follow the
           -- dividend's sign — r14 extreme campaign)
           CAST(((n_chars % 1024) + 1024) % 1024 AS BIGINT) AS rms
    FROM documents
    WHERE n_chars IS NOT NULL
    ORDER BY asset_id
    """,
    tags=("multimodal", "extension"),
)
def multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode in the driver gate, the WAV sibling of
    multimodal_ppm_decode: Spark assembles a valid RIFF/WAVE PCM
    payload per document from hex expressions (LE chunk sizes, 16-bit
    mono at 8 kHz, n = 4 + doc_id % 64 constant-amplitude samples of
    c = n_chars % 1024), and the native chunk-walk parser + exact
    integer RMS (multimodal.decode_wav_meta / extract_audio_features)
    recovers every field through the Arrow extractor. Constant
    amplitude makes the RMS exactly c (isqrt(n*c^2/n) = c), so the
    oracle recomputes the full feature row — rate, channels, bits,
    frames, duration, RMS — arithmetically from the doc columns. A
    hash match proves byte-level WAV parsing AND the PCM sample math,
    end to end."""
    from corral_spark.operators.multimodal import extract_audio_features

    # A NULL payload is not an asset — NULL n_chars would hex-encode
    # to a NULL payload (same generator rule as the PPM twin).
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("n_chars").isNotNull()
    )
    n = (F.lit(4) + F.col("doc_id") % 64).cast("long")
    c = F.pmod(F.col("n_chars"), F.lit(1024)).cast("long")
    payload_hex = F.concat(
        F.lit("52494646"),  # "RIFF"
        _le32(F.lit(36) + n * 2),  # riff size = 36 + data bytes
        F.lit("57415645"),  # "WAVE"
        F.lit("666D7420"),  # "fmt "
        _le32(F.lit(16)),
        _le16(F.lit(1)),  # PCM
        _le16(F.lit(1)),  # mono
        _le32(F.lit(8000)),  # sample rate
        _le32(F.lit(16000)),  # byte rate
        _le16(F.lit(2)),  # block align
        _le16(F.lit(16)),  # bits
        F.lit("64617461"),  # "data"
        _le32(n * 2),
        F.repeat(_le16(c), n.cast("int")),
    )
    payload = F.unhex(payload_hex)
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("audio/wav").alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )
    return (
        extract_audio_features(assets)
        .select(
            "asset_id",
            "sample_rate",
            "channels",
            "bits_per_sample",
            "n_frames",
            "duration_ms",
            "rms",
        )
        .orderBy("asset_id")
    )


@register(
    "weighted_sampled_docs",
    oracle="""
    WITH m AS (SELECT CAST(MAX(n_chars) AS BIGINT) AS maxw FROM documents)
    SELECT doc_id, n_chars, source
    FROM documents, m
    WHERE CAST(('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
            * maxw
          < CAST(n_chars AS BIGINT) * 3006477107
    ORDER BY doc_id
    """,
    tags=("sampling", "documents", "extension"),
)
def weighted_sampled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted corpus thinning APPLIED: keep each document
    with probability 0.7 * n_chars / max(n_chars) — longer documents
    proportionally more likely to survive, the standard
    length/quality-weighted sampling rule
    (operators.sampling.weighted_bernoulli_sample). The keep decision
    is integer-exact (u32 * max_w < w * floor(0.7 * 2^32)), so the
    oracle replays the sample bit-for-bit — no float boundary hazard
    at any weight."""
    from corral_spark.operators.sampling import weighted_bernoulli_sample

    docs = load_table(spark, sf_dir, "documents")
    out = weighted_bernoulli_sample(docs, "doc_id", "n_chars", 0.7)
    return out.select("doc_id", "n_chars", "source").orderBy("doc_id")


def _hll_regs_sql(src_filter: str) -> str:
    """Register-file CTE chain for lineitem l_partkey per l_returnflag
    (the extensions5.hll_distinct_parts oracle's rb/rr/regs stages,
    parameterized by a slice predicate so merged-sketch queries can
    replay each slice's register build independently)."""
    return f"""
      SELECT flag, bucket, MAX(rho) AS rho FROM (
        SELECT flag, bucket,
               CASE WHEN length(s) = 0 THEN 49
                    ELSE (12 - length(s)) * 4
                         + CASE WHEN CAST(('0x' || substr(s, 1, 1)) AS BIGINT) >= 8 THEN 0
                                WHEN CAST(('0x' || substr(s, 1, 1)) AS BIGINT) >= 4 THEN 1
                                WHEN CAST(('0x' || substr(s, 1, 1)) AS BIGINT) >= 2 THEN 2
                                ELSE 3 END + 1
               END AS rho
        FROM (
          SELECT l_returnflag AS flag,
                 CAST(('0x' || substr(h, 1, 4)) AS BIGINT) % 1024 AS bucket,
                 regexp_replace(substr(h, 5, 12), '^0*', '') AS s
          FROM (
            SELECT l_returnflag,
                   md5('hll:' || CAST(l_partkey AS VARCHAR)) AS h
            FROM lineitem
            WHERE ({src_filter}) AND l_partkey IS NOT NULL
          )
        )
      ) GROUP BY flag, bucket
    """


@register(
    "hll_merged_slices",
    oracle=f"""
    WITH ra AS ({_hll_regs_sql("l_linestatus = 'O'")}),
    rb AS ({_hll_regs_sql("l_linestatus = 'F'")}),
    merged AS (
      SELECT flag, bucket, MAX(rho) AS rho
      FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb)
      GROUP BY flag, bucket
    ),
    agg AS (
      SELECT flag, CAST(COUNT(*) AS BIGINT) AS filled,
             CAST(SUM(CAST(POWER(2, 49 - rho) AS BIGINT)) AS BIGINT)
               + (1024 - COUNT(*)) * 562949953421312 AS reg_sum
      FROM merged GROUP BY flag
    ),
    fa AS (SELECT flag, CAST(COUNT(*) AS BIGINT) AS filled_o FROM ra GROUP BY flag),
    fb AS (SELECT flag, CAST(COUNT(*) AS BIGINT) AS filled_f FROM rb GROUP BY flag)
    SELECT a.flag AS l_returnflag,
           COALESCE(fa.filled_o, 0) AS filled_o,
           COALESCE(fb.filled_f, 0) AS filled_f,
           a.filled, a.reg_sum,
           CAST(FLOOR(4.253321908301858e+20 / CAST(a.reg_sum AS DOUBLE)) AS BIGINT) AS hll_raw
    FROM agg a LEFT JOIN fa USING (flag) LEFT JOIN fb USING (flag)
    ORDER BY l_returnflag
    """,
    tags=("sketch", "approx", "extension"),
)
def hll_merged_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB HLL composition pattern as a driver-oracled row:
    per-slice register files (the 'O' and 'F' l_linestatus slices
    standing in for per-day partitions) merged by hll_merge (union +
    max-per-bucket) and estimated — never rescanning the union.

    SINGLE-SCAN since round 7 (r6 verdict item 5): instead of one
    fact-table scan per slice, the slice column joins the sketch's
    group key — ``hll_registers(..., group_cols=(l_returnflag,
    l_linestatus))`` builds every slice's register file in ONE pass,
    and merging is just re-grouping the registers with the slice
    column dropped (hll_merge on the slice-erased frame) — the exact
    per-day pattern at scale, where each day is sketched as it lands
    and the union is never rescanned. The tiny register file is
    materialized once and feeds the merged estimator AND both
    per-slice filled counts, so the whole query reads lineitem exactly
    once (plan-pinned in test_plans). The oracle (unchanged) replays
    the per-slice builds independently; the hash match proves the
    single-pass grouped build produces identical registers. Output
    carries each slice's filled-register count so the row proves
    per-slice sketches existed, not just the final estimate."""
    from corral_spark.materialize import materialize
    from corral_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_linestatus").isin("O", "F")
        & F.col("l_partkey").isNotNull()  # NULL is not a value (r13)
    )
    regs = materialize(
        hll_registers(
            li, "l_partkey", ("l_returnflag", "l_linestatus")
        ),
        eager=False,
    )
    merged = hll_merge(regs.drop("l_linestatus"))
    est = hll_estimate(merged, ("l_returnflag",)).drop("hll_est")
    fa = (
        regs.filter(F.col("l_linestatus") == "O")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("filled_o"))
    )
    fb = (
        regs.filter(F.col("l_linestatus") == "F")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("filled_f"))
    )
    return (
        est.join(fa, "l_returnflag", "left")
        .join(fb, "l_returnflag", "left")
        .select(
            "l_returnflag",
            F.coalesce("filled_o", F.lit(0)).alias("filled_o"),
            F.coalesce("filled_f", F.lit(0)).alias("filled_f"),
            "filled",
            "reg_sum",
            "hll_raw",
        )
        .orderBy("l_returnflag")
    )


@register(
    "pretrain_corpus_full",
    oracle=_FULL_ORACLE,
    tags=("pipeline", "dedup", "quality", "sampling", "extension"),
)
def pretrain_corpus_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone pipeline with EVERY hygiene stage enabled
    (pipelines.prepare_pretraining_corpus): 5-gram decontamination
    against the corpus's src0 slice as the stand-in benchmark, then
    normalize+redact, C4 boilerplate removal (10-word segments,
    max_df=2), sliding 8-gram substring dedup, the quality filter
    extended with the Gopher top-token repetition bound (<= 0.2),
    min-id exact dedup, verified MinHash near-dedup (Jaccard >= 0.5)
    with connected-component reps, and the reproducible md5 split.
    Each stage's oracle was already green standalone; this row proves
    the COMPOSITION — same stage order, same parameters — end to end
    against DuckDB."""
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
    )
    return corpus.orderBy("doc_id")


@register(
    "doc_provenance",
    oracle="""
    SELECT doc_id,
           'documents.parquet' AS source_file,
           CAST(ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS BIGINT)
             AS source_row
    FROM documents
    ORDER BY doc_id
    """,
    tags=("provenance", "documents", "extension"),
)
def doc_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row provenance via the file source's hidden ``_metadata`` struct
    (sources.provenance.with_provenance): the physical parquet row
    index and source file for every document — zero-cost lineage (no
    generated ids, no shuffle), the audit/traceability column a
    shipped training corpus carries. The oracle exploits a verified
    property of the driver's testdata (documents.parquet is written in
    doc_id order at every SF, checked 0.001/0.01/0.1): the physical
    row index must equal the doc_id rank, so a hash match proves
    Spark's ``_metadata.row_index`` is the true file position — not
    merely some stable counter."""
    from corral_spark.sources.provenance import with_provenance

    docs = load_table(spark, sf_dir, "documents")
    return (
        with_provenance(docs, basename_only=True)
        .select("doc_id", "source_file", "source_row")
        .orderBy("doc_id")
    )


@register(
    "cross_corpus_near_dups",
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
               i -> array_to_string(list_slice(words, i, i + 4), ' ')))) AS token
      FROM w WHERE len(words) > 0
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM tok a JOIN tok b ON a.token = b.token
      WHERE a.source = 'src0' AND b.source <> 'src0'
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) AS jaccard
    FROM inter JOIN sizes sa ON sa.doc_id = id_a
               JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
    ORDER BY id_a, id_b
    """,
    tags=("dedup", "join", "extension"),
)
def cross_corpus_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus near-duplicate detection
    (operators.dedup.minhash_pairs_across): treat the src0 slice as
    the EXISTING training set and the rest as INCOMING data, and find
    every incoming document whose 5-gram Jaccard with an existing one
    is >= 0.5 — the content-level admission check continuous ingest
    runs before adding data (bloom_new_docs is the exact-key sibling).
    Banded-LSH candidates from an equi-join of the two corpora's band
    keys (never |A| x |B|), exact verification on candidates only,
    two-sided short-doc completeness. The oracle computes the TRUE
    all-pairs cross-source Jaccard set, so a hash match also proves
    band recall was 1.0 on this data."""
    from corral_spark.operators.dedup import minhash_pairs_across

    docs = load_table(spark, sf_dir, "documents")
    existing = docs.filter(F.col("source") == "src0")
    incoming = docs.filter(F.col("source") != "src0")
    return minhash_pairs_across(
        existing, incoming, "text", "doc_id", threshold=0.5
    ).orderBy("id_a", "id_b")
