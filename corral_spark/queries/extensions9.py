"""Round-7 third-wave extensions: mergeable distribution/overlap
sketches, seeded graph traversal, robust outlier screening, and
funnel analysis — operator families a 100 TB analytics engine needs
that the registry did not yet cover as driver-gated rows:

* equi-width histogram sketch + quantile readout (the O(nbins)
  mergeable substitute for a full-sort exact percentile);
* HLL set algebra (distinct-overlap between two corpora from two
  O(m) register files — no join, no rescan);
* multi-source BFS hop distance (the Pregel iteration shape, seeded
  and distance-valued);
* median/MAD robust outlier report (the screen that survives the
  outliers a mean/stddev rule absorbs);
* ordered event funnel (min-timestamp stage chaining).

No reference analog (bcongdon/corral is a MapReduce framework —
/root/reference/README.md — with no sketch/graph/funnel surface);
these extend SURVEY §2.3/§2.4's mandated engine families. Every
query is bit-exactly oracled: integer/count algebra plus
left-associated IEEE double steps that DuckDB replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from corral_spark.functions.text import tokenize
from corral_spark.operators.graph import bfs_hops
from corral_spark.operators.layout import zorder_key, zorder_key_sql
from corral_spark.operators.quality import mad_outlier_report
from corral_spark.operators.sketches import (
    histogram_quantiles,
    histogram_sketch,
    hll_registers,
    hll_set_algebra,
)
from corral_spark.queries.registry import register
from corral_spark.sources.tables import load_table

#: Shared histogram contract for price_histogram_quantiles: range
#: covers lineitem.l_extendedprice at every SF (901.82 .. 104949.5);
#: 256 bins -> ~407 currency units of declared quantile error.
_H_LO, _H_HI, _H_BINS = 900.0, 105000.0, 256


@register(
    "price_histogram_quantiles",
    oracle=f"""
    WITH b AS (
      SELECT l_returnflag AS flag,
             CAST(LEAST(GREATEST(FLOOR(
               (l_extendedprice - {_H_LO}) * {float(_H_BINS)}
                 / {_H_HI - _H_LO}), 0), {_H_BINS - 1}) AS INT) AS bin
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    h AS (SELECT flag, bin, COUNT(*) AS cnt FROM b GROUP BY flag, bin),
    c AS (
      SELECT flag, bin,
             SUM(cnt) OVER (PARTITION BY flag ORDER BY bin) AS cum,
             SUM(cnt) OVER (PARTITION BY flag) AS n
      FROM h
    )
    SELECT flag AS l_returnflag,
           ROUND({_H_LO} + (MIN(CASE WHEN cum >= CEIL(0.50 * n) THEN bin END) + 1)
                 * {_H_HI - _H_LO} / {float(_H_BINS)}, 4) AS q50,
           ROUND({_H_LO} + (MIN(CASE WHEN cum >= CEIL(0.90 * n) THEN bin END) + 1)
                 * {_H_HI - _H_LO} / {float(_H_BINS)}, 4) AS q90,
           ROUND({_H_LO} + (MIN(CASE WHEN cum >= CEIL(0.99 * n) THEN bin END) + 1)
                 * {_H_HI - _H_LO} / {float(_H_BINS)}, 4) AS q99
    FROM c GROUP BY flag ORDER BY l_returnflag
    """,
    tags=("sketch", "approx", "extension"),
)
def price_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of l_extendedprice per return flag read from a
    256-bin mergeable equi-width histogram (sketches.histogram_sketch
    + histogram_quantiles): ONE partial-aggregated pass whose shuffle
    is O(nbins) per group regardless of input size, then a cumulative
    walk over <= 256 rows per group — the declared-precision (one bin
    width) substitute for an exact percentile's full sort, and the
    form that survives a 100 TB scan (histograms merge by summing
    counts, pytest-pinned). The oracle rebuilds bins, cumulative
    counts, and bin-edge quantiles bit-exactly (left-associated IEEE
    double bin rule, integer counts)."""
    li = load_table(spark, sf_dir, "lineitem")
    hist = histogram_sketch(
        li, "l_extendedprice", _H_LO, _H_HI, _H_BINS, ("l_returnflag",)
    )
    return histogram_quantiles(
        hist, _H_LO, _H_HI, _H_BINS, (0.5, 0.9, 0.99), ("l_returnflag",)
    ).orderBy("l_returnflag")


@register(
    "price_outliers_mad",
    oracle="""
    WITH base AS (
      SELECT l_returnflag AS flag,
             CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS c
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    med AS (
      SELECT flag, quantile_cont(c, 0.5) AS med_cents FROM base GROUP BY flag
    ),
    dev AS (
      SELECT b.flag, ABS(b.c - m.med_cents) AS d, m.med_cents
      FROM base b JOIN med m ON b.flag = m.flag
    ),
    mad AS (
      SELECT flag, quantile_cont(d, 0.5) AS mad_cents FROM dev GROUP BY flag
    )
    SELECT d.flag AS l_returnflag,
           MIN(d.med_cents) AS med_cents,
           MIN(a.mad_cents) AS mad_cents,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN d.d > 4.4478 * a.mad_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS outliers,
           ROUND(CAST(SUM(CASE WHEN d.d > 4.4478 * a.mad_cents
                              THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 4) AS outlier_share
    FROM dev d JOIN mad a ON d.flag = a.flag
    GROUP BY d.flag ORDER BY l_returnflag
    """,
    tags=("quality", "extension"),
)
def price_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier report per return flag
    (quality.mad_outlier_report): median and MAD of l_extendedprice in
    integer cents, plus how many rows sit beyond median +/- 3
    sigma-equivalents (4.4478 * MAD) — the screen whose cutoffs the
    outliers themselves cannot drag, unlike mean/stddev. Cents
    scaling makes every interpolated median an exact multiple of 0.5
    in IEEE double, so the DuckDB oracle replays the whole report
    bit-exactly."""
    li = load_table(spark, sf_dir, "lineitem")
    return mad_outlier_report(
        li, "l_extendedprice", ("l_returnflag",)
    ).orderBy("l_returnflag")


# The HLL register replay shared with hll_distinct_parts
# (extensions5.py): md5 'hll:' prefix, 16-bit bucket prefix mod 1024,
# 12-hex-digit leading-zero rank, alpha_m * m^2 = 4.253321908301858e+20.
_HLL_REGS_SQL = """
      SELECT bucket, MAX(rho) AS rho FROM (
        SELECT CAST(('0x' || substr(h, 1, 4)) AS BIGINT) % 1024 AS bucket,
               CASE WHEN length(s) = 0 THEN 49
                    ELSE (12 - length(s)) * 4
                         + CASE WHEN CAST(('0x' || substr(s, 1, 1)) AS BIGINT) >= 8 THEN 0
                                WHEN CAST(('0x' || substr(s, 1, 1)) AS BIGINT) >= 4 THEN 1
                                WHEN CAST(('0x' || substr(s, 1, 1)) AS BIGINT) >= 2 THEN 2
                                ELSE 3 END + 1
               END AS rho
        FROM (
          SELECT h, regexp_replace(substr(h, 5, 12), '^0*', '') AS s
          FROM (SELECT md5('hll:' || tok) AS h FROM {src})
        )
      ) GROUP BY bucket
"""

_HLL_EST_SQL = """
      SELECT CAST(FLOOR(4.253321908301858e+20 / CAST(
               CAST(SUM(CAST(POWER(2, 49 - rho) AS BIGINT)) AS BIGINT)
               + (1024 - COUNT(*)) * 562949953421312 AS DOUBLE)) AS BIGINT) AS est
      FROM {regs}
"""


@register(
    "hll_token_overlap_sources",
    oracle=f"""
    WITH toks AS (
      SELECT source,
             unnest(string_split_regex(trim(lower(
               regexp_replace(text, '[^a-zA-Z0-9\\s]+', ' ', 'g'))), '\\s+')) AS tok
      FROM documents
    ),
    ta AS (SELECT tok FROM toks WHERE source = 'src0' AND tok <> ''),
    tb AS (SELECT tok FROM toks WHERE source IS DISTINCT FROM 'src0' AND tok <> ''),
    ra AS ({_HLL_REGS_SQL.format(src="ta")}),
    rb AS ({_HLL_REGS_SQL.format(src="tb")}),
    ru AS (
      SELECT bucket, MAX(rho) AS rho
      FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb)
      GROUP BY bucket
    ),
    ea AS ({_HLL_EST_SQL.format(regs="ra")}),
    eb AS ({_HLL_EST_SQL.format(regs="rb")}),
    eu AS ({_HLL_EST_SQL.format(regs="ru")})
    SELECT ea.est AS est_a, eb.est AS est_b, eu.est AS est_union,
           GREATEST(CAST(0 AS BIGINT), ea.est + eb.est - eu.est) AS est_intersect,
           ROUND(CAST(GREATEST(CAST(0 AS BIGINT), ea.est + eb.est - eu.est) AS DOUBLE)
                 / CAST(eu.est AS DOUBLE), 4) AS jaccard_est
    FROM ea CROSS JOIN eb CROSS JOIN eu
    """,
    tags=("sketch", "approx", "extension"),
)
def hll_token_overlap_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-token overlap between the src0 corpus and the rest
    (sketches.hll_set_algebra): each side keeps an O(m)=1024-row HLL
    register file; the union sketch is their lossless max-merge; the
    intersection estimate is inclusion-exclusion over the three raw
    estimates — answering "how much vocabulary do two corpora share?"
    at 100 TB from two sketches, with no token join and no rescan.
    Every column (including the floor'd raw estimates) is bit-exactly
    oracled via the md5 register replay shared with
    hll_distinct_parts."""
    from corral_spark.materialize import materialize

    docs = load_table(spark, sf_dir, "documents")
    # ONE scan builds both sides' registers (grouped by a side flag —
    # the single-scan discipline hll_merged_slices settled on), then
    # the 2*1024-row register file is materialized once: the three
    # estimate readouts (A, B, union) each consume it, and without the
    # barrier each would re-run the token explode over the corpus.
    toks = docs.select(
        F.when(F.col("source") == "src0", "a").otherwise("b").alias("side"),
        F.explode(tokenize(F.col("text"))).alias("tok"),
    )
    regs = materialize(hll_registers(toks, "tok", ("side",)), eager=True)
    ra = regs.filter(F.col("side") == "a").drop("side")
    rb = regs.filter(F.col("side") == "b").drop("side")
    return hll_set_algebra(ra, rb)


@register(
    "part_bfs_hops",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM lineitem a
      JOIN lineitem b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    sym AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
    seeds AS (
      SELECT DISTINCT l_partkey AS node FROM lineitem
      WHERE l_partkey % 97 = 0
    ),
    walk(node, hops) AS (
      SELECT node, 0 FROM seeds
      UNION
      SELECT s.v, w.hops + 1
      FROM walk w JOIN sym s ON s.u = w.node
      WHERE w.hops < 3
    )
    SELECT node, CAST(MIN(hops) AS INT) AS hops
    FROM walk GROUP BY node ORDER BY node
    """,
    tags=("graph", "extension"),
)
def part_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum co-order hop distance (graph.bfs_hops, <= 3 hops) from
    the seed parts (partkey % 97 == 0) over the "appeared in the same
    order" part graph — the seeded Pregel-shape traversal
    (contamination blast radius, related-item expansion) that
    complements connected_components. Each iteration joins only the
    newest frontier against the edge list and exits early when a
    frontier is empty; integer hop labels over deterministic joins,
    replayed exactly by the oracle's depth-bounded recursive CTE."""
    li = load_table(spark, sf_dir, "lineitem")
    a, b = li.alias("a"), li.alias("b")
    edges = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )
    seeds = (
        li.filter(F.col("l_partkey") % 97 == 0)
        .select(F.col("l_partkey").alias("node"))
        .distinct()
    )
    out = bfs_hops(edges, seeds, max_hops=3)
    return out.select(
        "node", F.col("hops").cast("int").alias("hops")
    ).orderBy("node")


@register(
    "event_funnel_stages",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2
      GROUP BY e.user_id
    )
    SELECT 1 AS stage, 'view' AS step, COUNT(*) AS users FROM v
    UNION ALL
    SELECT 2 AS stage, 'click_after_view' AS step, COUNT(*) AS users FROM c
    UNION ALL
    SELECT 3 AS stage, 'purchase_after_click' AS step, COUNT(*) AS users FROM p
    ORDER BY stage
    """,
    tags=("events", "extension"),
)
def event_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel over the event stream: users who
    viewed, then clicked strictly after their first view, then
    purchased strictly after that first qualifying click — the
    min-timestamp stage-chaining form (each stage is one equi-join on
    user_id + partial-aggregated MIN, so the plan is three bounded
    shuffles on the same key, no window over the full stream). The
    micros-truncated timestamps compare identically in both engines,
    so stage populations are exact."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    stage = [
        v.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(1).alias("stage"), F.lit("view").alias("step"), "users"
        ),
        c.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(2).alias("stage"),
            F.lit("click_after_view").alias("step"),
            "users",
        ),
        p.agg(F.count(F.lit(1)).alias("users")).select(
            F.lit(3).alias("stage"),
            F.lit("purchase_after_click").alias("step"),
            "users",
        ),
    ]
    return stage[0].unionByName(stage[1]).unionByName(stage[2]).orderBy(
        "stage"
    )


@register(
    "user_value_ewma",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vs,
             COUNT(*) AS n
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
      GROUP BY user_id
    )
    SELECT user_id, n,
           list_reduce(vs, (acc, x) ->
                 CAST(0.2 AS DOUBLE) * x + CAST(0.8 AS DOUBLE) * acc)
           AS ewma
    FROM seq ORDER BY user_id
    """,
    tags=("timeseries", "extension"),
)
def user_value_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terminal EWMA (alpha=0.2) of each user's event values in
    (ts, event_id) order (timeseries.ewma_by_key): the sequential
    recurrence ewma_t = 0.2*x_t + 0.8*ewma_{t-1} folded JVM-side over
    one sort_array(collect_list(...)) per user — state bounded by
    events-per-user (~10 here; the docstring's per-key bound). Every
    fold step is the same (alpha*x) + ((1-alpha)*acc) IEEE
    association DuckDB's list_reduce computes, so the terminal value
    matches bit-exactly — and SHIPS UNROUNDED (r16): the former
    ROUND(ewma, 6) was pure display sugar, and rounding an identical
    double is itself a divergence source once |ewma| is large enough
    that 6 dp exceeds the double's ULP (Spark BigDecimal HALF_UP vs
    DuckDB's multiply-round path disagreed on 7 extreme-twin values
    at |x|~1e13 while the RAW terminals were bit-identical on every
    key — the standing float rule's exact failure mode, SCALE.md
    round-16)."""
    from corral_spark.operators.timeseries import ewma_by_key

    # ts IS NOT NULL: an EWMA step needs a position in the sequence —
    # the event-time convention (r13 NULL-campaign class 2; without it
    # DuckDB's list(... ORDER BY ts) and Spark's sort_array disagree
    # on where a NULL-ts value folds in).
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    out = ewma_by_key(ev, ("user_id",), ("ts", "event_id"), "value", 0.2)
    return out.select("user_id", "n", "ewma").orderBy("user_id")


#: 10-bit Morton key over (l_partkey % 1024, l_suppkey % 1024);
#: tile = z >> 12 fixes bits 12..19 = the HIGH 4 bits of both
#: dimensions, so every tile is a 64 x 64 hyper-rectangle.
_Z_BITS, _Z_TILE_SHIFT = 10, 12


@register(
    "zorder_parts_locality",
    oracle=f"""
    WITH pts AS (
      SELECT l_partkey % 1024 AS px, l_suppkey % 1024 AS py
      FROM lineitem
    ),
    keyed AS (
      SELECT px, py,
             ({zorder_key_sql("px", "py", _Z_BITS)}) >> {_Z_TILE_SHIFT} AS tile
      FROM pts
    )
    SELECT tile, COUNT(*) AS n,
           MIN(px) AS px_min, MAX(px) AS px_max,
           MIN(py) AS py_min, MAX(py) AS py_max
    FROM keyed GROUP BY tile ORDER BY tile
    """,
    tags=("layout", "extension"),
)
def zorder_parts_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (partkey, suppkey)
    (operators.layout.zorder_key): per 64x64 tile of the interleaved
    key space, the row count and the spanned range of BOTH dimensions
    — the zonemap a parquet file inherits when the table is written
    sorted by this key. Every tile bounds px AND py to 64 values
    (pytest-pinned on a dense grid), so range predicates on EITHER
    column prune files; a single-column sort bounds only its own
    column. Pure shift/mask integer arithmetic, bit-for-bit replayed
    by the oracle via the same generated expression
    (layout.zorder_key_sql)."""
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        (F.col("l_partkey") % 1024).alias("px"),
        (F.col("l_suppkey") % 1024).alias("py"),
    )
    keyed = pts.select(
        "px",
        "py",
        F.shiftright(
            zorder_key(F.col("px"), F.col("py"), _Z_BITS), _Z_TILE_SHIFT
        ).alias("tile"),
    )
    return (
        keyed.groupBy("tile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("px").alias("px_min"),
            F.max("px").alias("px_max"),
            F.min("py").alias("py_min"),
            F.max("py").alias("py_max"),
        )
        .orderBy("tile")
    )


@register(
    "cdc_chunk_dedup_docs",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             list_filter(string_split(text, ' '), w -> w <> '') AS ws
      FROM documents
    ),
    sized AS (SELECT doc_id, ws, len(ws) AS n FROM base),
    b AS (
      SELECT doc_id, ws, n,
             CASE WHEN n >= 4 THEN
               list_filter(range(0, n - 4 + 1),
                 j -> CAST(('0x' || substr(md5(
                        array_to_string(ws[j+1:j+4], ' ')), 1, 8))
                      AS BIGINT) % 16 = 0)
             ELSE CAST([] AS BIGINT[]) END AS bpos
      FROM sized
    ),
    chunks AS (
      SELECT doc_id,
             unnest(list_filter(
               list_transform(range(0, len(bpos) + 1),
                 c -> array_to_string(
                        ws[(CASE WHEN c = 0 THEN 0
                                 ELSE bpos[c] + 4 END) + 1 :
                           (CASE WHEN c = len(bpos) THEN n
                                 ELSE bpos[c+1] + 4 END)],
                        ' ')),
               t -> t <> '')) AS chunk_text
      FROM b
    ),
    hashed AS (SELECT doc_id, md5(chunk_text) AS h FROM chunks),
    nd AS (SELECT h, COUNT(DISTINCT doc_id) AS ndocs FROM hashed GROUP BY h)
    SELECT hashed.doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN nd.ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS shared_chunks
    FROM hashed JOIN nd ON hashed.h = nd.h
    GROUP BY hashed.doc_id ORDER BY doc_id
    """,
    tags=("dedup", "chunking", "extension"),
)
def cdc_chunk_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-duplicate detection via content-defined chunking
    (chunking.content_defined_chunks, k=4 window, divisor=16): every
    document is cut where the local 4-word window hash lands on
    0 mod 16, chunks are hashed exactly, and each doc reports how
    many of its chunks also appear in at least one OTHER document —
    the chunk-granular dedup signal that catches shared boilerplate
    tails and quoted passages that document-level MinHash scores too
    low and fixed-width chunking loses to offset shift. Chunking is
    one scan-side projection (no shuffle); the dedup join shuffles
    only (hash, doc) pairs. The md5 cut rule and chunk slices are
    bit-replayed by the oracle."""
    from corral_spark.operators.chunking import content_defined_chunks

    docs = load_table(spark, sf_dir, "documents")
    ch = content_defined_chunks(docs, "text", "doc_id")
    nd = ch.groupBy("chunk_hash").agg(
        F.countDistinct("doc_id").alias("ndocs")
    )
    return (
        # nd is one row per DISTINCT CHUNK — corpus-scaled —
        # shuffle_hash per the corpus-scaled join rule (r16 audit).
        ch.join(nd.hint("shuffle_hash"), "chunk_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("ndocs") >= 2).cast("int")).alias("shared_chunks"),
        )
        .orderBy("doc_id")
    )


@register(
    "pq_ann_topk",
    oracle="""
    WITH v AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ve FROM embeddings
      WHERE embedding IS NOT NULL AND len(embedding) = 64 AND len(list_filter(embedding, x -> x IS NULL)) = 0 AND list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum') > 0
    ),
    cbv AS (
      SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, ve
      FROM (SELECT vec_id, ve FROM v ORDER BY vec_id LIMIT 16)
    ),
    cb AS (
      SELECT t.m, cbv.code, cbv.ve[t.m*16+1 : t.m*16+16] AS sv
      FROM cbv, (SELECT unnest(range(0, 4)) AS m) t
    ),
    sub AS (
      SELECT v.vec_id, t.m, v.ve[t.m*16+1 : t.m*16+16] AS xv
      FROM v, (SELECT unnest(range(0, 4)) AS m) t
    ),
    enc AS (
      SELECT vec_id, m, code FROM (
        SELECT s.vec_id, s.m, cb.code,
               ROW_NUMBER() OVER (
                 PARTITION BY s.vec_id, s.m
                 ORDER BY round(list_inner_product(s.xv, cb.sv), 6) DESC,
                          cb.code) AS rn
        FROM sub s JOIN cb ON cb.m = s.m
      ) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS query_id, ve FROM v WHERE vec_id < 5),
    lut AS (
      SELECT q.query_id, cb.m, cb.code,
             CAST(round(list_inner_product(
               q.ve[cb.m*16+1 : cb.m*16+16], cb.sv) * 1e6, 0) AS BIGINT) AS t
      FROM q CROSS JOIN cb
    ),
    scored AS (
      SELECT l.query_id, e.vec_id,
             CAST(SUM(l.t) AS BIGINT) AS score_micro
      FROM enc e JOIN lut l ON l.m = e.m AND l.code = e.code
      GROUP BY 1, 2
    )
    SELECT query_id, vec_id, score_micro, rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY score_micro DESC, vec_id) AS rnk
      FROM scored WHERE vec_id <> query_id
    )
    WHERE rnk <= 10
    ORDER BY query_id, rnk
    """,
    tags=("similarity", "approx", "extension"),
)
def pq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ADC top-10 for 5 query vectors
    (similarity.pq_topk, 4 subspaces x 16 codes over 64 dims): the
    corpus is encoded once into 4 small integer codes per vector (32x
    smaller than float32), each query broadcasts a 64-entry lookup
    table of subspace dot products in integer micro-units, and
    candidates score by an exact BIGINT sum over a code equi-join —
    the compression step that makes billion-vector search scan bytes
    instead of floats. Codebooks, assignments (6dp-rounded argmax,
    ties to lowest code), LUTs, and integer score sums are all
    bit-replayed by the oracle."""
    from corral_spark.operators.similarity import pq_topk, valid_vecs

    emb = valid_vecs(load_table(spark, sf_dir, "embeddings"), dim=64)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return pq_topk(
        emb, queries, k=10, exclude_self=True
    ).orderBy("query_id", "rnk")


@register(
    "qty_discount_linreg",
    oracle="""
    WITH s AS (
      -- Moments surfaced as exact-sum -> DOUBLE (one rounding of the
      -- same exact integer on both engines: DuckDB sums BIGINT into
      -- HUGEINT, Spark into DECIMAL(38,0)); every downstream cross
      -- term then runs in identical IEEE double arithmetic. BIGINT
      -- outputs overflowed at extreme-but-in-domain 2^31-scale
      -- features (r14 extreme campaign).
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx,
             CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(y * y) AS DOUBLE) AS syy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy
      FROM (
        SELECT l_returnflag,
               CAST(ROUND(l_quantity, 0) AS BIGINT) AS x,
               CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS y
        FROM lineitem
      )
      -- regression domain (r14 extreme campaign): a row enters the
      -- moments only with BOTH features present and |x|,|y| < 2^31,
      -- so every product fits BIGINT exactly on both engines
      WHERE x IS NOT NULL AND y IS NOT NULL
        AND ABS(x) < 2147483648 AND ABS(y) < 2147483648
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, n, sx, sy, sxx, syy, sxy,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS slope,
           ROUND((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                        / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
                 / CAST(n AS DOUBLE), 6) AS intercept,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / SQRT((CAST(n AS DOUBLE) * sxx - sx * sx)
                        * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS corr
    FROM s ORDER BY l_returnflag
    """,
    tags=("stats", "extension"),
)
def qty_discount_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed OLS + Pearson correlation of (quantity, discount)
    per return flag from MERGEABLE exact sufficient statistics: one
    partial-aggregated pass collects six integers per group (n, Sx,
    Sy, Sxx, Syy, Sxy — integer units make every sum exact and
    order-independent, unlike a raw double corr()/covar_samp() whose
    accumulation order varies run to run), then slope, intercept, and
    corr are a handful of identical IEEE operations both engines
    replay. The stats merge by addition, so a 100 TB regression is
    per-partition sums + one combine — the same composability
    contract as the histogram and HLL sketches. Domain + overflow
    contract (r14): rows enter the moments only with both features
    present and |x|,|y| < 2^31 (so each product fits BIGINT
    exactly); the sums themselves accumulate in DECIMAL(38,0)/
    HUGEINT and surface as DOUBLE — exact to 2^53, one identical
    rounding beyond it on both engines — so no row count or feature
    magnitude inside the domain can overflow the statistics."""
    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        F.round(F.col("l_quantity"), 0).cast("long").alias("x"),
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("y"),
    ).filter(
        # The declared regression domain (r14 extreme campaign): both
        # features present, |x|,|y| < 2^31 so x*x/x*y/y*y fit BIGINT
        # exactly — an out-of-domain corrupt row must not overflow
        # the moments (ANSI raise) or silently wrap (legacy).
        F.col("x").isNotNull()
        & F.col("y").isNotNull()
        & (F.abs("x") < F.lit(2_147_483_648))
        & (F.abs("y") < F.lit(2_147_483_648))
    )
    # Moments accumulate in DECIMAL(38,0) (each product fits BIGINT by
    # the domain filter; the SUM of products does not at extreme-but-
    # in-domain 2^31-scale features — r14 extreme campaign) and
    # surface as DOUBLE: one rounding of the same exact integer on
    # both engines (DuckDB sums BIGINT into HUGEINT). All cross terms
    # below are then identical IEEE double expressions both engines
    # replay bit-for-bit.
    def _dsum(expr):
        return F.sum(expr.cast("decimal(38,0)")).cast("double")

    s = base.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum(F.col("x")).alias("sx"),
        _dsum(F.col("y")).alias("sy"),
        _dsum(F.col("x") * F.col("x")).alias("sxx"),
        _dsum(F.col("y") * F.col("y")).alias("syy"),
        _dsum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = nd * F.col("syy") - F.col("sy") * F.col("sy")
    slope = num / denx
    return s.select(
        "l_returnflag",
        "n",
        "sx",
        "sy",
        "sxx",
        "syy",
        "sxy",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / nd, 6).alias(
            "intercept"
        ),
        F.round(num / F.sqrt(denx * deny), 6).alias("corr"),
    ).orderBy("l_returnflag")


@register(
    "purchase_by_tier_scd2",
    oracle="""
    WITH sign AS (
      SELECT user_id, ts, event_id,
             CAST(FLOOR(value) AS BIGINT) % 3 AS tier
      FROM events WHERE event_type = 'signup' AND ts IS NOT NULL
    ),
    marked AS (
      SELECT *, (ROW_NUMBER() OVER w = 1
                 OR tier IS DISTINCT FROM LAG(tier) OVER w) AS keep
      FROM sign WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    dim AS (
      SELECT user_id, tier, ts AS valid_from, LEAD(ts) OVER w2 AS valid_to
      FROM (SELECT * FROM marked WHERE keep)
      WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    purch AS (
      SELECT user_id, ts, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    j AS (
      SELECT d.tier, p.cents
      FROM purch p LEFT JOIN dim d
        ON d.user_id = p.user_id AND d.valid_from <= p.ts
       AND (d.valid_to IS NULL OR p.ts < d.valid_to)
    )
    SELECT tier, COUNT(*) AS n_purchases,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM j GROUP BY tier ORDER BY tier NULLS FIRST
    """,
    tags=("temporal", "extension"),
)
def purchase_by_tier_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) time travel
    (timeseries.scd2_intervals + scd2_lookup): signup events define a
    user's tier history (consecutive same-tier events collapse away,
    so versions are STATE CHANGES); each purchase then joins to the
    tier version valid AT ITS OWN TIMESTAMP — the as-was reporting
    semantics a warehouse needs (purchases before any signup keep a
    NULL tier rather than vanishing). The lookup is an equi-join on
    user_id with the interval test residual, versions-per-user a
    small constant. Window replay + interval join make the oracle
    exact."""
    from corral_spark.operators.timeseries import (
        scd2_intervals,
        scd2_lookup,
    )

    # A signup without a timestamp cannot OPEN a version (the
    # event-time convention, r13 NULL campaign class 5): under
    # Spark's NULLS FIRST it would become a phantom first version
    # with NULL valid_from, under DuckDB's NULLS LAST a phantom open
    # one — both wrong, and differently. NULL-ts purchases need no
    # filter: the interval test is NULL for them on both engines, so
    # they surface in the NULL-tier bucket like pre-signup purchases.
    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(
        (F.col("event_type") == "signup") & F.col("ts").isNotNull()
    ).select(
        "user_id",
        "ts",
        "event_id",
        (F.floor(F.col("value")).cast("long") % 3).alias("tier"),
    )
    dim = scd2_intervals(
        signups, ("user_id",), "ts", ("tier",), order_cols=("event_id",)
    ).drop("is_current")
    purch = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    j = scd2_lookup(purch, dim, ("user_id",), "ts")
    return (
        j.groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy(F.col("tier").asc_nulls_first())
    )


@register(
    "ppjoin_neighbor_counts",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(
               regexp_replace(text, '[^a-zA-Z0-9\\s]+', ' ', 'g'))), '\\s+'),
               x -> x <> '') AS words
      FROM documents
    ),
    tok AS (
      SELECT doc_id, unnest(list_distinct(words)) AS token
      FROM w WHERE len(words) > 0
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM tok a JOIN tok b ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b,
             ROUND(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) AS j
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.9
    ),
    sym AS (
      SELECT id_a AS doc_id, j FROM pairs
      UNION ALL
      SELECT id_b AS doc_id, j FROM pairs
    )
    SELECT doc_id, COUNT(*) AS n_neighbors, MAX(j) AS max_jaccard
    FROM sym GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("dedup", "similarity", "extension"),
)
def ppjoin_neighbor_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document count of EXACT word-set Jaccard >= 0.9 neighbors
    (dedup.prefix_filter_jaccard_pairs): PPJoin-style prefix
    filtering under a rarest-first global token order indexes only
    each doc's ~(1-t) rarest tokens, so stopwords — the tokens that
    make a naive token index quadratic under Zipf — fall OUTSIDE
    nearly every prefix. The oracle computes the TRUE all-pairs
    word-set Jaccard, so a hash match re-proves prefix-filter
    completeness (no qualifying pair escapes the candidate set) on
    this data. Reported as a per-doc AGGREGATE (neighbor count + max
    similarity) because word SETS of a templated corpus are
    near-degenerate — a large fraction of raw pairs qualifies, which
    is exactly why the engine's production dedup operators key on
    shingles; this row exists to certify the prefix-filter algorithm
    itself."""
    from corral_spark.materialize import materialize
    from corral_spark.operators.dedup import prefix_filter_jaccard_pairs

    docs = load_table(spark, sf_dir, "documents")
    # Materialize barrier: the symmetric union below consumes `pairs`
    # TWICE — without the barrier the whole candidate+verify pipeline
    # executes twice (measured: the query cost literally doubled at
    # sf0.1 before this line).
    pairs = materialize(
        prefix_filter_jaccard_pairs(docs, "text", "doc_id", 0.9),
        eager=True,
    )
    sym = pairs.select(
        F.col("id_a").alias("doc_id"), F.col("jaccard").alias("j")
    ).unionAll(
        pairs.select(F.col("id_b").alias("doc_id"), F.col("jaccard").alias("j"))
    )
    return (
        sym.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_neighbors"),
            F.max("j").alias("max_jaccard"),
        )
        .orderBy("doc_id")
    )


@register(
    "part_pairs_lift",
    oracle="""
    WITH pp AS (
      SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
    ),
    n AS (SELECT COUNT(DISTINCT b) AS n_baskets FROM pp),
    items AS (SELECT i, COUNT(*) AS c FROM pp GROUP BY i),
    pairs AS (
      SELECT a.i AS item_a, bb.i AS item_b, COUNT(*) AS c_ab
      FROM pp a JOIN pp bb ON a.b = bb.b AND a.i < bb.i
      GROUP BY 1, 2
      HAVING COUNT(*) >= 2
    )
    SELECT item_a, item_b, ca.c AS c_a, cb.c AS c_b, c_ab,
           ROUND(CAST(c_ab AS DOUBLE) / ca.c, 6) AS conf_a_b,
           ROUND(CAST(c_ab AS DOUBLE) / cb.c, 6) AS conf_b_a,
           ROUND(CAST(c_ab * n.n_baskets AS DOUBLE)
                 / CAST(ca.c * cb.c AS DOUBLE), 6) AS lift
    FROM pairs
    JOIN items ca ON ca.i = item_a
    JOIN items cb ON cb.i = item_b
    CROSS JOIN n
    ORDER BY item_a, item_b
    """,
    tags=("basket", "extension"),
)
def part_pairs_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order lines
    (basket.association_rules): every part pair co-ordered in >= 2
    orders with exact support counts, directed confidences, and lift
    vs independence — the affinity-analysis family. The pair
    generator's blow-up is bounded by items-per-order (single
    digits), never catalog size; the one global scalar rides a
    one-row broadcast (the tfidf-pinned pattern). Integer counts +
    single rounded divisions replay bit-exactly in the oracle."""
    from corral_spark.operators.basket import association_rules

    li = load_table(spark, sf_dir, "lineitem")
    return association_rules(
        li, "l_orderkey", "l_partkey", min_cooccur=2
    ).orderBy("item_a", "item_b")


@register(
    "strong_coorder_triangles",
    oracle="""
    WITH pp AS (
      SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem
    ),
    e AS (
      SELECT a.i AS u, bb.i AS v
      FROM pp a JOIN pp bb ON a.b = bb.b AND a.i < bb.i
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM e e1
      JOIN e e2 ON e2.u = e1.v
      JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT node, COUNT(*) AS n_triangles
    FROM (SELECT unnest([a, b, c]) AS node FROM tri)
    GROUP BY node ORDER BY node
    """,
    tags=("graph", "extension"),
)
def strong_coorder_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle participation counts (graph.triangle_counts) over the
    STRONG co-order part graph (pairs co-ordered >= 2 times): how
    tightly each part's affinity neighborhood closes on itself — the
    cohesion signal that complements components (connectivity) and
    BFS (reach). The operator runs the degree-ordered orientation
    (wedges only at each triangle's smallest-degree vertex, O(m^1.5)
    bound, hub-skew-proof); the oracle replays the orientation-
    independent result via the plain id-ordered triple join."""
    from corral_spark.operators.basket import cooccur_strong_pairs
    from corral_spark.operators.graph import triangle_counts

    li = load_table(spark, sf_dir, "lineitem")
    strong = cooccur_strong_pairs(
        li, "l_orderkey", "l_partkey", min_cooccur=2
    )
    return triangle_counts(strong).orderBy("node")
