"""Round-7 third-wave operators: histogram sketch, HLL set algebra,
multi-source BFS, MAD outlier report, event funnel.

The registry oracles prove cross-engine exactness (test_correctness);
these tests pin the ALGEBRAIC laws the oracles cannot see: histogram
mergeability and quantile error bounds, HLL intersection sanity
against true overlap, BFS distances on a hand-built graph with an
unreachable island, and the MAD screen flagging a planted spike while
a mean/stddev rule is dragged by it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from corral_spark.operators.graph import bfs_hops
from corral_spark.operators.quality import mad_outlier_report
from corral_spark.operators.sketches import (
    histogram_merge,
    histogram_quantiles,
    histogram_sketch,
    hll_registers,
    hll_set_algebra,
)

# ---------------------------------------------------------------- histogram


def test_histogram_merge_equals_whole(spark):
    """Sketch-of-union == merge-of-sketches, the composability that
    lets 100 TB be histogrammed per-partition and combined."""
    df = spark.range(1000).select(
        (F.col("id") % 7).alias("g"), (F.col("id") % 83).cast("double").alias("v")
    )
    a, b = df.filter(F.col("id") % 2 == 0), df.filter(F.col("id") % 2 == 1)
    whole = histogram_sketch(df, "v", 0.0, 100.0, 32, ("g",))
    merged = histogram_merge(
        histogram_sketch(a, "v", 0.0, 100.0, 32, ("g",)),
        histogram_sketch(b, "v", 0.0, 100.0, 32, ("g",)),
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )


def test_histogram_quantile_within_one_bin(spark):
    """The readout is >= the true quantile and < one bin width above
    it (the declared precision contract)."""
    n, nbins, lo, hi = 10_000, 64, 0.0, 1000.0
    df = spark.range(n).select((F.col("id") % 1000).cast("double").alias("v"))
    hist = histogram_sketch(df, "v", lo, hi, nbins)
    row = histogram_quantiles(hist, lo, hi, nbins, (0.5, 0.9)).collect()[0]
    width = (hi - lo) / nbins
    for q, got in ((0.5, row.q50), (0.9, row.q90)):
        true_q = q * 1000  # uniform 0..999
        assert true_q - 1 <= got <= true_q + width + 1


def test_histogram_clamps_out_of_range(spark):
    """Values outside [lo, hi) land in the edge bins — counted, never
    dropped (sum of counts == row count)."""
    df = spark.range(100).select(
        (F.col("id").cast("double") - 50.0).alias("v")  # -50..49
    )
    hist = histogram_sketch(df, "v", 0.0, 10.0, 4)
    rows = {r.bin: r.cnt for r in hist.collect()}
    assert sum(rows.values()) == 100
    assert rows[0] >= 50  # all negatives clamp into bin 0
    assert rows[3] >= 40  # all >= 10 clamp into the top bin


def test_histogram_rejects_bad_range():
    with pytest.raises(ValueError):
        histogram_sketch(None, "v", 5.0, 5.0, 4)
    with pytest.raises(ValueError):
        histogram_sketch(None, "v", 0.0, 1.0, 0)


# ---------------------------------------------------------------- hll algebra


def test_hll_set_algebra_tracks_true_overlap(spark):
    """Two overlapping integer sets: every estimate within the ~3.25%
    HLL band (m=1024) of truth, intersection within the looser
    inclusion-exclusion band, and the union estimate never exceeds
    est_a + est_b."""
    a = spark.range(0, 20_000).select(F.col("id").alias("k"))
    b = spark.range(10_000, 30_000).select(F.col("id").alias("k"))
    out = hll_set_algebra(
        hll_registers(a, "k"), hll_registers(b, "k")
    ).collect()[0]
    assert abs(out.est_a - 20_000) / 20_000 < 0.15
    assert abs(out.est_b - 20_000) / 20_000 < 0.15
    assert abs(out.est_union - 30_000) / 30_000 < 0.15
    assert abs(out.est_intersect - 10_000) / 10_000 < 0.5
    assert out.est_union <= out.est_a + out.est_b
    assert 0.0 <= out.jaccard_est <= 1.0


def test_hll_set_algebra_disjoint_never_negative(spark):
    """Disjoint sets: inclusion-exclusion can go negative on sketch
    noise; the operator clamps at 0."""
    a = spark.range(0, 5_000).select(F.col("id").alias("k"))
    b = spark.range(100_000, 105_000).select(F.col("id").alias("k"))
    out = hll_set_algebra(
        hll_registers(a, "k"), hll_registers(b, "k")
    ).collect()[0]
    assert out.est_intersect >= 0
    assert out.est_intersect < 1_000  # small vs the 5k sides


def test_hll_set_algebra_grouped(spark):
    """group_cols path: per-group joins line up and identical sides
    give est_intersect ~ est_union (Jaccard ~ 1)."""
    df = spark.range(4_000).select(
        (F.col("id") % 2).alias("g"), F.col("id").alias("k")
    )
    regs = hll_registers(df, "k", ("g",))
    out = {r.g: r for r in hll_set_algebra(regs, regs, ("g",)).collect()}
    assert set(out) == {0, 1}
    for r in out.values():
        assert r.est_a == r.est_b == r.est_union == r.est_intersect
        assert r.jaccard_est == 1.0


# ---------------------------------------------------------------- bfs


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_bfs_hand_graph(spark):
    """Path 1-2-3-4-5 seeded at 1, plus an island 10-11: exact hop
    labels, bounded depth, island absent."""
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)])
    seeds = spark.createDataFrame([(1,)], ["node"])
    got = {r.node: r.hops for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 is 4 hops: beyond bound
    assert 10 not in got and 11 not in got


def test_bfs_multi_seed_takes_min(spark):
    """Two seeds on one path: every node gets the distance to its
    NEAREST seed (multi-source min semantics)."""
    edges = _edges(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    seeds = spark.createDataFrame([(1,), (5,)], ["node"])
    got = {r.node: r.hops for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert got == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_bfs_early_exit_on_empty_frontier(spark):
    """A closed triangle exhausts in 1 hop; max_hops=10 must not pad
    distances or loop (revisits are anti-joined away)."""
    edges = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    seeds = spark.createDataFrame([(1,)], ["node"])
    got = {r.node: r.hops for r in bfs_hops(edges, seeds, max_hops=10).collect()}
    assert got == {1: 0, 2: 1, 3: 1}


# ---------------------------------------------------------------- mad


def test_mad_flags_planted_spike(spark):
    """99 values near 100 plus one 10000x spike: MAD flags exactly the
    spike; the mean/stddev z-score rule would be dragged by it (the
    spike inflates stddev so much its own z barely clears 3 on tiny n
    — the classic masking failure MAD exists to avoid)."""
    vals = [(float(100 + (i % 5)),) for i in range(99)] + [(1_000_000.0,)]
    df = spark.createDataFrame(vals, ["v"])
    row = mad_outlier_report(df, "v").collect()[0]
    assert row.n == 100
    assert row.outliers == 1
    assert row.med_cents == pytest.approx(10200, abs=100)


def test_mad_constant_column_no_outliers(spark):
    """MAD == 0 on a constant column: nothing exceeds a zero band
    (strict > keeps the report sane instead of flagging everything)."""
    df = spark.createDataFrame([(42.0,)] * 50, ["v"])
    row = mad_outlier_report(df, "v").collect()[0]
    assert row.mad_cents == 0.0 and row.outliers == 0


# ---------------------------------------------------------------- ewma


def test_ewma_matches_hand_fold(spark):
    """Terminal EWMA equals the hand-computed left fold, and order
    comes from the order columns, not input order."""
    from corral_spark.operators.timeseries import ewma_by_key

    rows = [(1, 3, 30.0), (1, 1, 10.0), (1, 2, 20.0), (2, 1, 5.0)]
    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = {
        r.k: r for r in ewma_by_key(df, ("k",), ("t",), "v", 0.5).collect()
    }
    # k=1 ordered values 10,20,30: ((10*0.5+... )) acc0=10 ->
    # 0.5*20+0.5*10=15 -> 0.5*30+0.5*15=22.5
    assert out[1].ewma == pytest.approx(22.5)
    assert out[1].n == 3
    assert out[2].ewma == pytest.approx(5.0)  # single element = itself


def test_ewma_alpha_one_is_last_value(spark):
    from corral_spark.operators.timeseries import ewma_by_key

    df = spark.createDataFrame(
        [(1, i, float(i * 7)) for i in range(10)], ["k", "t", "v"]
    )
    row = ewma_by_key(df, ("k",), ("t",), "v", 1.0).collect()[0]
    assert row.ewma == pytest.approx(63.0)


# ---------------------------------------------------------------- zorder


def test_zorder_tiles_bound_both_dimensions(spark):
    """Dense 256x256 grid, 8-bit Morton key, tiles of 2^8 cells: every
    tile is a 16x16 hyper-rectangle — BOTH dimensions bounded — while
    an x-sorted bucketing of the same cell count leaves y unbounded.
    This is the zonemap win: sorted by z, every file prunes on either
    column's predicate."""
    from corral_spark.operators.layout import zorder_key

    grid = (
        spark.range(256 * 256)
        .select(
            (F.col("id") % 256).alias("x"),
            (F.col("id") / 256).cast("long").alias("y"),
        )
    )
    keyed = grid.select(
        "x", "y", F.shiftright(zorder_key(F.col("x"), F.col("y"), 8), 8).alias("tile")
    )
    spans = keyed.groupBy("tile").agg(
        (F.max("x") - F.min("x")).alias("sx"),
        (F.max("y") - F.min("y")).alias("sy"),
        F.count(F.lit(1)).alias("n"),
    )
    mx = spans.agg(
        F.max("sx").alias("mx"), F.max("sy").alias("my"), F.sum("n").alias("n")
    ).collect()[0]
    assert mx.n == 256 * 256
    assert mx.mx == 15 and mx.my == 15
    # Row-major comparator at the same granularity (256 cells/bucket):
    # bucket = x — y spans the whole axis.
    rm = grid.groupBy("x").agg((F.max("y") - F.min("y")).alias("sy"))
    assert rm.agg(F.max("sy")).collect()[0][0] == 255


def test_zorder_sql_matches_column_expr(spark):
    """zorder_key_sql is the bit-for-bit SQL twin of zorder_key."""
    from corral_spark.operators.layout import zorder_key, zorder_key_sql

    df = spark.range(1000).select(
        (F.col("id") % 37).alias("a"), (F.col("id") % 53).alias("b")
    )
    got = df.select(
        zorder_key(F.col("a"), F.col("b"), 6).alias("z"),
        F.expr(zorder_key_sql("a", "b", 6)).alias("z_sql"),
    )
    assert got.filter(F.col("z") != F.col("z_sql")).count() == 0


def test_zorder_rejects_bad_bits():
    from corral_spark.operators.layout import zorder_key

    with pytest.raises(ValueError):
        zorder_key(F.lit(1), F.lit(2), 0)
    with pytest.raises(ValueError):
        zorder_key(F.lit(1), F.lit(2), 32)


# ----------------------------------------------------------- cdc chunking


def _cdc(spark, rows, **kw):
    from corral_spark.operators.chunking import content_defined_chunks

    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return content_defined_chunks(df, "text", "doc_id", **kw)


def test_cdc_chunks_reconstruct_document(spark):
    """Concatenating a doc's chunks in chunk_id order rebuilds the
    word sequence exactly — cuts partition, never drop or repeat."""
    text = " ".join(f"w{i * 7919 % 997}" for i in range(300))
    out = _cdc(spark, [(1, text)]).orderBy("chunk_id").collect()
    rebuilt = " ".join(r.chunk_text for r in out)
    assert rebuilt == text
    assert sum(r.n_words for r in out) == 300
    assert len(out) > 3  # divisor=16 on 300 words must cut somewhere


def test_cdc_shift_resilience_vs_fixed_width(spark):
    """Prepend 3 words: content-defined cuts re-align, so almost all
    original chunk hashes survive — while fixed-width (aligned)
    chunking loses every chunk to the offset shift. This is the
    operator's reason to exist."""
    words = [f"w{i * 7919 % 997}" for i in range(300)]
    orig = " ".join(words)
    edited = "zz1 zz2 zz3 " + orig
    rows = _cdc(spark, [(1, orig), (2, edited)]).collect()
    h1 = {r.chunk_hash for r in rows if r.doc_id == 1}
    h2 = {r.chunk_hash for r in rows if r.doc_id == 2}
    # Only the chunk(s) touching the edit can differ.
    assert len(h1 & h2) >= len(h1) - 2
    # Fixed-width comparator: 16-word aligned windows share nothing
    # after a 3-word shift (words are all distinct within a period).
    fixed1 = {" ".join(words[i : i + 16]) for i in range(0, 300, 16)}
    shifted = ["zz1", "zz2", "zz3"] + words
    fixed2 = {" ".join(shifted[i : i + 16]) for i in range(0, 303, 16)}
    assert not (fixed1 & fixed2)


def test_cdc_short_doc_single_chunk(spark):
    """A doc shorter than the hash window is one whole-doc chunk."""
    out = _cdc(spark, [(1, "just two")]).collect()
    assert len(out) == 1
    assert out[0].chunk_text == "just two" and out[0].chunk_id == 0


def test_cdc_expected_chunk_length_tracks_divisor(spark):
    """Mean chunk length ~ divisor words (loose 3x band) on varied
    content — the cut rule actually fires at ~1/divisor rate."""
    text = " ".join(f"t{i * 6007 % 1009}" for i in range(1000))
    out = _cdc(spark, [(1, text)], divisor=8).collect()
    mean = 1000 / len(out)
    assert 8 / 3 <= mean <= 8 * 3


def test_cdc_rejects_bad_args():
    from corral_spark.operators.chunking import content_defined_chunks

    with pytest.raises(ValueError):
        content_defined_chunks(None, "t", "i", window_k=0)
    with pytest.raises(ValueError):
        content_defined_chunks(None, "t", "i", divisor=0)


# ----------------------------------------------------------- pq


def test_pq_codebook_vectors_encode_to_own_code(spark):
    """A vector that IS codebook entry c must encode to [c,c,c,c] —
    the quantizer is exact on its own centers."""
    from corral_spark.operators.similarity import pq_codebooks, pq_encode

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb = pq_codebooks(emb)
    codes = {
        r.vec_id: r.codes
        for r in pq_encode(emb.filter(F.col("vec_id") < 16), cb).collect()
    }
    assert all(codes[i] == [i] * 4 for i in range(16))


def test_pq_recall_on_clustered_data(spark):
    """Planted structure: corpus = 16 prototypes (ids 0..15, which
    become the codebooks) plus noisy copies of each. A query at a
    prototype must retrieve that prototype's copies — PQ's scores
    collapse to the prototype dot products, so recall is 1.0 by
    construction on this data."""
    import random

    from corral_spark.operators.similarity import pq_topk

    rng = random.Random(7)
    protos = []
    for i in range(16):
        v = [0.0] * 64
        for d in range(64):
            v[d] = rng.uniform(-1, 1)
        protos.append(v)
    rows = [(i, protos[i]) for i in range(16)]
    nid = 16
    owner = {}
    for i in range(16):
        for _ in range(5):
            noisy = [x + rng.uniform(-1e-3, 1e-3) for x in protos[i]]
            rows.append((nid, noisy))
            owner[nid] = i
            nid += 1
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = spark.createDataFrame(
        [(i, protos[i]) for i in range(3)], ["query_id", "embedding"]
    )
    got = pq_topk(corpus, queries, k=5, exclude_self=True).collect()
    for r in got:
        # every hit is a copy of the query's prototype (or the
        # prototype itself was excluded as self; copies fill top-5)
        assert owner.get(r.vec_id, r.vec_id % 16) == r.query_id


def test_pq_codes_shape_and_range(spark):
    from corral_spark.operators.similarity import pq_codebooks, pq_encode

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    codes = pq_encode(emb, pq_codebooks(emb)).collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r.codes) == 4
        assert all(0 <= c < 16 for c in r.codes)


def test_pq_rejects_indivisible_dims():
    from corral_spark.operators.similarity import pq_codebooks

    with pytest.raises(ValueError):
        pq_codebooks(None, m_sub=5, dims=64)


# ----------------------------------------------------------- linreg


def test_linreg_matches_numpy_ols(spark):
    """The sufficient-statistics readout IS ordinary least squares:
    slope/intercept/corr agree with numpy on the real table."""
    import numpy as np

    from corral_spark.queries import REGISTRY

    rows = REGISTRY["qty_discount_linreg"].spark(
        spark, "/root/testdata/sf0.001"
    ).collect()
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    pdf = li.select("l_returnflag", "l_quantity", "l_discount").toPandas()
    for r in rows:
        g = pdf[pdf.l_returnflag == r.l_returnflag]
        x = np.round(g.l_quantity.to_numpy())
        y = np.round(g.l_discount.to_numpy() * 100)
        slope, intercept = np.polyfit(x, y, 1)
        assert r.slope == pytest.approx(slope, abs=1e-4)
        assert r.intercept == pytest.approx(intercept, abs=1e-4)
        assert r.corr == pytest.approx(np.corrcoef(x, y)[0, 1], abs=1e-4)


def test_bfs_matches_python_reference_on_random_graphs(spark):
    """Seeded random graphs: distributed BFS equals a plain Python
    BFS (hop-bounded, multi-source min) — the distributed iteration
    introduces no off-by-one or revisit artifacts."""
    import random
    from collections import deque

    def py_bfs(edges, seeds, max_hops):
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        dist = {s: 0 for s in seeds}
        q = deque(seeds)
        while q:
            u = q.popleft()
            if dist[u] >= max_hops:
                continue
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        return dist

    rng = random.Random(42)
    for trial in range(3):
        nodes = list(range(40))
        edges = sorted(
            {
                tuple(sorted(rng.sample(nodes, 2)))
                for _ in range(60 + 10 * trial)
            }
        )
        seeds = rng.sample(nodes, 3)
        expected = py_bfs(edges, seeds, 3)
        got = {
            r.node: r.hops
            for r in bfs_hops(
                _edges(spark, edges),
                spark.createDataFrame([(s,) for s in seeds], ["node"]),
                max_hops=3,
            ).collect()
        }
        assert got == expected, f"trial {trial}"


# ----------------------------------------------------------- scd2


def _scd2(spark, rows):
    from corral_spark.operators.timeseries import scd2_intervals

    df = spark.createDataFrame(rows, ["k", "t", "eid", "attr"])
    return scd2_intervals(
        df, ("k",), "t", ("attr",), order_cols=("eid",)
    ).collect()


def test_scd2_collapses_unchanged_and_builds_intervals(spark):
    """a,a,b,a: the repeated 'a' collapses; three versions with
    adjacent validity and an open current one."""
    rows = [(1, 10, 0, "a"), (1, 20, 1, "a"), (1, 30, 2, "b"), (1, 40, 3, "a")]
    got = sorted(_scd2(spark, rows), key=lambda r: r.valid_from)
    assert [(r.attr, r.valid_from, r.valid_to) for r in got] == [
        ("a", 10, 30),
        ("b", 30, 40),
        ("a", 40, None),
    ]
    assert [r.is_current for r in got] == [False, False, True]


def test_scd2_null_attr_transitions(spark):
    """NULL->NULL collapses (null-safe compare); NULL->x is a change."""
    rows = [(1, 10, 0, None), (1, 20, 1, None), (1, 30, 2, "x")]
    got = sorted(_scd2(spark, rows), key=lambda r: r.valid_from)
    assert [(r.attr, r.valid_from) for r in got] == [(None, 10), ("x", 30)]


def test_scd2_lookup_picks_version_at_fact_time(spark):
    """Facts land in the version open at their timestamp; facts
    before the first version keep NULL dimension columns."""
    from corral_spark.operators.timeseries import scd2_intervals, scd2_lookup

    dim_ev = spark.createDataFrame(
        [(1, 10, 0, "bronze"), (1, 30, 1, "gold")], ["k", "t", "eid", "attr"]
    )
    dim = scd2_intervals(dim_ev, ("k",), "t", ("attr",), order_cols=("eid",))
    facts = spark.createDataFrame(
        [(1, 5), (1, 10), (1, 29), (1, 30), (1, 99)], ["k", "ft"]
    )
    got = {
        r.ft: r.attr
        for r in scd2_lookup(facts, dim, ("k",), "ft").collect()
    }
    assert got == {5: None, 10: "bronze", 29: "bronze", 30: "gold", 99: "gold"}


# ----------------------------------------------------------- ppjoin


def test_ppjoin_equals_bruteforce_with_stopwords(spark):
    """Stopword-laden synthetic corpus: prefix filtering must return
    EXACTLY the brute-force qualifying pair set — completeness is the
    whole claim (stopwords sort last in the rarest-first order and
    fall outside prefixes, but no qualifying pair may be lost)."""
    import itertools

    from corral_spark.operators.dedup import prefix_filter_jaccard_pairs

    stop = "the a of and to in is it"
    docs = []
    for i in range(12):
        rare = " ".join(f"rare{i}x{j}" for j in range(4))
        shared = " ".join(f"shared{j}" for j in range(i % 3 * 2))
        docs.append((i, f"{stop} {rare} {shared}"))
    # Two near-identical docs that must qualify.
    docs.append((100, stop + " alpha beta gamma delta epsilon"))
    docs.append((101, stop + " alpha beta gamma delta zeta"))

    def toks(t):
        return set(t.split())

    want = set()
    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        a, b = toks(ta), toks(tb)
        j = len(a & b) / len(a | b)
        if j >= 0.5:
            want.add((min(ia, ib), max(ia, ib)))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r.id_a, r.id_b)
        for r in prefix_filter_jaccard_pairs(
            df, "text", "doc_id", 0.5
        ).collect()
    }
    assert got == want
    assert (100, 101) in got


def test_ppjoin_identical_docs_score_one(spark):
    from corral_spark.operators.dedup import prefix_filter_jaccard_pairs

    df = spark.createDataFrame(
        [(1, "x y z w"), (2, "w z y x"), (3, "unrelated words here")],
        ["doc_id", "text"],
    )
    rows = prefix_filter_jaccard_pairs(df, "text", "doc_id", 0.9).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in rows] == [(1, 2, 1.0)]


# ----------------------------------------------------------- basket


def test_association_rules_hand_counts(spark):
    """Hand-checkable baskets: counts, confidences, and lift match
    first-principles arithmetic; duplicate (basket, item) rows
    collapse before counting."""
    from corral_spark.operators.basket import association_rules

    rows = [
        (1, "x"), (1, "y"), (1, "x"),  # dup (1, x) must not double-count
        (2, "x"), (2, "y"),
        (3, "x"), (3, "z"),
        (4, "z"), (4, "y"),
    ]
    df = spark.createDataFrame(rows, ["b", "i"])
    out = {
        (r.item_a, r.item_b): r
        for r in association_rules(df, "b", "i", min_cooccur=2).collect()
    }
    assert set(out) == {("x", "y")}
    r = out[("x", "y")]
    # c_x=3, c_y=3, c_xy=2, n=4 -> conf 2/3 both ways, lift 8/9
    assert (r.c_a, r.c_b, r.c_ab) == (3, 3, 2)
    assert r.conf_a_b == pytest.approx(0.666667)
    assert r.lift == pytest.approx(round(2 * 4 / 9, 6))


def test_association_rules_lift_detects_affinity(spark):
    """Items always bought together get lift >> 1; independent items
    hover near 1."""
    from corral_spark.operators.basket import association_rules

    rows = []
    for b in range(40):
        rows.append((b, "bread"))
        if b % 2 == 0:
            rows.append((b, "butter"))  # always with bread
        rows.append((b, f"noise{b % 7}"))
    df = spark.createDataFrame(rows, ["b", "i"])
    out = {
        (r.item_a, r.item_b): r.lift
        for r in association_rules(df, "b", "i").collect()
    }
    assert out[("bread", "butter")] == pytest.approx(1.0)  # bread in all
    # butter vs a noise item: both present in subsets; affinity none.
    # The strong signal: butter implies bread with confidence 1.
    confs = {
        (r.item_a, r.item_b): r.conf_b_a
        for r in association_rules(df, "b", "i").collect()
    }
    assert confs[("bread", "butter")] == 1.0


def test_association_rules_mega_basket_raises(spark):
    """Scale guard (r7 verdict item 4): a planted degenerate basket
    wider than max_basket_width RAISES in-plan instead of running
    quadratic — the pair blow-up is sum_b k_b^2, so one giant basket
    (user-as-basket, crawl-session-as-basket) would dominate the job.
    Legitimate narrow baskets still compute under the same cap."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from corral_spark.operators.basket import association_rules

    rows = [(0, f"item{i}") for i in range(50)]  # mega-basket: width 50
    rows += [(1, "x"), (1, "y"), (2, "x"), (2, "y")]
    df = spark.createDataFrame(rows, ["b", "i"])
    with pytest.raises(SparkRuntimeException, match="max_basket_width"):
        association_rules(df, "b", "i", max_basket_width=10).collect()
    # Same data, cap above the widest basket: computes normally.
    ok = association_rules(df, "b", "i", max_basket_width=50).collect()
    assert {(r.item_a, r.item_b) for r in ok} >= {("x", "y")}


# ----------------------------------------------------------- triangles


def test_triangles_k4_and_path(spark):
    """K4: four triangles, every node in three. A path: none. Input
    orientation/duplicates must not matter."""
    from corral_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]  # both dirs
    got = {
        r.node: r.n_triangles
        for r in triangle_counts(_edges(spark, k4)).collect()
    }
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    path = [(1, 2), (2, 3), (3, 4)]
    assert triangle_counts(_edges(spark, path)).count() == 0


def test_triangles_match_bruteforce_random(spark):
    """Seeded random graph: degree-ordered counting equals the plain
    all-triples reference — orientation loses nothing."""
    import itertools
    import random

    rng = random.Random(11)
    edges = sorted(
        {tuple(sorted(rng.sample(range(30), 2))) for _ in range(90)}
    )
    eset = set(edges)
    want: dict[int, int] = {}
    for a, b, c in itertools.combinations(range(30), 3):
        if (a, b) in eset and (b, c) in eset and (a, c) in eset:
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1
    from corral_spark.operators.graph import triangle_counts

    got = {
        r.node: r.n_triangles
        for r in triangle_counts(_edges(spark, edges)).collect()
    }
    assert got == want


# ----------------------------------------------------------- ivm


def _recompute(spark, rows, keys=("g",)):
    df = spark.createDataFrame(rows, ["g", "x"])
    return {
        (r.g,): (r.n, r.x)
        for r in df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("x"))
        .collect()
    }


def test_apply_agg_delta_equals_recompute(spark):
    """Signed-delta maintenance == full recompute over base+delta,
    including a group that vanishes (all rows deleted) and a brand-new
    group arriving only in the delta."""
    from corral_spark.operators.merge import apply_agg_delta

    base = [(g, x) for g in range(4) for x in range(1, 6)]
    # Contract: the snapshot's maintained-sum column carries the SAME
    # name as the delta's value column.
    snapshot = spark.createDataFrame(base, ["g", "x"]).groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("x")
    )
    # Delete ALL of group 0, part of group 1, insert into group 2 and
    # a brand-new group 9.
    delta_rows = (
        [(0, x, -1) for x in range(1, 6)]
        + [(1, 2, -1), (1, 5, -1)]
        + [(2, 100, 1), (9, 7, 1), (9, 8, 1)]
    )
    delta = spark.createDataFrame(delta_rows, ["g", "x", "sign"])
    got = {
        (r.g,): (r.n, r.x)
        for r in apply_agg_delta(
            snapshot, delta, ["g"], ["x"]
        ).collect()
    }
    survivors = [
        (g, x) for g, x in base
        if g != 0 and not (g == 1 and x in (2, 5))
    ] + [(2, 100), (9, 7), (9, 8)]
    assert got == _recompute(spark, survivors)
    assert (0,) not in got  # fully-deleted group dropped


def test_apply_agg_delta_negative_count_raises(spark):
    """A delete the view never absorbed is divergence — loud failure,
    not a silent clamp."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from corral_spark.operators.merge import apply_agg_delta

    snapshot = spark.createDataFrame([(1, 1, 10)], ["g", "n", "x"])
    delta = spark.createDataFrame(
        [(1, 10, -1), (1, 11, -1)], ["g", "x", "sign"]
    )
    with pytest.raises(SparkRuntimeException, match="negative maintained"):
        apply_agg_delta(snapshot, delta, ["g"], ["x"]).collect()


def test_refresh_affected_groups_minmax_under_delete(spark):
    """MIN/MAX view after deleting a group's extremum: the additive
    fold cannot fix it; group-scoped recompute must — and groups the
    delta never touched must carry over from the snapshot verbatim
    (not be recomputed)."""
    from corral_spark.operators.merge import refresh_affected_groups

    def view(df):
        return df.groupBy("g").agg(
            F.min("x").alias("mn"), F.max("x").alias("mx")
        )

    base0 = spark.createDataFrame(
        [(1, 1), (1, 9), (2, 5), (2, 6), (3, 7)], ["g", "x"]
    )
    snapshot = view(base0)
    # Delete group 1's max and ALL of group 3.
    base1 = spark.createDataFrame([(1, 1), (2, 5), (2, 6)], ["g", "x"])
    touched = spark.createDataFrame([(1,), (3,)], ["g"])
    got = {
        r.g: (r.mn, r.mx)
        for r in refresh_affected_groups(
            snapshot, base1, touched, ["g"], view
        ).collect()
    }
    assert got == {1: (1, 1), 2: (5, 6)}  # 1 refreshed, 2 carried, 3 gone
    want = {r.g: (r.mn, r.mx) for r in view(base1).collect()}
    assert got == want


def test_ppjoin_large_identical_class_expands_completely(spark):
    """Degenerate exact-duplicate class (the 100 TB boilerplate
    shape): 60 docs with the SAME token set must expand to all
    C(60,2)=1770 within-group pairs at jaccard exactly 1.0 through
    the (id, gid) join path — plus the one cross-group near-pair,
    and no pair involving the unrelated doc."""
    from corral_spark.operators.dedup import prefix_filter_jaccard_pairs

    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(60)]
    rows.append((100, "alpha beta gamma delta epsilon eta"))  # J = 5/7
    rows.append((200, "completely different words here"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = prefix_filter_jaccard_pairs(df, "text", "doc_id", 0.7).collect()
    within = [(r.id_a, r.id_b) for r in got if r.jaccard == 1.0]
    cross = [(r.id_a, r.id_b, r.jaccard) for r in got if r.jaccard < 1.0]
    assert len(within) == 1770
    assert len(set(within)) == 1770
    assert all(0 <= a < b < 60 for a, b in within)
    # J(class, 100) = 5/7 ~= 0.714286 >= 0.7: one pair per member.
    assert len(cross) == 60
    assert all(b == 100 and abs(j - round(5 / 7, 6)) < 1e-12 for _, b, j in cross)


def test_ppjoin_randomized_bruteforce_equivalence(spark):
    """Randomized (fixed-seed) equivalence against brute force across
    corpus shapes: duplicate classes, near-misses, skewed token
    frequencies, and varied thresholds. Guards the r10 additions —
    the positional filter's rank bound and the set-grouping
    expansion — whose soundness arguments live in the docstring; a
    lost qualifying pair or a phantom pair here means one of those
    arguments broke."""
    import itertools
    import random

    from corral_spark.operators.dedup import prefix_filter_jaccard_pairs

    rng = random.Random(20260815)
    vocab = [f"w{i}" for i in range(30)]
    for trial, thr in ((0, 0.5), (1, 0.7), (2, 0.9)):
        docs = []
        for i in range(28):
            k = rng.randint(3, 12)
            docs.append((i, " ".join(rng.sample(vocab, k))))
        # planted duplicate class + near-miss
        docs.append((100, docs[0][1]))
        docs.append((101, docs[0][1]))
        docs.append((102, docs[1][1] + " extraword"))
        want = {}
        for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
            a, b = set(ta.split()), set(tb.split())
            j = len(a & b) / len(a | b)
            if j >= thr:
                want[(min(ia, ib), max(ia, ib))] = round(j, 6)
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in prefix_filter_jaccard_pairs(
                df, "text", "doc_id", thr
            ).collect()
        }
        assert got == want, f"trial {trial} thr {thr}"


def test_ppjoin_adversarial_sizes_and_thresholds(spark):
    """Guards the r11 additions — the asymmetric index prefix and the
    float-ceil completeness slack. Sizes are chosen so ceil((2t/(1+t))
    * n) lands ON an integer where double rounding overshoots
    (n = 133 at t = 0.9: float ceil reads 127, true 126 — one prefix
    token short without the slack), and thresholds include 18/19 and
    2/3 whose products hit exact integers at multiples of 19 and 3.
    One-off 120-trial fuzz vs brute force passed at r11 close; this
    is the compact permanent pin."""
    import itertools
    import random

    from corral_spark.operators.dedup import prefix_filter_jaccard_pairs

    rng = random.Random(133)
    for thr in (0.9, 18 / 19, 2 / 3):
        docs = []
        i = 0
        # Ceil-adversarial exact-size docs (distinct wide vocab), with
        # a planted near-identical partner one token off so the pair's
        # survival depends on the FULL prefix length.
        for n in (19, 38, 57, 126, 133):
            base = [f"u{n}x{j}" for j in range(n)]
            docs.append((i, " ".join(base))); i += 1
            partner = list(base)
            partner[-1] = f"u{n}xsub"
            docs.append((i, " ".join(partner))); i += 1
        # Plus a shared-vocab background population.
        vocab = [f"w{j}" for j in range(25)]
        for _ in range(20):
            docs.append((i, " ".join(rng.sample(vocab, rng.randint(2, 10)))))
            i += 1
        want = {}
        for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
            a, b = set(ta.split()), set(tb.split())
            j = len(a & b) / len(a | b)
            if j >= thr:
                want[(min(ia, ib), max(ia, ib))] = round(j, 6)
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in prefix_filter_jaccard_pairs(
                df, "text", "doc_id", thr
            ).collect()
        }
        assert got == want, f"thr {thr}"


def test_ppjoin_ceil_slack_is_load_bearing(spark):
    """The constructed pair that the float-ceil slack rescues —
    verified lost without it (r11 close ablation: candidate count 1
    with slack, 0 without). n = 133, t = 0.9: double ceil(18/19*133)
    reads 127 (true 126), shortening the index prefix to 7; the two
    docs share exactly 126 of 133 tokens (J = 126/140 = 0.9, exactly
    at threshold) and each side's 7 unique tokens are globally
    rarest, so the ONLY shared prefix token sits at index-prefix
    position 8 — present under the correct length, cut off under the
    overshot one."""
    from corral_spark.operators.dedup import prefix_filter_jaccard_pairs

    shared = [f"s{i:03d}" for i in range(126)]
    a = [f"a{i}" for i in range(7)] + shared
    b = [f"b{i}" for i in range(7)] + shared
    df = spark.createDataFrame(
        [(0, " ".join(a)), (1, " ".join(b))], ["doc_id", "text"]
    )
    rows = prefix_filter_jaccard_pairs(df, "text", "doc_id", 0.9).collect()
    assert [(r.id_a, r.id_b, r.jaccard) for r in rows] == [(0, 1, 0.9)]
