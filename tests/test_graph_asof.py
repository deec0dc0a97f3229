"""Direct operator tests for connected_components / dedup_clusters /
asof_join: empty-input handling, driver-vs-distributed path agreement,
and tie-break determinism (VERDICT r1 advisories)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from corral_spark.operators.asof import asof_join
from corral_spark.operators.graph import connected_components, dedup_clusters

EDGES = [
    # two components: {1,2,3,4} (chain+extra edge) and {10,11}
    (2, 1),
    (2, 3),
    (3, 4),
    (1, 4),
    (10, 11),
]
EXPECTED = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def _edges_df(spark, rows=EDGES):
    return spark.createDataFrame(rows, ["src", "dst"])


def test_cc_empty_edges_returns_empty_typed_frame(spark):
    empty = _edges_df(spark).limit(0)
    out = connected_components(empty)
    assert out.columns == ["node", "component"]
    assert out.count() == 0
    # Component column keeps the edge column's type.
    assert out.schema["component"].dataType == empty.schema["src"].dataType


def test_cc_empty_edges_distributed_path(spark):
    out = connected_components(_edges_df(spark).limit(0), collect_threshold=0)
    assert out.count() == 0


def test_cc_driver_path(spark):
    got = {
        r["node"]: r["component"]
        for r in connected_components(_edges_df(spark)).collect()
    }
    assert got == EXPECTED


def test_cc_distributed_path_matches_driver_path(spark):
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            _edges_df(spark), collect_threshold=0
        ).collect()
    }
    assert got == EXPECTED


def test_cc_conf_driven_threshold(spark):
    # conf forces the distributed path even though the default
    # collect_threshold would take the driver path.
    spark.conf.set("corral.cc.collectThreshold", "0")
    try:
        got = {
            r["node"]: r["component"]
            for r in connected_components(_edges_df(spark)).collect()
        }
        assert got == EXPECTED
    finally:
        spark.conf.unset("corral.cc.collectThreshold")


def test_dedup_clusters_with_no_pairs(spark):
    # A clean corpus (zero near-dup pairs) must not crash: everyone
    # represents themselves.
    df = spark.createDataFrame([(i,) for i in range(5)], ["doc_id"])
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    out = dedup_clusters(df, pairs, "doc_id").collect()
    assert len(out) == 5
    assert all(r["doc_id"] == r["cluster_rep"] and r["is_rep"] for r in out)


def test_asof_join_tied_right_timestamps_deterministic(spark):
    left = spark.createDataFrame([Row(k="a", ts=10), Row(k="a", ts=20)])
    # Three right rows share (k, ts=10): the attached payload must be
    # the same row on every run regardless of shuffle order.
    right_rows = [Row(k="a", ts=10, payload=p) for p in ("x", "y", "z")]
    results = []
    for shuffle_seed in (1, 3, 7):
        right = spark.createDataFrame(right_rows).repartition(shuffle_seed)
        out = asof_join(left, right, on="ts", by="k")
        results.append(sorted((r["ts"], r["payload_right"]) for r in out.collect()))
    assert results[0] == results[1] == results[2]
    # Both left rows see the same winning payload for the ts=10 tie.
    assert results[0][0][1] == results[0][1][1]


# --- r12 fuzz-campaign distillations -------------------------------------
# The campaign (20 seeds x 4 graph shapes x both paths vs Python
# union-find; 60 asof trials vs per-row scan; 60 interval trials vs
# O(n*m) scan) found two real defects in the distributed CC path:
# one-hop label propagation needs O(diameter) rounds so a shuffled
# chain longer than max_iter returned silently-wrong labels, and
# localCheckpoint stats inheritance compounded through the iterated
# joins into "BigInteger would overflow supported range" in a vanilla
# session. Fixed by the two-phase (large-star/small-star) rewrite +
# iter_barrier. These pins are the distilled survivors.


def _uf_components(edges):
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min = {}
    for x in parent:
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    return {x: comp_min[find(x)] for x in parent}


def test_cc_distributed_long_shuffled_chain(spark):
    """A 200-node shuffled path graph through the DISTRIBUTED path
    with the default max_iter: diameter 199 >> 25, so one-hop
    propagation could never converge here — two-phase does (~10
    rounds measured). Shuffled ids are the adversarial layout: they
    also defeat the pointer-chase variant (measured 60+ rounds
    without convergence)."""
    import random

    rng = random.Random(7)
    ids = list(range(200))
    rng.shuffle(ids)
    edges = [(ids[i], ids[i + 1]) for i in range(199)]
    want = _uf_components(edges)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, collect_threshold=0).collect()
    }
    assert got == want
    assert set(got.values()) == {0}


def test_cc_fuzz_shapes_both_paths(spark):
    """Fixed-seed distillation of the r12 campaign's remaining graph
    shapes: random multigraphs (self-loops + duplicate edges, both
    orientations), hub stars, and two cliques with/without a bridge —
    driver AND distributed paths vs union-find."""
    import random

    def gen(rng, kind):
        if kind == "random":
            n = rng.randint(2, 60)
            return [
                (rng.randrange(n), rng.randrange(n))
                for _ in range(rng.randint(1, 2 * n))
            ]
        if kind == "stars":
            out, nid = [], 100
            for h in range(rng.randint(1, 4)):
                for _ in range(rng.randint(1, 15)):
                    out.append((nid, h) if rng.random() < 0.5 else (h, nid))
                    nid += 1
            return out
        a, b = list(range(0, 8)), list(range(50, 58))
        out = [(x, y) for i, x in enumerate(a) for y in a[i + 1 :]]
        out += [(x, y) for i, x in enumerate(b) for y in b[i + 1 :]]
        if rng.random() < 0.5:
            out.append((a[-1], b[0]))
        return out

    for seed in (3, 11):
        rng = random.Random(seed)
        for kind in ("random", "stars", "two_cliques_bridge"):
            edges = gen(rng, kind)
            want = _uf_components(edges)
            df = spark.createDataFrame(edges, ["src", "dst"])
            for thresh in (10**9, 0):
                got = {
                    r["node"]: r["component"]
                    for r in connected_components(
                        df, collect_threshold=thresh
                    ).collect()
                }
                assert got == want, f"{seed}/{kind}/thresh={thresh}"


def test_iter_barrier_stats_stay_accurate(spark):
    """The stats-overflow pin: iter_barrier output must carry the
    ACTUAL materialized size, not an inherited join-product estimate.
    Before the fix, one barriered self-join round already reported
    sizeInBytes ~9E+75 on a 128-row frame (vanilla session), and the
    estimates compounded per round into a Catalyst ArithmeticException
    by round ~12."""
    from pyspark.sql import functions as F

    from corral_spark.materialize import iter_barrier

    base = iter_barrier(
        spark.range(128).select(
            F.col("id").alias("node"), F.col("id").alias("component")
        )
    )
    joined = iter_barrier(
        base.alias("a")
        .join(base.alias("b"), F.col("a.component") == F.col("b.node"))
        .select(F.col("a.node").alias("node"), F.col("b.component").alias("component"))
    )
    stats = joined._jdf.queryExecution().optimizedPlan().stats()
    assert int(stats.sizeInBytes()) < 10**6, (
        f"iter_barrier inherited an estimate: {stats.toString()}"
    )


def test_asof_join_matches_bruteforce(spark):
    """Fixed-seed distillation of 60 randomized trials: small key
    space (forced key collisions), ts range 0-20 (forced left/right
    ties pinning <= semantics), keys with no prior right row, empty
    right sides. Right rows unique per (key, ts) so the Python scan
    is the unambiguous oracle."""
    import random

    for seed in (1003, 1017, 1042):
        rng = random.Random(seed)
        nkeys = rng.randint(1, 4)
        lrows = [
            (rng.randrange(nkeys), rng.randint(0, 20), rng.randint(0, 999))
            for _ in range(rng.randint(5, 25))
        ]
        seen, rrows = set(), []
        for _ in range(rng.randint(0, 25)):
            k, t = rng.randrange(nkeys), rng.randint(0, 20)
            if (k, t) not in seen:
                seen.add((k, t))
                rrows.append((k, t, rng.randint(0, 999)))
        ldf = spark.createDataFrame(lrows, ["k", "ts", "lval"])
        rdf = (
            spark.createDataFrame(rrows, ["k", "ts", "rval"])
            if rrows
            else spark.createDataFrame([], "k: bigint, ts: bigint, rval: bigint")
        )
        got = sorted(
            (r["k"], r["ts"], r["lval"], r["ts_right"], r["rval_right"])
            for r in asof_join(ldf, rdf, on="ts", by="k").collect()
        )
        want = []
        for key, lts, lval in lrows:
            cands = [
                (rts, rval)
                for rkey, rts, rval in rrows
                if rkey == key and rts <= lts
            ]
            want.append(
                (key, lts, lval, *max(cands)) if cands else (key, lts, lval, None, None)
            )
        assert got == sorted(want), f"seed {seed}"


def test_interval_join_matches_bruteforce(spark):
    """Fixed-seed distillation: negative domains, zero-length
    intervals, intervals spanning many buckets, bucket widths from 1
    to wider-than-domain — vs the O(n*m) scan."""
    import random

    from corral_spark.operators.ranges import interval_bucket_join

    for seed in (2005, 2023, 2048):
        rng = random.Random(seed)
        lo_dom = -30 if rng.random() < 0.3 else 0
        pts = [(i, rng.randint(lo_dom, 60)) for i in range(rng.randint(5, 30))]
        ivs = []
        for j in range(rng.randint(1, 15)):
            lo = rng.randint(lo_dom, 60)
            ivs.append((j, lo, lo + rng.choice([0, 1, 2, 5, 40])))
        width = rng.choice([1, 3, 7, 64])
        pdf = spark.createDataFrame(pts, ["pid", "p"])
        idf = spark.createDataFrame(ivs, ["iid", "lo", "hi"])
        got = sorted(
            (r["pid"], r["iid"])
            for r in interval_bucket_join(
                pdf, idf, "p", "lo", "hi", bucket_width=width
            ).collect()
        )
        want = sorted(
            (pid, iid)
            for pid, p in pts
            for iid, lo, hi in ivs
            if lo <= p < hi
        )
        assert got == want, f"seed {seed} width {width}"


def test_pagerank_and_bfs_fuzz_random_graphs(spark):
    """Fixed-seed distillation of the r13 campaign (40 random graphs,
    80/80 clean): pagerank_fixed_point must be BIT-exact vs the
    dict-based integer reference (same floor-division contract), and
    bfs_hops exact vs dict BFS — random graphs, random seed sets,
    random iters/max_hops. Guards the r13 barrier work (PageRank
    ranks reverted to plain materialize; BFS frontier emptiness
    folded into the barrier count)."""
    import random

    from corral_spark.operators.graph import bfs_hops, pagerank_fixed_point

    def pr_ref(edges, iters, scale=10**12):
        both = set()
        for u, v in edges:
            both.add((u, v))
            both.add((v, u))
        nodes = sorted({u for u, _ in both})
        deg = {u: sum(1 for a, _ in both if a == u) for u in nodes}
        n = len(nodes)
        r = {u: scale // n for u in nodes}
        t = (scale // n) * 15 // 100
        for _ in range(iters):
            s = {u: 0 for u in nodes}
            for u, v in both:
                s[v] += r[u] // deg[u]
            r = {u: t + 85 * s[u] // 100 for u in nodes}
        return r

    def bfs_ref(edges, seeds, max_hops):
        adj = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        dist = {s: 0 for s in seeds}
        frontier = set(seeds)
        for hop in range(1, max_hops + 1):
            nxt = set()
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = hop
                        nxt.add(v)
            frontier = nxt
            if not frontier:
                break
        return dist

    rng = random.Random(20260815)
    for _ in range(5):
        n = rng.randint(2, 40)
        m = rng.randint(1, 3 * n)
        edges = list({(rng.randrange(n), rng.randrange(n)) for _ in range(m)})
        edges = [(u, v) for u, v in edges if u != v] or [(0, 1)]
        iters = rng.randint(1, 5)
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {
            r.node: r.pr_e12
            for r in pagerank_fixed_point(df, iters=iters).collect()
        }
        assert got == pr_ref(edges, iters)
        ns = sorted({x for e in edges for x in e})
        seeds = rng.sample(ns, k=min(len(ns), rng.randint(1, 3)))
        max_hops = rng.randint(1, 6)
        sdf = spark.createDataFrame([(s,) for s in seeds], ["node"])
        gbfs = {
            r.node: r.hops
            for r in bfs_hops(
                df, sdf, seed_col="node", max_hops=max_hops
            ).collect()
        }
        assert gbfs == bfs_ref(edges, seeds, max_hops)
