"""Unit tests for the round-2 tail operators: Misra-Gries heavy
hitters, the SQL UDTF surface, and the deterministic capped fuzzy
join."""

from __future__ import annotations

from pyspark.sql import functions as F

from corral_spark.operators.fuzzy import fuzzy_join_lev1
from corral_spark.operators.sketches import frequent_items


# ---------------------------------------------------------------------------
# frequent_items
# ---------------------------------------------------------------------------


def _skewed_items(spark, n_partitions):
    # 400x 'hot', 150x 'warm', 120x 'mild', 330 singletons -> n=1000.
    rows = (
        [("hot",)] * 400
        + [("warm",)] * 150
        + [("mild",)] * 120
        + [(f"tail{i}",) for i in range(330)]
    )
    return spark.createDataFrame(rows, ["item"]).repartition(n_partitions)


def test_frequent_items_matches_exact_groupby(spark):
    items = _skewed_items(spark, 16)
    # den=10 with 1000 rows -> threshold 100; capacity 10 per
    # partition forces the MG decrement path on every partition.
    got = sorted(
        (r.item, r.cnt)
        for r in frequent_items(items, "item", num=1, den=10).collect()
    )
    exact = sorted(
        (r.item, r.cnt)
        for r in items.groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * 10 >= 1000)
        .collect()
    )
    assert got == exact == [("hot", 400), ("mild", 120), ("warm", 150)]


def test_frequent_items_partition_invariant(spark):
    # The MG candidate pass depends on partitioning; the verified
    # output must not.
    for parts in (1, 3, 32):
        items = _skewed_items(spark, parts)
        got = sorted(
            (r.item, r.cnt)
            for r in frequent_items(items, "item", num=3, den=20).collect()
        )
        assert got == [("hot", 400), ("warm", 150)], parts


def test_frequent_items_excludes_nulls_and_empty(spark):
    items = spark.createDataFrame(
        [("a",), (None,), ("a",), (None,), (None,)], ["item"]
    )
    got = [(r.item, r.cnt) for r in frequent_items(items, "item", den=2).collect()]
    assert got == [("a", 2)]  # nulls neither counted nor in the total

    empty = spark.createDataFrame([], "item string")
    assert frequent_items(empty, "item").collect() == []


def test_frequent_items_rejects_bad_fraction(spark):
    items = spark.createDataFrame([("a",)], ["item"])
    import pytest

    with pytest.raises(ValueError):
        frequent_items(items, "item", num=0)


# ---------------------------------------------------------------------------
# SplitSentences UDTF
# ---------------------------------------------------------------------------


def test_udtf_split_sentences_lateral(spark):
    from corral_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    spark.createDataFrame(
        [(1, "One. Two! Three? Four"), (2, None), (3, "")],
        ["doc_id", "text"],
    ).createOrReplaceTempView("__udtf_test_docs")
    rows = spark.sql(
        """
        SELECT doc_id, s.idx, s.sentence
        FROM __udtf_test_docs d, LATERAL split_sentences(d.text) s
        ORDER BY doc_id, s.idx
        """
    ).collect()
    assert [(r.doc_id, r.idx, r.sentence) for r in rows] == [
        (1, 1, "One"),
        (1, 2, "Two"),
        (1, 3, "Three"),
        (1, 4, "Four"),
    ]


def test_udtf_idx_counts_dropped_empty_segments(spark):
    from corral_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    # 'Hi! ! Yo' raw-splits to ['Hi', '', 'Yo'] — the empty segment is
    # dropped but still consumes idx 2, matching generate_subscripts.
    spark.createDataFrame([("Hi! ! Yo",)], ["text"]).createOrReplaceTempView(
        "__udtf_idx_docs"
    )
    rows = spark.sql(
        """
        SELECT s.idx, s.sentence
        FROM __udtf_idx_docs d, LATERAL split_sentences(d.text) s
        ORDER BY s.idx
        """
    ).collect()
    assert [(r.idx, r.sentence) for r in rows] == [(1, "Hi"), (3, "Yo")]


# ---------------------------------------------------------------------------
# fuzzy_join_lev1 cap_per_block
# ---------------------------------------------------------------------------


def test_fuzzy_cap_keeps_smallest_ids_and_is_partition_invariant(spark):
    # Five strings within lev<=1 of each other on shared variant keys;
    # cap=2 must keep only pairs among the two smallest ids per key.
    rows = [(i, f"abc{i}") for i in range(1, 6)] + [(9, "zzz")]
    base = spark.createDataFrame(rows, ["id", "txt"])
    want = None
    for parts in (1, 7):
        df = base.repartition(parts)
        got = sorted(
            (r.id_a, r.id_b)
            for r in fuzzy_join_lev1(
                df, "txt", "id", cap_per_block=2
            ).collect()
        )
        if want is None:
            want = got
        assert got == want, parts
    # 'abc1'..'abc5' all share variant 'abc'; smallest two ids are 1,2
    # -> (1,2) survives; adjacent substitution keys like 'abcN' give no
    # extra pairs beyond the shared-deletion block. 'zzz' pairs with
    # nothing.
    assert want == [(1, 2)]


def test_fuzzy_cap_large_enough_matches_uncapped(spark):
    rows = [(i, t) for i, t in enumerate(["cat", "cut", "cart", "dog", "dig"])]
    df = spark.createDataFrame(rows, ["id", "txt"])
    capped = sorted(
        (r.id_a, r.id_b)
        for r in fuzzy_join_lev1(df, "txt", "id", cap_per_block=100).collect()
    )
    uncapped = sorted(
        (r.id_a, r.id_b) for r in fuzzy_join_lev1(df, "txt", "id").collect()
    )
    assert capped == uncapped and len(uncapped) > 0


def test_frequent_items_non_string_items(spark):
    # The operator is type-generic: bigint heavy hitters (user ids).
    rows = [(7,)] * 50 + [(i + 100,) for i in range(50)]
    items = spark.createDataFrame(rows, ["uid"]).repartition(8)
    got = [(r.item, r.cnt) for r in frequent_items(items, "uid", den=4).collect()]
    assert got == [(7, 50)]


def test_udtf_ascii_whitespace_matches_re2_semantics(spark):
    from corral_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    # NBSP (u00a0) and \x0b are Unicode-\s but NOT RE2-\s: the UDTF
    # must not split on them, or it diverges from the DuckDB oracle.
    spark.createDataFrame(
        [("A. B.\x0bC. D",)], ["text"]
    ).createOrReplaceTempView("__udtf_ws_docs")
    rows = spark.sql(
        """
        SELECT s.idx, s.sentence
        FROM __udtf_ws_docs d, LATERAL split_sentences(d.text) s
        ORDER BY s.idx
        """
    ).collect()
    assert [(r.idx, r.sentence) for r in rows] == [
        (1, "A. B.\x0bC"),
        (2, "D"),
    ]


def test_fuzzy_cap_deterministic_under_duplicate_ids(spark):
    # Duplicate ids with different texts: the (id, txt) tiebreak must
    # keep the rank-and-cap output partition-invariant.
    rows = [(1, "aaa"), (1, "aab"), (1, "aac"), (2, "aad"), (2, "aae")]
    base = spark.createDataFrame(rows, ["id", "txt"])
    want = None
    for parts in (1, 5):
        got = sorted(
            (r.id_a, r.id_b, r.text_a, r.text_b)
            for r in fuzzy_join_lev1(
                base.repartition(parts), "txt", "id", cap_per_block=2
            ).collect()
        )
        if want is None:
            want = got
        assert got == want, parts
    # Smallest (id, txt) pairs on the shared 'aa' deletion blocks are
    # (1,'aaa') and (1,'aab'); id_a < id_b never holds within id 1, so
    # the only emitted pairs need distinct ids that both survive a cap.
    assert all(a != b for a, b, *_ in want)


class TestBloomPrefilter:
    """Expression-native Bloom filter (sketches.bloom_build /
    bloom_might_contain / bloom_new_rows)."""

    def test_no_false_negatives(self, spark):
        # Every key inserted at build time MUST probe positive.
        from corral_spark.operators.sketches import (
            bloom_build,
            bloom_might_contain,
        )

        from pyspark.sql import functions as F

        keys = spark.range(5000).select(
            F.concat(F.lit("k"), F.col("id")).alias("key")
        )
        bf = bloom_build(keys, "key", m_bits=1 << 16, k=5)
        flagged = bloom_might_contain(bf, keys, "key")
        assert flagged.filter(~F.col("__might")).count() == 0

    def test_false_positive_rate_sane(self, spark):
        from pyspark.sql import functions as F

        from corral_spark.operators.sketches import (
            bloom_build,
            bloom_might_contain,
        )

        keys = spark.range(5000).select(
            F.concat(F.lit("k"), F.col("id")).alias("key")
        )
        others = spark.range(5000, 10000).select(
            F.concat(F.lit("k"), F.col("id")).alias("key")
        )
        bf = bloom_build(keys, "key", m_bits=1 << 20, k=5)
        fp = (
            bloom_might_contain(bf, others, "key")
            .filter(F.col("__might"))
            .count()
        )
        # m/n = 210 bits/key with k=5 -> theoretical fpp well under 1e-4;
        # allow generous slack for hash quality.
        assert fp < 50, f"false-positive count {fp} of 5000 is implausible"

    def test_new_rows_equals_anti_join(self, spark):
        from pyspark.sql import functions as F

        from corral_spark.operators.sketches import bloom_new_rows

        existing = spark.range(0, 3000).select(
            F.concat(F.lit("d"), (F.col("id") % 2000)).alias("key"),
            F.col("id").alias("v"),
        )
        incoming = spark.range(1000, 5000).select(
            F.concat(F.lit("d"), F.col("id")).alias("key"),
            (F.col("id") * 10).alias("v"),
        )
        got = sorted(
            map(tuple, bloom_new_rows(existing, incoming, "key").collect())
        )
        want = sorted(
            map(
                tuple,
                incoming.join(
                    existing.select("key").distinct(), "key", "left_anti"
                ).collect(),
            )
        )
        assert got == want

    def test_empty_existing_passes_everything(self, spark):
        from pyspark.sql import functions as F

        from corral_spark.operators.sketches import bloom_new_rows

        existing = spark.range(0).select(
            F.concat(F.lit("x"), F.col("id")).alias("key")
        )
        incoming = spark.range(100).select(
            F.concat(F.lit("x"), F.col("id")).alias("key")
        )
        assert bloom_new_rows(existing, incoming, "key").count() == 100

    def test_m_bits_must_be_word_aligned(self, spark):
        import pytest as _pytest

        from corral_spark.operators.sketches import bloom_build

        with _pytest.raises(ValueError, match="multiple of 64"):
            bloom_build(spark.range(1).toDF("key"), "key", m_bits=100)


def test_cms_overestimate_and_error_bound(spark):
    """CMS invariants: est >= true for every key (never underestimates),
    est is exact for keys with collision-free rows, and overestimate is
    bounded by the classic e*N/width bound with margin on this fixed
    corpus (width 64 forced collisions over ~900 keys)."""
    import math

    from corral_spark.operators.sketches import cms_build, cms_estimate

    rows = [(f"k{i % 300}",) for i in range(3000)]
    df = spark.createDataFrame(rows, ["key"])
    depth, width = 4, 64
    sketch = cms_build(df, "key", depth=depth, width=width)
    true_c = df.groupBy("key").agg(F.count(F.lit(1)).alias("true_cnt"))
    est = cms_estimate(true_c.select("key"), sketch, "key", depth, width)
    joined = {r.key: (r.true_cnt, r.est_cnt)
              for r in true_c.join(est, "key").collect()}
    assert len(joined) == 300
    n_total = 3000
    bound = math.e * n_total / width  # eps*N with eps = e/width
    for key, (t, e) in joined.items():
        assert e >= t, (key, t, e)
        assert e - t <= bound, (key, t, e, bound)
    # The grid really collided (width 64 < 300 keys): some est > true.
    assert any(e > t for t, e in joined.values())
    # Sketch size is bounded by the grid, not the corpus.
    assert sketch.count() <= depth * width


# ---------------------------------------------------------------------------
# HyperLogLog (expression-native, md5-derived)
# ---------------------------------------------------------------------------


def test_hll_estimate_within_error_bound(spark):
    from corral_spark.operators.sketches import hll_estimate, hll_registers

    # 5000 distinct keys with heavy repetition (3 rows each) across two
    # groups — repetition must not move the estimate (HLL is a distinct
    # counter), and m=1024 gives ~3.25% std error, so assert 10%.
    rows = [(f"g{i % 2}", f"key-{i}") for i in range(5000) for _ in range(3)]
    df = spark.createDataFrame(rows, ["grp", "k"]).repartition(8)
    est = hll_estimate(
        hll_registers(df, "k", ("grp",)), ("grp",)
    ).collect()
    assert len(est) == 2
    for r in est:
        true = 2500
        assert abs(r["hll_est"] - true) / true < 0.10, r


def test_hll_small_range_uses_linear_counting(spark):
    from corral_spark.operators.sketches import hll_estimate, hll_registers

    # 60 distinct << m: raw Flajolet floor is ~alpha*m (useless); the
    # corrected estimate must fall back to linear counting and land
    # close to the truth.
    df = spark.createDataFrame([(f"k{i}",) for i in range(60)], ["k"])
    r = hll_estimate(hll_registers(df, "k")).collect()[0]
    assert r["hll_raw"] > 500  # the raw floor, documenting WHY lc exists
    assert abs(r["hll_est"] - 60) <= 6


def test_hll_merge_equals_sketch_of_union(spark):
    from corral_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    a = spark.createDataFrame([(f"k{i}",) for i in range(0, 800)], ["k"])
    b = spark.createDataFrame([(f"k{i}",) for i in range(400, 1200)], ["k"])
    merged = hll_merge(hll_registers(a, "k"), hll_registers(b, "k"))
    direct = hll_registers(a.unionByName(b), "k")
    # register-file equality (bucket -> rho), not just estimate equality
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # and the merged estimate counts the union's 1200 distincts
    est = hll_estimate(merged).collect()[0]["hll_est"]
    assert abs(est - 1200) / 1200 < 0.10


# ---------------------------------------------------------------------------
# Bottom-k (KMV) sketch
# ---------------------------------------------------------------------------


def test_bottomk_merge_equals_sketch_of_union(spark):
    from corral_spark.operators.sketches import bottomk_merge, bottomk_sketch

    a = spark.createDataFrame(
        [(f"k{i}", i % 7) for i in range(0, 900)], ["k", "v"]
    )
    b = spark.createDataFrame(
        [(f"k{i}", i % 7) for i in range(600, 1500)], ["k", "v"]
    )
    merged = bottomk_merge(
        64, bottomk_sketch(a, "k", 64, keep_cols=("v",)),
        bottomk_sketch(b, "k", 64, keep_cols=("v",)),
    )
    direct = bottomk_sketch(a.unionByName(b), "k", 64, keep_cols=("v",))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_bottomk_distinct_estimate_accuracy_and_exact_small(spark):
    from corral_spark.operators.sketches import (
        bottomk_distinct_estimate,
        bottomk_sketch,
    )

    # 4000 distinct keys, k=256 -> KMV std error ~1/sqrt(255) ~ 6%.
    big = spark.createDataFrame([(f"k{i}",) for i in range(4000)], ["k"])
    est = bottomk_distinct_estimate(
        bottomk_sketch(big, "k", 256), 256
    ).collect()[0]
    assert est["sample_n"] == 256
    assert abs(est["est_distinct"] - 4000) / 4000 < 0.20
    # under-filled sketch IS the key set: estimate must be exact
    small = spark.createDataFrame([(f"k{i}",) for i in range(40)], ["k"])
    est2 = bottomk_distinct_estimate(
        bottomk_sketch(small, "k", 256), 256
    ).collect()[0]
    assert est2["est_distinct"] == 40


def test_bottomk_sample_is_duplicate_insensitive(spark):
    from corral_spark.operators.sketches import bottomk_sketch

    once = spark.createDataFrame([(f"k{i}", i) for i in range(500)], ["k", "v"])
    tripled = once.unionByName(once).unionByName(once)
    s1 = sorted(map(tuple, bottomk_sketch(once, "k", 32, keep_cols=("v",)).collect()))
    s3 = sorted(map(tuple, bottomk_sketch(tripled, "k", 32, keep_cols=("v",)).collect()))
    assert s1 == s3  # distinct-key semantics: repetition cannot bias the sample


def test_hll_rejects_oversized_b_and_ignores_nulls(spark):
    # b > 16 would alias buckets (the index is carved from 16 hash
    # bits) and NULL keys would mint a phantom register that skews the
    # linear-counting branch — both are guarded at the API.
    import pytest as _pytest

    from corral_spark.operators.sketches import hll_registers

    df = spark.createDataFrame(
        [(None,), ("a",), ("b",)], "k string"
    )
    with _pytest.raises(ValueError):
        hll_registers(df, "k", b=17)
    regs = hll_registers(df, "k").collect()
    assert len(regs) == 2  # NULL minted no register
    assert all(r["bucket"] is not None and r["rho"] is not None for r in regs)


def test_bottomk_ignores_null_keys_and_matches_naive(spark):
    # The local-pass build must equal the naive global
    # distinct-then-rank definition on any partitioning, and NULL
    # keys must not occupy sample slots.
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from corral_spark.operators.sketches import bottomk_sketch

    rows = [(i % 50 if i % 7 else None,) for i in range(1000)]
    df = spark.createDataFrame(rows, "k int").repartition(8)
    sk = bottomk_sketch(df, "k", k=10)
    got = [(r["k"], r["rnk"]) for r in sk.orderBy("rnk").collect()]
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("bk:"), F.col("k").cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    naive = (
        df.filter(F.col("k").isNotNull()).select("k").distinct()
        .select("k", h.alias("h"))
        .withColumn("rnk", F.row_number().over(Window.orderBy("h", "k")))
        .filter(F.col("rnk") <= 10)
    )
    want = [(r["k"], r["rnk"]) for r in naive.orderBy("rnk").collect()]
    assert got == want
    assert all(k is not None for k, _ in got)


class TestBloomRegisterFile:
    """Large-m Bloom path (r5 verdict item 3): the filter lives as a
    distributed (w, m) register file — no driver collect, no
    single-row broadcast — and bloom_new_rows auto-selects it past
    BLOOM_DENSE_MAX_BITS."""

    def test_dense_build_rejects_oversized_m(self, spark):
        import pytest as _pytest

        from corral_spark.operators.sketches import (
            BLOOM_DENSE_MAX_BITS,
            bloom_build,
        )

        df = spark.range(10).selectExpr("cast(id as string) as key")
        with _pytest.raises(ValueError):
            bloom_build(df, "key", m_bits=BLOOM_DENSE_MAX_BITS * 2)

    def test_register_probe_no_false_negatives_and_exact_new_rows(
        self, spark
    ):
        # m_bits = 2^28 > the 2^27 dense ceiling: the register-file
        # path must kick in and bloom_new_rows must still be EXACT
        # anti-join semantics.
        from pyspark.sql import functions as F

        from corral_spark.operators.sketches import (
            bloom_build_registers,
            bloom_might_contain_registers,
            bloom_new_rows,
        )

        m, k = 1 << 28, 5
        existing = spark.range(0, 3000).select(
            F.concat(F.lit("d"), (F.col("id") % 2000)).alias("key"),
            F.col("id").alias("v"),
        )
        incoming = spark.range(1000, 5000).select(
            F.concat(F.lit("d"), F.col("id")).alias("key"),
            (F.col("id") * 10).alias("v"),
        )
        regs = bloom_build_registers(existing, "key", m, k)
        flagged = bloom_might_contain_registers(
            regs, existing.select("key").distinct(), "key", m, k
        )
        assert flagged.filter(~F.col("__might")).count() == 0

        got = sorted(
            map(
                tuple,
                bloom_new_rows(existing, incoming, "key", m_bits=m).collect(),
            )
        )
        want = sorted(
            map(
                tuple,
                incoming.join(
                    existing.select("key").distinct(), "key", "left_anti"
                ).collect(),
            )
        )
        assert got == want


class TestBloomRegisterNullKeys:
    def test_register_probe_null_keys_get_null_flag(self, spark):
        # Contract since the keyed-probe rewrite: __might is NULL for
        # NULL keys (a NULL never equi-joins the flag back); callers
        # that must route NULLs filter first — bloom_new_rows does,
        # emitting NULL-key rows as new.
        from corral_spark.operators.sketches import (
            bloom_build_registers,
            bloom_might_contain_registers,
            bloom_new_rows,
        )

        m, k = 1 << 28, 5
        existing = spark.createDataFrame([("a",), ("b",)], "key string")
        incoming = spark.createDataFrame(
            [("a", 1), (None, 2), ("z", 3)], "key string, v int"
        )
        regs = bloom_build_registers(existing, "key", m, k)
        flagged = bloom_might_contain_registers(regs, incoming, "key", m, k)
        rows = {r["v"]: r["__might"] for r in flagged.collect()}
        assert rows[2] is None
        assert rows[1] is True
        assert rows[3] is False
        got = sorted(
            r["v"]
            for r in bloom_new_rows(
                existing, incoming, "key", m_bits=m
            ).collect()
        )
        assert got == [2, 3]
