"""Unit tests for the round-2 gap operators: range/interval join,
gapfill+LOCF, symmetric-delete fuzzy join, merge upsert."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from corral_spark.operators.fuzzy import fuzzy_join_lev1
from corral_spark.operators.merge import merge_upsert
from corral_spark.operators.ranges import interval_bucket_join
from corral_spark.operators.timeseries import gapfill_locf, time_bucket


# ---------------------------------------------------------------------------
# interval_bucket_join
# ---------------------------------------------------------------------------


def test_interval_bucket_join_matches_naive(spark):
    points = spark.createDataFrame(
        [(i, i * 37 % 1000) for i in range(200)], ["pid", "x"]
    )
    intervals = spark.createDataFrame(
        [(k, k * 90, k * 90 + 150) for k in range(12)], ["iid", "lo", "hi"]
    )
    fast = interval_bucket_join(points, intervals, "x", "lo", "hi", 50)
    naive = points.join(
        intervals,
        (points.x >= intervals.lo) & (points.x < intervals.hi),
    )
    got = sorted((r.pid, r.iid) for r in fast.select("pid", "iid").collect())
    want = sorted((r.pid, r.iid) for r in naive.select("pid", "iid").collect())
    assert got == want and len(got) > 0


def test_interval_bucket_join_no_nested_loop(spark):
    points = spark.createDataFrame([(1, 10)], ["pid", "x"])
    intervals = spark.createDataFrame([(1, 0, 20)], ["iid", "lo", "hi"])
    plan = (
        interval_bucket_join(points, intervals, "x", "lo", "hi", 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_interval_spanning_many_buckets(spark):
    # One interval covering everything: every point matches once.
    points = spark.createDataFrame([(i, i) for i in range(100)], ["pid", "x"])
    intervals = spark.createDataFrame([(1, 0, 100)], ["iid", "lo", "hi"])
    out = interval_bucket_join(points, intervals, "x", "lo", "hi", 7)
    assert out.count() == 100
    # No duplicate (point, interval) pairs despite multi-bucket spans.
    assert out.select("pid", "iid").distinct().count() == 100


# ---------------------------------------------------------------------------
# gapfill_locf / time_bucket
# ---------------------------------------------------------------------------


def test_gapfill_locf_fills_and_preserves_leading_nulls(spark):
    obs = spark.createDataFrame(
        [("a", 2, 10.0), ("a", 5, 20.0), ("b", 3, 7.0)],
        ["k", "bucket", "v"],
    )
    out = gapfill_locf(obs, "k", "bucket", ["v"], bucket_width=1)
    rows = {(r.k, r.bucket): r.v for r in out.collect()}
    # Spine spans global [2, 5] for every key.
    assert len(rows) == 8
    assert rows[("a", 2)] == 10.0
    assert rows[("a", 3)] == 10.0  # gap -> LOCF
    assert rows[("a", 4)] == 10.0
    assert rows[("a", 5)] == 20.0
    assert rows[("b", 2)] is None  # before b's first obs: nothing to carry
    assert rows[("b", 3)] == 7.0
    assert rows[("b", 5)] == 7.0


def test_gapfill_locf_empty_input(spark):
    obs = spark.createDataFrame([], "k string, bucket bigint, v double")
    out = gapfill_locf(obs, "k", "bucket", ["v"], bucket_width=1)
    assert out.count() == 0
    assert out.columns == ["k", "bucket", "v"]


def test_time_bucket_truncates(spark):
    df = spark.createDataFrame([(3601,), (7199,), (7200,)], ["ts"])
    got = [r[0] for r in df.select(time_bucket("ts", 3600)).collect()]
    assert got == [3600, 3600, 7200]


# ---------------------------------------------------------------------------
# fuzzy_join_lev1
# ---------------------------------------------------------------------------


def test_fuzzy_join_complete_vs_brute_force(spark):
    words = [
        "kitten", "sitten", "sittin", "sitting", "mitten", "bitten",
        "kittens", "itten", "kitte", "xyz", "xyzz", "abc",
    ]
    df = spark.createDataFrame(list(enumerate(words)), ["id", "w"])
    fast = sorted(
        (r.id_a, r.id_b)
        for r in fuzzy_join_lev1(df, "w", "id").collect()
    )
    brute = sorted(
        (r.id_a, r.id_b)
        for r in df.alias("a")
        .join(df.alias("b"), F.col("a.id") < F.col("b.id"))
        .filter(F.levenshtein("a.w", "b.w") <= 1)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .collect()
    )
    assert fast == brute and len(fast) > 0


def test_fuzzy_join_exact_duplicates_and_max_block(spark):
    df = spark.createDataFrame(
        [(1, "same"), (2, "same"), (3, "same"), (4, "other")], ["id", "w"]
    )
    pairs = fuzzy_join_lev1(df, "w", "id")
    assert pairs.filter(F.col("lev") == 0).count() == 3  # 3 choose 2
    # max_block=2 drops the degenerate "same" variants entirely.
    capped = fuzzy_join_lev1(df, "w", "id", max_block=2)
    assert capped.count() == 0


def test_fuzzy_join_no_cartesian(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "w"])
    plan = (
        fuzzy_join_lev1(df, "w", "id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# merge_upsert
# ---------------------------------------------------------------------------


def test_merge_upsert_update_insert_delete(spark):
    current = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["k", "s", "v"],
    )
    updates = spark.createDataFrame(
        [
            (2, "B", 21.0, False),  # update
            (4, "d", 40.0, False),  # insert
            (3, None, None, True),  # delete
        ],
        "k long, s string, v double, del boolean",
    )
    out = {
        r.k: (r.s, r.v)
        for r in merge_upsert(current, updates, "k", delete_col="del").collect()
    }
    assert out == {1: ("a", 10.0), 2: ("B", 21.0), 4: ("d", 40.0)}


def test_merge_upsert_partial_null_update_keeps_current(spark):
    current = spark.createDataFrame([(1, "a", 10.0)], ["k", "s", "v"])
    updates = spark.createDataFrame(
        [(1, None, 99.0)], "k long, s string, v double"
    )
    row = merge_upsert(current, updates, "k").collect()[0]
    assert (row.s, row.v) == ("a", 99.0)  # NULL column patches nothing


# ---------------------------------------------------------------------------
# chunk_documents / pack_sequences
# ---------------------------------------------------------------------------


def test_chunk_documents_overlap_and_reconstruction(spark):
    text = " ".join(f"w{i}" for i in range(95))
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    from corral_spark.operators.chunking import chunk_documents

    chunks = sorted(
        (r.chunk_id, r.chunk_text.split(" "))
        for r in chunk_documents(df, "text", "doc_id", 40, 10).collect()
    )
    # stride 30: ceil((95-10)/30) = 3 chunks
    assert [c[0] for c in chunks] == [0, 1, 2]
    assert all(len(c[1]) <= 40 for c in chunks)
    # Consecutive chunks share exactly the 10-word overlap.
    assert chunks[0][1][30:] == chunks[1][1][:10]
    assert chunks[1][1][30:] == chunks[2][1][:10]
    # Dropping each chunk's leading overlap reconstructs the doc.
    rebuilt = chunks[0][1] + chunks[1][1][10:] + chunks[2][1][10:]
    assert rebuilt == text.split(" ")


def test_chunk_documents_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "only three words"), (2, "")], ["doc_id", "text"]
    )
    from corral_spark.operators.chunking import chunk_documents

    out = {
        r.doc_id: (r.chunk_id, r.n_words)
        for r in chunk_documents(df, "text", "doc_id", 40, 10).collect()
    }
    assert out == {1: (0, 3), 2: (0, 0)}  # exactly one chunk each


def test_pack_sequences_invariants(spark):
    rows = [(i, 100 + (i * 37) % 500) for i in range(200)]
    df = spark.createDataFrame(rows, ["id", "tokens"])
    from corral_spark.operators.chunking import pack_sequences

    out = pack_sequences(df, "id", "tokens", budget=1000).collect()
    max_w = max(w for _, w in rows)
    by_pack: dict = {}
    for r in sorted(out, key=lambda r: r.id):
        by_pack.setdefault(r.pack_id, []).append(r)
        assert 0 <= r.pack_offset < 1000
    for pid, members in by_pack.items():
        total = sum(r.tokens for r in members)
        assert total < 1000 + max_w  # overflow bounded by one row
    # Packs are contiguous in id order and offsets are cumulative.
    ids = [r.id for r in sorted(out, key=lambda r: (r.pack_id, r.pack_offset))]
    assert ids == sorted(ids)


# ---------------------------------------------------------------------------
# profile_table
# ---------------------------------------------------------------------------


def test_profile_table_stats_and_numeric_minmax(spark):
    from corral_spark.operators.quality import profile_table

    df = spark.createDataFrame(
        [(1, 99.0, "b"), (2, 100.0, None), (3, 99.0, "a")],
        ["k", "v", "s"],
    )
    prof = {r.column: r for r in profile_table(df).collect()}
    assert prof["k"].n_rows == 3 and prof["k"].n_nulls == 0
    assert prof["k"].n_distinct == 3
    assert prof["s"].n_nulls == 1 and prof["s"].n_distinct == 2
    assert (prof["s"].min_value, prof["s"].max_value) == ("a", "b")
    # Numeric min/max must compare numerically, not lexicographically:
    # '99.00' > '100.00' as strings.
    assert (prof["v"].min_value, prof["v"].max_value) == ("99.00", "100.00")


# ---------------------------------------------------------------------------
# review-pass regression fixes
# ---------------------------------------------------------------------------


def test_merge_upsert_null_tombstone_is_update(spark):
    # CDC feeds often populate the delete flag only on deletes; a NULL
    # flag must mean "apply the update", not "silently drop it".
    current = spark.createDataFrame([(1, "a", 10.0)], ["k", "s", "v"])
    updates = spark.createDataFrame(
        [(1, "A", 11.0, None)], "k long, s string, v double, del boolean"
    )
    out = merge_upsert(current, updates, "k", delete_col="del").collect()
    assert [(r.k, r.s, r.v) for r in out] == [(1, "A", 11.0)]


def test_time_bucket_negative_epochs_floor(spark):
    df = spark.createDataFrame([(-10,), (-3600,), (-3601,)], ["ts"])
    got = [r[0] for r in df.select(time_bucket("ts", 3600)).collect()]
    assert got == [-3600, -3600, -7200]


def test_interval_bucket_join_rejects_outer(spark):
    df = spark.createDataFrame([(1, 1)], ["a", "b"])
    with pytest.raises(ValueError, match="inner"):
        interval_bucket_join(df, df, "a", "a", "b", 10, how="left")


def test_interval_bucket_join_negative_domain(spark):
    points = spark.createDataFrame(
        [(i, i) for i in range(-50, 50)], ["pid", "x"]
    )
    intervals = spark.createDataFrame([(1, -30, 10)], ["iid", "lo", "hi"])
    out = interval_bucket_join(points, intervals, "x", "lo", "hi", 7)
    assert out.count() == 40  # [-30, 10) inclusive-exclusive


def test_zorder_write_empty_input(spark, tmp_path):
    from corral_spark.sources.layout import write_zorder_clustered

    empty = spark.createDataFrame([], "x int, y int, payload int")
    write_zorder_clustered(empty, f"{tmp_path}/ez", "x", "y", 4)
    assert spark.read.parquet(f"{tmp_path}/ez").count() == 0


def test_profile_table_empty_input_zero_nulls(spark):
    from corral_spark.operators.quality import profile_table

    empty = spark.createDataFrame([], "k long, s string")
    prof = {r.column: r for r in profile_table(empty).collect()}
    assert prof["k"].n_rows == 0 and prof["k"].n_nulls == 0
    assert prof["s"].n_distinct == 0 and prof["s"].min_value is None


def test_file_uri_authority_rejected():
    from corral_spark.mapreduce.api import _strip_file_scheme

    assert _strip_file_scheme("file:///tmp/x") == "/tmp/x"
    assert _strip_file_scheme("/plain/path") == "/plain/path"
    with pytest.raises(ValueError, match="authority"):
        _strip_file_scheme("file://localhost/tmp/x")


def test_driver_main_does_not_accumulate_positional_inputs(spark, tmp_path):
    from corral_spark.mapreduce import Driver, Job, Mapper, Reducer
    from tests.test_mapreduce import read_output

    (tmp_path / "a.txt").write_text("x 1\nx 2\n")
    (tmp_path / "b.txt").write_text("x 3\n")

    class CountAll(Mapper, Reducer):
        def map(self, key, value, emitter):
            emitter.emit("n", "1")

        def reduce(self, key, values, emitter):
            emitter.emit(key, str(sum(1 for _ in values.iter())))

    j = CountAll()
    d = Driver(
        Job(mapper=j, reducer=j), [str(tmp_path / "a.txt")], str(tmp_path),
        spark=spark,
    )
    d.main([str(tmp_path / "b.txt")])
    d.main([str(tmp_path / "b.txt")])  # second run must not double-read
    assert read_output(str(tmp_path)) == {("n", "3")}


# ---------------------------------------------------------------------------
# fuzzy_join depth 2
# ---------------------------------------------------------------------------


def test_fuzzy_join_lev2_complete_vs_brute_force(spark):
    # Adversarial set: chains of single edits, double substitutions,
    # double insertions/deletions, transposition-like swaps, empties,
    # and 1-char strings — every class the depth-2 deletion-
    # neighborhood argument must cover.
    from corral_spark.operators.fuzzy import fuzzy_join

    words = [
        "kitten", "sitten", "sittin", "sitting", "mitten", "kitcen",
        "kitchen", "kit", "kitt", "kittenxy", "ktiten", "itten", "ten",
        "a", "b", "ab", "ba", "", "xy", "x", "abcdef", "abcfed",
    ]
    df = spark.createDataFrame(list(enumerate(words)), ["id", "w"])
    fast = sorted(
        (r.id_a, r.id_b, r.lev)
        for r in fuzzy_join(df, "w", "id", max_dist=2).collect()
    )
    brute = sorted(
        (r.id_a, r.id_b, r.lev)
        for r in df.alias("a")
        .join(df.alias("b"), F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.levenshtein("a.w", "b.w").alias("lev"),
        )
        .filter(F.col("lev") <= 2)
        .collect()
    )
    assert fast == brute and len(fast) > 0


def test_fuzzy_join_lev2_subset_relationship(spark):
    # lev<=1 pairs are exactly the lev<=2 pairs with lev <= 1.
    from corral_spark.operators.fuzzy import fuzzy_join

    words = ["cat", "cut", "cart", "dart", "dark", "bark", "barks"]
    df = spark.createDataFrame(list(enumerate(words)), ["id", "w"])
    lev1 = {(r.id_a, r.id_b) for r in fuzzy_join(df, "w", "id", 1).collect()}
    lev2 = {
        (r.id_a, r.id_b)
        for r in fuzzy_join(df, "w", "id", 2).filter(F.col("lev") <= 1).collect()
    }
    assert lev1 == lev2


# ---------------------------------------------------------------------------
# temperature_sample null-group semantics (r4 advice)
# ---------------------------------------------------------------------------


def test_temperature_sample_null_groups_excluded_from_budget(spark):
    """NULL-group rows are excluded BEFORE the totals are computed:
    with nulls present the non-null groups' rates must be identical to
    running on the null-free subset (previously nulls inflated N and Z
    while still being dropped at the join, silently shrinking the
    effective budget)."""
    from corral_spark.operators.sampling import temperature_sample

    rows = [(i, "en") for i in range(200)] + [(i + 200, "fr") for i in range(40)]
    nulls = [(i + 1000, None) for i in range(400)]
    clean = spark.createDataFrame(rows, "doc_id: long, lang: string")
    dirty = spark.createDataFrame(rows + nulls, "doc_id: long, lang: string")

    kw = dict(alpha=0.3, budget_fraction=0.5)
    got_clean = sorted(
        r.doc_id for r in temperature_sample(clean, "doc_id", "lang", **kw).collect()
    )
    got_dirty = sorted(
        r.doc_id for r in temperature_sample(dirty, "doc_id", "lang", **kw).collect()
    )
    assert got_clean == got_dirty
    assert got_clean, "sample unexpectedly empty"
    assert all(d < 1000 for d in got_dirty), "a NULL-group row leaked through"


def test_fuzzy_scaling_canary_exact_linearity(spark, tmp_path):
    """The bench sf1 fuzzy canary's exactness contract (r10 verdict
    item 4): on the marker-perturbed customer_fuzzy corpus, R
    disjoint replicas must give EXACTLY R x variant_rows and R x
    pairs — within-replica pair sets are isomorphic to replica 0's
    (bijective char rename) and cross-replica lev >= 18 makes
    cross pairs impossible (tools/scale_data.py docstring). R=3
    catches pairwise leaks R=2 could mask; limit keeps it cheap."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from tools.scale_data import scale_fuzzy_customers

    from corral_spark.operators.fuzzy import fuzzy_counts

    d1, d3 = str(tmp_path / "r1"), str(tmp_path / "r3")
    scale_fuzzy_customers(1, d1, limit=1500)
    scale_fuzzy_customers(3, d3, limit=1500)
    c1 = fuzzy_counts(
        spark.read.parquet(d1 + "/customer_fuzzy.parquet"),
        "c_name",
        "c_custkey",
        max_dist=1,
    )
    c3 = fuzzy_counts(
        spark.read.parquet(d3 + "/customer_fuzzy.parquet"),
        "c_name",
        "c_custkey",
        max_dist=1,
    )
    assert c1["pairs"] > 0 and c1["variant_rows"] > 0
    assert c3["variant_rows"] == 3 * c1["variant_rows"]
    assert c3["pairs"] == 3 * c1["pairs"]


def test_fuzzy_join_binary_alphabet_bruteforce(spark):
    """Collision-adversarial complement of the fixed-corpus
    brute-force tests: strings over a 2-letter alphabet (lengths
    0-10, empties included) make deletion variants collide maximally
    — zero-run deletions map many strings onto the same variant key,
    the hot-key regime the shuffle_hash hint and the ids-only join
    exist for. Distilled from a 60/60-trial r11-close fuzz at depths
    1 and 2; fixed seed."""
    import itertools
    import random

    from corral_spark.operators.fuzzy import fuzzy_join

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    rng = random.Random(99)
    for d in (1, 2):
        docs = [
            (i, "".join(rng.choice("ab") for _ in range(rng.randint(0, 10))))
            for i in range(25)
        ]
        df = spark.createDataFrame(docs, ["id", "w"])
        got = {
            (r.id_a, r.id_b, r.lev)
            for r in fuzzy_join(df, "w", "id", max_dist=d).collect()
        }
        want = set()
        for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
            dd = lev(ta, tb)
            if dd <= d:
                want.add((min(ia, ib), max(ia, ib), dd))
        assert got == want, f"depth {d}"
