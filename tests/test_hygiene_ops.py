"""Unit tests for the wave-4 pretraining-hygiene operators:
benchmark decontamination, repetition stats, unigram log-prob,
groupwise top-k, and trailing range-frame rollups."""

from __future__ import annotations

import math
from datetime import datetime

from pyspark.sql import functions as F

from corral_spark.operators.contamination import (
    decontaminate,
    flag_contaminated,
)
from corral_spark.operators.sketches import grouped_top_k
from corral_spark.operators.textanalysis import (
    repetition_stats,
    unigram_logprob,
)
from corral_spark.operators.timeseries import rolling_range_agg


# ---------------------------------------------------------------------------
# contamination
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_flag_contaminated_counts_distinct_overlapping_grams(spark):
    # Benchmark has one 5-gram "a b c d e" (plus others); doc 1 shares
    # exactly that one, doc 2 shares none, doc 3 (short doc) collides
    # on the whole-text clamp.
    bench = _docs(spark, [(100, "a b c d e f")])  # grams: abcde, bcdef
    cands = _docs(
        spark,
        [
            (1, "x y a b c d e z"),  # contains "a b c d e" once
            (2, "q r s t u v w"),  # clean
            (3, "a b c d e f"),  # identical text -> both grams hit
        ],
    )
    got = {
        r["doc_id"]: r["n_hits"]
        for r in flag_contaminated(cands, bench).collect()
    }
    assert got == {1: 1, 3: 2}


def test_decontaminate_drops_flagged_keeps_clean(spark):
    bench = _docs(spark, [(100, "a b c d e f")])
    cands = _docs(spark, [(1, "x y a b c d e z"), (2, "q r s t u v w")])
    kept = decontaminate(cands, bench)
    assert [r["doc_id"] for r in kept.collect()] == [2]


def test_flag_contaminated_short_docs_use_whole_text_clamp(spark):
    # Docs with <= 5 words shingle to ONE whole-text gram: a 3-word
    # candidate only hits if the benchmark contains the identical
    # 3-word whole-text gram.
    bench = _docs(spark, [(100, "a b c")])
    cands = _docs(spark, [(1, "a b c"), (2, "a b")])
    got = {r["doc_id"]: r["n_hits"] for r in flag_contaminated(cands, bench).collect()}
    assert got == {1: 1}


def test_benchmark_side_is_broadcast(spark):
    bench = _docs(spark, [(100, "a b c d e f")])
    cands = _docs(spark, [(1, "a b c d e f")])
    plan = (
        flag_contaminated(cands, bench)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


# ---------------------------------------------------------------------------
# repetition_stats
# ---------------------------------------------------------------------------


def test_repetition_stats_crafted_values(spark):
    df = _docs(
        spark,
        [
            # words: a a a b  -> top token a (3/4), bigrams: "a a","a a","a b"
            # -> top bigram "a a" (2/3); max run 3.
            (1, "a a a b"),
            # all distinct: fractions 1/4 and 1/3, run 1.
            (2, "w x y z"),
            # single word: no bigrams -> NULL bigram fraction.
            (3, "solo"),
        ],
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    r1 = rows[1]
    assert r1["n_words"] == 4
    assert r1["top_token_fraction"] == 0.75
    assert r1["top_bigram_fraction"] == round(2 / 3, 4)
    assert r1["max_token_run"] == 3
    r2 = rows[2]
    assert r2["top_token_fraction"] == 0.25
    assert r2["top_bigram_fraction"] == round(1 / 3, 4)
    assert r2["max_token_run"] == 1
    r3 = rows[3]
    assert r3["n_words"] == 1
    assert r3["top_token_fraction"] == 1.0
    assert r3["top_bigram_fraction"] is None
    assert r3["max_token_run"] == 1


def test_repetition_stats_mode_not_adjacency(spark):
    # "a b a b a" — top token a appears 3x but never adjacently:
    # the mode count must come from the SORTED array (3/5), while
    # max_token_run stays 1.
    df = _docs(spark, [(1, "a b a b a")])
    r = repetition_stats(df).collect()[0]
    assert r["top_token_fraction"] == 0.6
    assert r["max_token_run"] == 1


# ---------------------------------------------------------------------------
# unigram_logprob
# ---------------------------------------------------------------------------


def test_unigram_logprob_exact_small_corpus(spark):
    # Corpus: doc1 = "a a b", doc2 = "b". Totals: a=2, b=2, N=4.
    # doc1 mean = (ln(1/2)+ln(1/2)+ln(1/2))/3 = ln(0.5);
    # doc2 mean = ln(2/4) = ln(0.5).
    df = _docs(spark, [(1, "a a b"), (2, "b")])
    rows = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    want = round(math.log(0.5), 4)
    assert rows[1]["n_tokens"] == 3
    assert rows[1]["mean_logprob"] == want
    assert rows[2]["n_tokens"] == 1
    assert rows[2]["mean_logprob"] == want


# ---------------------------------------------------------------------------
# grouped_top_k
# ---------------------------------------------------------------------------


def test_grouped_top_k_ranks_and_tiebreak(spark):
    rows = (
        [("en", "the")] * 3
        + [("en", "a")] * 3
        + [("en", "z")] * 1
        + [("fr", "le")] * 2
    )
    df = spark.createDataFrame(rows, ["lang", "term"])
    got = [
        (r["lang"], r["term"], r["cnt"], r["rank"])
        for r in grouped_top_k(df, "lang", "term", k=2)
        .orderBy("lang", "rank")
        .collect()
    ]
    # Tie between "the" and "a" at cnt=3 breaks by term ascending.
    assert got == [("en", "a", 3, 1), ("en", "the", 3, 2), ("fr", "le", 2, 1)]


def test_grouped_top_k_plan_has_window_group_limit(spark):
    from corral_spark.queries import REGISTRY

    plan = (
        REGISTRY["top_tokens_per_lang"]
        .spark(spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # Partial (map-side) + Final group-limit: each task keeps only its
    # local top-k per group before the window exchange.
    assert plan.count("WindowGroupLimit") == 2


# ---------------------------------------------------------------------------
# rolling_range_agg
# ---------------------------------------------------------------------------


def test_rolling_range_agg_trailing_window_and_ties(spark):
    ts = lambda m, s=0: datetime(2024, 1, 1, 12, m, s)  # noqa: E731
    df = spark.createDataFrame(
        [
            (1, 7, ts(0), 1.0),
            (2, 7, ts(30), 2.0),
            # Two events at the SAME timestamp: RANGE peers — each
            # must see the other regardless of row order.
            (3, 7, ts(59), 4.0),
            (4, 7, ts(59), 8.0),
            # Exactly 60 min after event 1: still inside an inclusive
            # 3600s trailing frame.
            (5, 7, datetime(2024, 1, 1, 13, 0), 16.0),
            # Other key: independent state.
            (6, 8, ts(0), 100.0),
        ],
        ["event_id", "user_id", "ts", "value"],
    )
    out = {
        r["event_id"]: (r["n_win"], r["sum_win"])
        for r in rolling_range_agg(df, "user_id", "ts", "value", 3600).collect()
    }
    assert out[1] == (1, 1.0)
    assert out[2] == (2, 3.0)
    assert out[3] == (4, 15.0)  # peers: events 3 and 4 see each other
    assert out[4] == (4, 15.0)
    assert out[5] == (5, 31.0)  # inclusive 1h boundary keeps event 1
    assert out[6] == (1, 100.0)


# ---------------------------------------------------------------------------
# boilerplate hot-set broadcast guard (r4 verdict item 2)
# ---------------------------------------------------------------------------


def test_boilerplate_over_threshold_same_output_no_broadcast(spark):
    """Forcing the hot set over the broadcast threshold
    (broadcast_rows=0) must switch the anti-join to a shuffle plan and
    produce byte-identical output — the guard is a pure physical-plan
    knob, never a semantic one."""
    from corral_spark.operators.dedup import remove_boilerplate_segments

    tpl = "the quick brown fox jumps over the lazy dog again"  # 10 words
    rows = [(i, tpl + f" unique words only here doc {i} tail piece pad x")
            for i in range(8)] + [(100, "totally novel text with no shared segment")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    kw = dict(text_col="text", id_col="doc_id", seg_words=10, max_df=2)
    base = remove_boilerplate_segments(df, **kw)
    forced = remove_boilerplate_segments(df, **kw, broadcast_rows=0)

    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, forced.collect())
    )
    # The shared template segment really was dropped from every doc.
    got = {r.doc_id: r for r in base.collect()}
    assert all(tpl not in got[i].clean_text for i in range(8))
    assert got[100].n_kept == got[100].n_total
    # Over-threshold the guard must emit NO broadcast hint: with AQE's
    # runtime size-based conversion off (at 100 TB the hot set would
    # exceed that threshold anyway), the anti-join must plan as a
    # shuffle join. The default path must still carry the hint.
    conv = "spark.sql.adaptive.autoBroadcastJoinThreshold"
    auto = "spark.sql.autoBroadcastJoinThreshold"
    spark.conf.set(conv, "-1")
    spark.conf.set(auto, "-1")
    try:
        plan = (
            remove_boilerplate_segments(df, **kw, broadcast_rows=0)
            ._jdf.queryExecution().executedPlan().toString()
        )
        anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
        assert anti and all("Broadcast" not in ln for ln in anti), plan
        plan_b = (
            remove_boilerplate_segments(df, **kw)
            ._jdf.queryExecution().executedPlan().toString()
        )
        anti_b = [ln for ln in plan_b.splitlines() if "LeftAnti" in ln]
        assert anti_b and all("Broadcast" in ln for ln in anti_b), plan_b
    finally:
        spark.conf.unset(conv)
        spark.conf.unset(auto)


# ---------------------------------------------------------------------------
# sliding-gram substring dedup & per-source cap (round-5 additions)
# ---------------------------------------------------------------------------


def test_sliding_gram_dedup_crafted(spark):
    """Crafted semantics: an unaligned repeat of an earlier doc's
    window is removed even mid-document; a token survives if ANY
    covering window is a global first occurrence; short docs are
    untouched."""
    from corral_spark.operators.dedup import sliding_gram_dedup

    d1 = "a b c d"                       # first occurrence of 'a b c d'
    d2 = "x a b c d y"                   # repeat shifted by 1, flanked
    d3 = "p q"                           # shorter than k -> untouched
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], ["doc_id", "text"]
    )
    out = {
        r.doc_id: r
        for r in sliding_gram_dedup(df, "text", "doc_id", k=4).collect()
    }
    # doc 1 owns the first occurrence: fully kept.
    assert out[1].clean_text == d1 and out[1].n_kept == 4
    # doc 2: windows are 'x a b c', 'a b c d' (dup), 'b c d y'.
    # 'a b c d' is a dup, but every one of its tokens is also covered
    # by a first-occurrence window ('x a b c' covers a,b,c; 'b c d y'
    # covers b,c,d) -> nothing removable.
    assert out[2].clean_text == d2 and out[2].n_kept == 6
    # doc 3: no window covers it.
    assert out[3].clean_text == d3 and out[3].n_kept == 2

    # A pure unflanked repeat IS removed wholesale.
    df2 = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h")],
        ["doc_id", "text"],
    )
    out2 = {
        r.doc_id: r
        for r in sliding_gram_dedup(df2, "text", "doc_id", k=4).collect()
    }
    assert out2[1].n_kept == 8
    assert out2[2].n_kept == 0 and out2[2].clean_text == ""


def test_cap_per_group_deterministic_and_plan(spark):
    from corral_spark.operators.sampling import cap_per_group

    rows = [(i, f"s{i % 3}") for i in range(90)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = cap_per_group(df, "source", "doc_id", cap=5)
    got = sorted(r.doc_id for r in out.collect())
    assert len(got) == 15
    assert got == sorted(r.doc_id for r in out.collect())  # stable
    per = out.groupBy("source").count().collect()
    assert all(r["count"] == 5 for r in per)
    # Hot groups must not serialize through one task: the rank bound
    # is pushed below the exchange (WindowGroupLimit).
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
