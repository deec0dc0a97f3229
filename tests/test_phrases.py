"""Unit tests for operators/phrases.py (iterative phrase-merge
learning) — the r8 verdict's hygiene finding: the module had zero
tests and zero registry consumers. The registry row
(phrase_mining_docs) is additionally oracle-gated by
test_correctness.py's auto-parametrization; these tests pin the
merge-rule semantics on hand cases the corpus can't exercise."""

from __future__ import annotations

import pytest

from corral_spark.operators.phrases import (
    MAX_MERGE_ROUNDS,
    apply_phrases,
    learn_phrases,
)


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], ["text"])


def test_learn_single_merge_hand_case(spark):
    df = _docs(
        spark,
        ["new york city", "new york state", "old york"],
    )
    got = [
        (r.iteration, r.pair, r.cnt)
        for r in learn_phrases(df, k=1).collect()
    ]
    assert got == [(1, "new york", 2)]


def test_learn_chained_merges_and_counts(spark):
    """Round 2 can merge a round-1 phrase token with a neighbor —
    the chained-growth property that makes this BPE-like."""
    df = _docs(spark, ["a b c"] * 5 + ["a b"] * 2)
    got = [
        (r.iteration, r.pair, r.cnt)
        for r in learn_phrases(df, k=2).collect()
    ]
    # round 1: 'a b' occurs 7 times (beats 'b c' at 5);
    # round 2: the merged token chains with c in the 5 long docs.
    assert got == [(1, "a b", 7), (2, "a@b c", 5)]


def test_learn_tie_breaks_by_pair_ascending(spark):
    df = _docs(spark, ["z y", "b a"])
    got = [(r.pair, r.cnt) for r in learn_phrases(df, k=1).collect()]
    assert got == [("b a", 1)]


def test_learn_adjacent_repeat_two_pass_rule(spark):
    """'a a a a' under the two-pass literal rewrite: pass 1 merges
    positions (1,2) and (3,4); pass 2 finds no ' a a ' left — so
    round 1 counts 3 occurrences but rewrites to 'a@a a@a'."""
    df = _docs(spark, ["a a a a"])
    got = [
        (r.iteration, r.pair, r.cnt)
        for r in learn_phrases(df, k=2).collect()
    ]
    assert got[0] == (1, "a a", 3)
    # round 2: the only remaining bigram is 'a@a a@a' (once).
    assert got[1] == (2, "a@a a@a", 1)


def test_learn_stops_when_no_bigrams(spark):
    df = _docs(spark, ["solo", "single"])
    assert learn_phrases(df, k=3).count() == 0


def test_learn_k_cap_raises(spark):
    df = _docs(spark, ["a b"])
    with pytest.raises(ValueError, match="MAX_MERGE_ROUNDS"):
        learn_phrases(df, k=MAX_MERGE_ROUNDS + 1)


def test_apply_phrases_matches_learned_rewrite(spark):
    """apply_phrases with the learned merge list reproduces the
    training-time rewrite: tokenizing fresh text through the merges
    yields the phrased token stream."""
    train = _docs(spark, ["new york city", "new york state", "old york"])
    merges = [r.pair for r in learn_phrases(train, k=2).collect()]
    out = apply_phrases(
        _docs(spark, ["I love New York City!"]), merges
    ).collect()
    assert out[0].phrased == ["i", "love", "new@york@city"]


def test_apply_phrases_empty_merges_is_tokenize(spark):
    out = apply_phrases(_docs(spark, ["Hello, World"]), []).collect()
    assert out[0].phrased == ["hello", "world"]
