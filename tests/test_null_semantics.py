"""Pins for the NULL-semantics contracts fixed by the r13
NULL-injection campaign (tools/null_fuzz.py; SCALE.md round-13).

The driver testdata has no NULLs, so these behaviors are invisible to
the gate — each test plants the NULL that diverged in the campaign
and asserts the now-defined semantics directly."""

from __future__ import annotations

from pyspark.sql import functions as F

from corral_spark.operators.asof import asof_join
from corral_spark.operators.merge import (
    apply_agg_delta,
    refresh_affected_groups,
)
from corral_spark.operators.multimodal import assets_from_documents
from corral_spark.operators.similarity import cosine_topk, mmr_topk


def test_agg_delta_null_group_keys_match_null_safely(spark):
    """GROUP BY collects NULL keys into one group; the maintenance
    join must match that group null-safely — a delete against a
    NULL-keyed group used to see snapshot-side 0 and raise."""
    snap = spark.createDataFrame(
        [(None, 2, 30.0), ("A", 3, 60.0)], "g string, n long, s double"
    )
    delta = spark.createDataFrame(
        [(None, 10.0, -1), (None, 20.0, -1)],
        "g string, s double, sign int",
    )
    out = apply_agg_delta(snap, delta, ["g"], ["s"], count_col="n")
    rows = {r.g: (r.n, r.s) for r in out.collect()}
    # NULL group absorbed both deletes -> count 0 -> dropped from view
    assert set(rows) == {"A"}
    assert rows["A"] == (3, 60.0)


def test_agg_delta_null_group_insert_then_query(spark):
    snap = spark.createDataFrame([("A", 1, 5.0)], "g string, n long, s double")
    delta = spark.createDataFrame(
        [(None, 2.5, 1), (None, 2.5, 1)], "g string, s double, sign int"
    )
    out = apply_agg_delta(snap, delta, ["g"], ["s"], count_col="n")
    rows = {r.g: (r.n, r.s) for r in out.collect()}
    assert rows[None] == (2, 5.0) and rows["A"] == (1, 5.0)


def test_refresh_affected_groups_null_key_refreshes(spark):
    """A NULL-keyed touched group must be recomputed and its stale
    snapshot row evicted — the plain semi/anti joins did neither."""
    snap = spark.createDataFrame(
        [(None, 99), ("A", 1)], "g string, mx int"
    )
    base = spark.createDataFrame(
        [(None, 7), (None, 3), ("A", 1)], "g string, v int"
    )
    touched = spark.createDataFrame([(None,)], "g string")

    def agg(df):
        return df.groupBy("g").agg(F.max("v").alias("mx"))

    out = {r.g: r.mx for r in
           refresh_affected_groups(snap, base, touched, ["g"], agg).collect()}
    assert out == {None: 7, "A": 1}  # stale 99 evicted, A untouched


def test_asof_null_keys_use_join_semantics(spark):
    """NULL by-keys and NULL timestamps match NOTHING (the correlated
    subquery spec) — the window implementation used to group NULL
    user_ids together and 'match' them."""
    left = spark.createDataFrame(
        [(1, 10, None), (2, 20, 5), (3, None, 5)],
        "id long, ts long, k long",
    )
    right = spark.createDataFrame(
        [(15, None), (15, 5), (None, 5)], "ts long, k long"
    )
    out = {r.id: r.ts_right for r in
           asof_join(left, right, on="ts", by="k").collect()}
    assert out[1] is None      # NULL key left row: no match
    assert out[2] == 15        # real match (ts 15 <= 20, k = 5)
    assert out[3] is None      # NULL ts left row: no match
    # and the NULL-key / NULL-ts right rows never matched anyone


def test_similarity_ops_drop_null_embeddings(spark):
    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.1], 0),
        (2, None, 0),
        (3, [0.0, 1.0], 0),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    queries = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = cosine_topk(df, queries, k=10).collect()
    assert {r.vec_id for r in got} == {1, 3}  # null vec 2 never appears
    sel = mmr_topk(df, [1.0, 0.0], k=4, lam=0.7, exclude_ids=(0,)).collect()
    assert {r.vec_id for r in sel} == {1, 3}


def test_assets_from_documents_drops_null_text(spark):
    docs = spark.createDataFrame(
        [(1, "abc", "en", "src0", 3), (2, None, "en", "src0", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = assets_from_documents(docs).collect()
    assert [r.asset_id for r in out] == [1]
    assert bytes(out[0].payload) == b"abc"


def test_event_time_windows_drop_null_ts(spark):
    """r14 NULL-plan class 2: an event with a NULL timestamp cannot
    be assigned a window — tumbling/sliding/session builders drop it
    at the operator level so batch and streaming forms agree (the
    watermark convention). Diverged in the r13 campaign: DuckDB's
    date_trunc(NULL) grouped the row under a NULL window while
    Spark's F.window emitted a NULL-struct group."""
    import datetime as dt

    from corral_spark.streaming.ops import (
        session_agg,
        sliding_agg,
        tumbling_agg,
    )

    t0 = dt.datetime(2024, 1, 1, 10, 15)
    events = spark.createDataFrame(
        [
            (1, t0, 7, "click", 1.0, "{}"),
            (2, None, 7, "click", 99.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    tumb = tumbling_agg(events, "1 hour").collect()
    assert len(tumb) == 1 and tumb[0].n_events == 1
    assert tumb[0].sum_value == 1.0  # the NULL-ts 99.0 never aggregates
    slid = sliding_agg(events, "1 hour", "30 minutes").collect()
    assert len(slid) == 2  # one event, exactly two windows
    assert all(r.n_events == 1 for r in slid)
    sess = session_agg(events, "30 minutes").collect()
    assert len(sess) == 1 and sess[0].n_events == 1
