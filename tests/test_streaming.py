"""Streaming <-> batch equivalence: the SAME builder functions run on
a readStream frame (availableNow -> memory sink) must produce exactly
the batch results the DuckDB oracle already gates. Plus the custom
stateful operator and watermark state-bounding behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from corral_spark.sources.tables import load_table
from corral_spark.streaming.ops import (
    read_events_stream,
    run_available_now,
    session_agg,
    sliding_agg,
    stateful_user_totals,
    tumbling_agg,
    with_watermark,
)

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


@pytest.mark.parametrize(
    "builder,cols",
    [
        (tumbling_agg, ["window_start", "event_type", "n_events", "sum_value"]),
        (sliding_agg, ["window_start", "n_events", "sum_value"]),
        (session_agg, ["user_id", "session_start", "session_end", "n_events", "sum_value"]),
    ],
    ids=["tumbling", "sliding", "session"],
)
def test_stream_batch_equivalence(spark, builder, cols):
    batch = builder(load_table(spark, SF, "events"))
    name = f"mem_{builder.__name__}"
    stream = run_available_now(builder(read_events_stream(spark, SF)), name)
    assert _rows(stream, cols) == _rows(batch, cols)


def test_stateful_user_totals_matches_batch(spark):
    events = load_table(spark, SF, "events")
    expected = {
        r.user_id: (r.n, round(r.v, 6))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("v"))
        .collect()
    }
    out = run_available_now(
        stateful_user_totals(read_events_stream(spark, SF)),
        "mem_stateful",
        output_mode="update",
    )
    got = {
        r.user_id: (r.total_events, round(r.total_value, 6))
        for r in out.collect()
    }
    assert got == expected


def test_watermark_attaches_to_plan(spark):
    stream = with_watermark(read_events_stream(spark, SF), "45 minutes")
    agg = tumbling_agg(stream)
    # EventTimeWatermark node must be present in the analyzed plan so
    # the state store can evict windows older than max(ts) - delay.
    assert "watermark" in agg._jdf.queryExecution().analyzed().toString().lower()
    out = run_available_now(agg, "mem_watermarked")
    # availableNow over a single static file: nothing is late, so the
    # watermarked result still matches the batch result.
    batch = tumbling_agg(load_table(spark, SF, "events"))
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_interval_join_stream_matches_batch(spark):
    from corral_spark.streaming.ops import interval_join_stream

    events = load_table(spark, SF, "events")
    batch = interval_join_stream(
        events.filter(F.col("event_type") == "click"),
        events.filter(F.col("event_type") == "purchase"),
    )
    src = read_events_stream(spark, SF)
    stream = run_available_now(
        interval_join_stream(
            src.filter(F.col("event_type") == "click").withWatermark(
                "ts", "1 hour"
            ),
            src.filter(F.col("event_type") == "purchase").withWatermark(
                "ts", "1 hour"
            ),
        ),
        "mem_interval_join",
        output_mode="append",
    )
    cols = ["click_id", "purchase_id", "user_id", "delta_us"]
    assert _rows(stream, cols) == _rows(batch, cols)
    assert stream.count() > 0


def test_dedup_stream_matches_batch_distinct(spark):
    from corral_spark.streaming.ops import dedup_stream

    # Duplicate the source by self-union: every event_id appears twice.
    batch = load_table(spark, SF, "events")
    n_unique = batch.count()
    doubled_stream = read_events_stream(spark, SF).unionByName(
        read_events_stream(spark, SF)
    )
    out = run_available_now(
        dedup_stream(doubled_stream, ["event_id"], within="1 hour"),
        "mem_dedup_stream",
        output_mode="append",
    )
    assert out.count() == n_unique
    assert (
        out.select("event_id").distinct().count() == n_unique
    )


def test_foreach_batch_parquet_sink_roundtrip(spark, tmp_path):
    from corral_spark.streaming.ops import foreach_batch_parquet_sink

    batch = load_table(spark, SF, "events")
    q = foreach_batch_parquet_sink(
        read_events_stream(spark, SF),
        f"{tmp_path}/out",
        f"{tmp_path}/ckpt",
    )
    q.awaitTermination()
    landed = spark.read.parquet(f"{tmp_path}/out")
    assert landed.drop("batch_id").count() == batch.count()
    assert (
        landed.select("event_id").distinct().count()
        == batch.select("event_id").distinct().count()
    )
