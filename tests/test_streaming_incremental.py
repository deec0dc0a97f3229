"""Incremental streaming semantics across multiple micro-batches
(maxFilesPerTrigger=1, out-of-order file arrival).

What the watermark actually guarantees (and what we assert): STATE IS
BOUNDED — windows older than watermark are evicted after emission, so
state size tracks the lateness bound, not stream length. Dropping of
late input is best-effort in Spark (observed: rows for already-
finalized windows are aggregated and emitted immediately rather than
silently discarded), so tests must not assert dropping."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from corral_spark.sources.tables import load_table
from corral_spark.streaming.ops import tumbling_agg

SF = "/root/testdata/sf0.001"


def test_watermark_bounds_state_across_batches(spark, tmp_path):
    events = load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    lo, hi = events.agg(F.min("ts"), F.max("ts")).collect()[0]
    mid = lo + (hi - lo) / 2
    newer = events.filter(F.col("ts") >= F.lit(mid))
    older = events.filter(F.col("ts") < F.lit(mid))

    # Newer file lands first (earlier mtime) so the watermark is far
    # ahead when the older file arrives in batch 2.
    src = tmp_path / "stream_src"
    newer.coalesce(1).write.parquet(str(src / "newer"))
    time.sleep(1.1)  # distinct mtimes -> deterministic batch order
    older.coalesce(1).write.parquet(str(src / "older"))

    stream = (
        spark.readStream.schema(newer.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    # Streaming half of the event-time contract (r14): watermarks
    # REQUIRE TIMESTAMP, so map the NTZ wall clock to wall-as-UTC
    # instants exactly like streaming.ops.read_events_stream.
    stream = stream.withColumn(
        "ts",
        F.expr(
            "CAST(convert_timezone('UTC', current_timezone(), ts)"
            " AS TIMESTAMP)"
        ),
    )
    agg = tumbling_agg(stream.withWatermark("ts", "1 hour"))
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_state")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    progress = [p for p in q.recentProgress if p["stateOperators"]]
    assert len(progress) >= 2, "maxFilesPerTrigger must yield one batch per file"

    # Watermark advanced after the first (newer-data) batch.
    wm_batch2 = progress[1]["eventTime"].get("watermark")
    assert wm_batch2 and wm_batch2.startswith("2024"), wm_batch2

    # THE guarantee: state after the late batch holds only the windows
    # newer than the watermark (the 1h lateness bound), not the
    # hundreds of historical windows that passed through.
    n_windows_total = tumbling_agg(events).count()
    final_state_rows = progress[-1]["stateOperators"][0]["numRowsTotal"]
    assert final_state_rows <= 10 < n_windows_total

    # Append mode withholds only unfinalized windows; everything
    # emitted is a complete, correct window of its batch's input.
    emitted = spark.sql("SELECT count(*) AS n FROM wm_state").collect()[0].n
    assert emitted <= n_windows_total
