"""Checkpointed streaming restart: a file-sink query stopped and
restarted with the same checkpoint must process each input file
exactly once — no duplicated or lost rows. This is the fault-
tolerance story the reference approximates with task retries
(reference corlambda/client.go:267-276); Spark's checkpoint +
idempotent sink gives end-to-end exactly-once."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from corral_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_restart_with_checkpoint_is_exactly_once(spark, tmp_path):
    events = load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    half1 = events.filter(F.col("event_id") % 2 == 0)
    half2 = events.filter(F.col("event_id") % 2 == 1)

    src = tmp_path / "src"
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    half1.coalesce(1).write.parquet(str(src / "batch1"))

    def run_once():
        stream = spark.readStream.schema(events.schema).parquet(f"{src}/*")
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # First run: processes batch1, then stops (availableNow).
    run_once()
    n1 = spark.read.parquet(sink).count()
    assert n1 == half1.count()

    # New data lands while the query is down; restart from checkpoint.
    time.sleep(1.1)
    half2.coalesce(1).write.parquet(str(src / "batch2"))
    run_once()

    out = spark.read.parquet(sink)
    assert out.count() == events.count(), "no loss, no duplication"
    assert out.select("event_id").distinct().count() == events.count()

    # Third restart with NO new data: a no-op, still no duplication.
    run_once()
    assert spark.read.parquet(sink).count() == events.count()
