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


def test_interval_join_left_outer_restart_equivalence(spark, tmp_path):
    """r4 verdict item 7: the stateful op most sensitive to watermark
    replay — a left_outer stream-stream interval join — stopped after
    the first file and restarted from its checkpoint must emit exactly
    the single-run output: the inner match once, the proven-unmatched
    click null-padded once, and the still-withheld tail clicks never.
    A checkpoint that dropped join/watermark state would either lose
    the pending outer row or re-emit the inner match."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from datetime import datetime

    from corral_spark.streaming.ops import interval_join_stream

    src_dir = tmp_path / "ev"
    src_dir.mkdir()

    def _write(name, rows, mtime):
        ids, users, types, tss = zip(*rows)
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(ids, pa.int64()),
                    "user_id": pa.array(users, pa.int64()),
                    "event_type": pa.array(types, pa.string()),
                    "ts": pa.array(list(tss), pa.timestamp("us")),
                }
            ),
            str(src_dir / name),
        )
        os.utime(src_dir / name, (mtime, mtime))

    d = lambda h, m: datetime(2026, 1, 1, h, m)  # noqa: E731

    def run_once(sink, ckpt):
        src = (
            spark.readStream.schema(
                "event_id long, user_id long, event_type string, ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir))
        )
        q = (
            interval_join_stream(
                src.filter(F.col("event_type") == "click").withWatermark(
                    "ts", "10 minutes"
                ),
                src.filter(F.col("event_type") == "purchase").withWatermark(
                    "ts", "10 minutes"
                ),
                how="left_outer",
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    # Run 1: matched click 1 / unmatched click 2 / purchase 3 only.
    _write(
        "f1.parquet",
        [
            (1, 1, "click", d(10, 0)),
            (2, 2, "click", d(10, 5)),
            (3, 1, "purchase", d(10, 30)),
        ],
        1_000_000,
    )
    run_once(sink, ckpt)

    # Query down; late files land. Both sentinel files carry BOTH
    # event types (the global watermark is the min over sides), f2
    # advances the watermark past click2_ts + 1h, f3 makes the
    # eviction observable.
    time.sleep(1.1)
    _write(
        "f2.parquet",
        [(90, 9, "click", d(20, 0)), (80, 8, "purchase", d(20, 0))],
        1_000_010,
    )
    _write(
        "f3.parquet",
        [(91, 9, "click", d(20, 1)), (81, 8, "purchase", d(20, 1))],
        1_000_020,
    )
    run_once(sink, ckpt)  # restart from checkpoint

    got = sorted(
        (r.click_id, r.purchase_id)
        for r in spark.read.parquet(sink).collect()
    )
    # Identical to the single-run output pinned by
    # test_interval_join_stream_left_outer_emits_null_rows: (1,3)
    # inner exactly once, (2,None) outer exactly once, 90/91 withheld.
    assert got == [(1, 3), (2, None)]

    # Third restart with no new data: still exactly-once.
    run_once(sink, ckpt)
    got2 = sorted(
        (r.click_id, r.purchase_id)
        for r in spark.read.parquet(sink).collect()
    )
    assert got2 == [(1, 3), (2, None)]


def test_streaming_upsert_sink_restart_and_replay(spark, tmp_path):
    """CDC upsert sink: inserts in run 1; updates + a delete landing
    while the query is down must merge on restart from the checkpoint;
    a third restart with no data changes nothing. Snapshot versioning
    makes a replayed batch rebuild from its predecessor, so the final
    table equals the batch-merge of all events exactly once."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from corral_spark.streaming.ops import (
        foreach_batch_upsert_sink,
        read_upsert_snapshot,
    )

    src = tmp_path / "cdc"
    src.mkdir()
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    def _write(name, rows):
        ks, vs, dels = zip(*rows)
        pq.write_table(
            pa.table(
                {
                    "k": pa.array(ks, pa.int64()),
                    "v": pa.array(vs, pa.string()),
                    "is_delete": pa.array(dels, pa.bool_()),
                }
            ),
            str(src / name),
        )

    def run_once():
        stream = spark.readStream.schema(
            "k long, v string, is_delete boolean"
        ).parquet(str(src))
        q = foreach_batch_upsert_sink(
            stream, table, ckpt, "k", delete_col="is_delete"
        )
        q.awaitTermination()

    _write("b1.parquet", [(1, "a", False), (2, "b", False), (3, "c", False)])
    run_once()
    snap1 = {r.k: r.v for r in read_upsert_snapshot(spark, table).collect()}
    assert snap1 == {1: "a", 2: "b", 3: "c"}

    time.sleep(1.1)
    _write("b2.parquet", [(2, "B", False), (3, None, True), (4, "d", False)])
    run_once()
    snap2 = {r.k: r.v for r in read_upsert_snapshot(spark, table).collect()}
    assert snap2 == {1: "a", 2: "B", 4: "d"}  # updated, deleted, inserted

    run_once()  # no new data: snapshot unchanged
    snap3 = {r.k: r.v for r in read_upsert_snapshot(spark, table).collect()}
    assert snap3 == snap2


def test_streaming_upsert_incremental_touches_only_owned_buckets(
    spark, tmp_path
):
    """r5 verdict item 2: a batch touching 1 of N buckets must rewrite
    ONLY that bucket — every other bucket's files stay byte-identical
    (they are not even copied: the new manifest keeps pointing at the
    version directory that wrote them)."""
    import hashlib
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from corral_spark.streaming.ops import (
        foreach_batch_upsert_sink,
        read_upsert_snapshot,
    )

    src = tmp_path / "cdc"
    src.mkdir()
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    def _write(name, rows):
        ks, vs = zip(*rows)
        pq.write_table(
            pa.table(
                {"k": pa.array(ks, pa.int64()), "v": pa.array(vs, pa.string())}
            ),
            str(src / name),
        )

    def run_once():
        stream = spark.readStream.schema("k long, v string").parquet(str(src))
        q = foreach_batch_upsert_sink(stream, table, ckpt, "k", n_buckets=8)
        q.awaitTermination()

    _write("b1.parquet", [(i, f"v{i}") for i in range(200)])
    run_once()

    def _digest(root):
        out = {}
        for dirpath, _dirs, files in os.walk(root):
            for fn in files:
                p = os.path.join(dirpath, fn)
                with open(p, "rb") as f:
                    out[os.path.relpath(p, root)] = hashlib.md5(
                        f.read()
                    ).hexdigest()
        return out

    v0 = os.path.join(table, "v=0")
    before = _digest(v0)
    with open(os.path.join(v0, "manifest.json")) as f:
        m0 = json.load(f)
    assert m0["n_buckets"] == 8 and len(m0["buckets"]) == 8

    time.sleep(1.1)
    _write("b2.parquet", [(7, "UPDATED")])
    run_once()

    # v=0 files untouched, byte for byte.
    assert _digest(v0) == before

    v1 = os.path.join(table, "v=1")
    written = [d for d in os.listdir(v1) if d.startswith("__bucket=")]
    assert len(written) == 1, f"batch of one key rewrote {written}"
    touched_bucket = written[0].split("=", 1)[1]
    with open(os.path.join(v1, "manifest.json")) as f:
        m1 = json.load(f)
    assert m1["buckets"][touched_bucket] == 1
    others = {b: v for b, v in m1["buckets"].items() if b != touched_bucket}
    assert len(others) == 7 and set(others.values()) == {0}

    snap = {r.k: r.v for r in read_upsert_snapshot(spark, table).collect()}
    want = {i: f"v{i}" for i in range(200)}
    want[7] = "UPDATED"
    assert snap == want


def test_streaming_upsert_bucket_emptied_by_deletes_drops_from_manifest(
    spark, tmp_path
):
    """A delete batch that empties an entire bucket must drop that
    bucket from the new manifest (an empty merge result writes no
    directory) — the reader never points at a missing path."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from corral_spark.streaming.ops import (
        foreach_batch_upsert_sink,
        read_upsert_snapshot,
    )

    nb = 4
    keys = list(range(40))
    bucket_of = {
        r["k"]: r["b"]
        for r in spark.createDataFrame([(k,) for k in keys], "k long")
        .select(
            "k",
            F.pmod(F.xxhash64(F.col("k").cast("string")), F.lit(nb))
            .cast("int")
            .alias("b"),
        )
        .collect()
    }
    target = 0
    victims = [k for k in keys if bucket_of[k] == target]
    assert victims, "no keys landed in bucket 0"

    src = tmp_path / "cdc"
    src.mkdir()
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    def _write(name, rows):
        ks, vs, dels = zip(*rows)
        pq.write_table(
            pa.table(
                {
                    "k": pa.array(ks, pa.int64()),
                    "v": pa.array(vs, pa.string()),
                    "is_delete": pa.array(dels, pa.bool_()),
                }
            ),
            str(src / name),
        )

    def run_once():
        stream = spark.readStream.schema(
            "k long, v string, is_delete boolean"
        ).parquet(str(src))
        q = foreach_batch_upsert_sink(
            stream, table, ckpt, "k", delete_col="is_delete", n_buckets=nb
        )
        q.awaitTermination()

    _write("b1.parquet", [(k, f"v{k}", False) for k in keys])
    run_once()
    time.sleep(1.1)
    _write("b2.parquet", [(k, None, True) for k in victims])
    run_once()

    with open(os.path.join(table, "v=1", "manifest.json")) as f:
        m1 = json.load(f)
    assert str(target) not in m1["buckets"], m1
    snap = {r.k for r in read_upsert_snapshot(spark, table).collect()}
    assert snap == set(keys) - set(victims)


def test_streaming_upsert_migrates_legacy_manifestless_snapshot(
    spark, tmp_path
):
    """Upgrade path (round-6 review finding): a table whose newest
    version predates the manifest layout (plain full-snapshot dir, no
    manifest.json) must be MIGRATED by the next batch — read whole,
    rewritten bucketed — never treated as debris and silently
    dropped."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from corral_spark.streaming.ops import (
        foreach_batch_upsert_sink,
        read_upsert_snapshot,
    )

    src = tmp_path / "cdc"
    src.mkdir()
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    def _write(name, rows):
        ks, vs = zip(*rows)
        pq.write_table(
            pa.table(
                {"k": pa.array(ks, pa.int64()), "v": pa.array(vs, pa.string())}
            ),
            str(src / name),
        )

    def run_once():
        stream = spark.readStream.schema("k long, v string").parquet(str(src))
        q = foreach_batch_upsert_sink(stream, table, ckpt, "k", n_buckets=4)
        q.awaitTermination()

    # Batch 0 lays down v=0 normally; degrade it to a GENUINE legacy
    # layout — plain full-snapshot parquet, no manifest, no __bucket=
    # partition dirs — simulating a table written by the pre-manifest
    # (round-5) sink whose checkpoint carries on. (Merely dropping the
    # manifest is no longer enough: a manifest-less dir that still has
    # bucket partitions is indistinguishable from crash debris and the
    # migration guard refuses it — see
    # test_legacy_migration_refuses_new_layout_debris.)
    _write("b1.parquet", [(i, f"v{i}") for i in range(20)])
    run_once()
    import shutil

    v0 = os.path.join(table, "v=0")
    legacy_rows = [
        (r.k, r.v)
        for r in spark.read.parquet(v0).select("k", "v").collect()
    ]
    shutil.rmtree(v0)
    spark.createDataFrame(legacy_rows, "k long, v string").coalesce(
        1
    ).write.parquet(v0)

    time.sleep(1.1)
    _write("b2.parquet", [(7, "UPDATED"), (100, "NEW")])
    run_once()

    # Migration rewrote every bucket under v=1 and committed a full
    # manifest; no key from the legacy snapshot was lost.
    with open(os.path.join(table, "v=1", "manifest.json")) as f:
        m1 = json.load(f)
    assert set(m1["buckets"].values()) == {1}
    snap = {r.k: r.v for r in read_upsert_snapshot(spark, table).collect()}
    want = {i: f"v{i}" for i in range(20)}
    want[7], want[100] = "UPDATED", "NEW"
    assert snap == want


def test_read_upsert_snapshot_legacy_and_all_deleted_states(
    spark, tmp_path
):
    """Reader edge states (round-6 review findings): a pre-manifest
    table reads via the newest plain version dir; an all-keys-deleted
    snapshot (committed manifest, empty bucket map) reads as an EMPTY
    frame with the recorded schema — neither raises."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from corral_spark.streaming.ops import (
        foreach_batch_upsert_sink,
        read_upsert_snapshot,
    )

    legacy = tmp_path / "legacy_table" / "v=3"
    legacy.mkdir(parents=True)
    pq.write_table(
        pa.table({"k": pa.array([1, 2], pa.int64())}), str(legacy / "p.parquet")
    )
    got = sorted(
        r.k for r in read_upsert_snapshot(spark, str(tmp_path / "legacy_table")).collect()
    )
    assert got == [1, 2]

    src = tmp_path / "cdc"
    src.mkdir()
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    def _write(name, rows):
        ks, vs, dels = zip(*rows)
        pq.write_table(
            pa.table(
                {
                    "k": pa.array(ks, pa.int64()),
                    "v": pa.array(vs, pa.string()),
                    "is_delete": pa.array(dels, pa.bool_()),
                }
            ),
            str(src / name),
        )

    def run_once():
        stream = spark.readStream.schema(
            "k long, v string, is_delete boolean"
        ).parquet(str(src))
        q = foreach_batch_upsert_sink(
            stream, table, ckpt, "k", delete_col="is_delete", n_buckets=4
        )
        q.awaitTermination()

    _write("b1.parquet", [(1, "a", False), (2, "b", False)])
    run_once()
    time.sleep(1.1)
    _write("b2.parquet", [(1, None, True), (2, None, True)])
    run_once()

    snap = read_upsert_snapshot(spark, table)
    assert snap.count() == 0
    assert set(snap.columns) == {"k", "v"}


def test_streaming_upsert_random_batch_sequence_equals_fold(
    spark, tmp_path
):
    """Randomized (seeded) end-to-end equivalence: N sequential CDC
    batches of mixed upserts/deletes over a small key space, applied
    through the incremental bucketed sink across N separate stream
    restarts, must equal the in-memory fold of the MERGE semantics
    (update-over-insert-over-carry, tombstone deletes). Catches any
    manifest/bucket bookkeeping error a hand-picked scenario misses."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from corral_spark.streaming.ops import (
        foreach_batch_upsert_sink,
        read_upsert_snapshot,
    )

    rng = random.Random(0xC0FFEE)
    src = tmp_path / "cdc"
    src.mkdir()
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = spark.readStream.schema(
            "k long, v string, is_delete boolean"
        ).parquet(str(src))
        q = foreach_batch_upsert_sink(
            stream, table, ckpt, "k", delete_col="is_delete", n_buckets=4
        )
        q.awaitTermination()

    expected: dict[int, str] = {}
    for b in range(5):
        ops = []
        for k in rng.sample(range(30), rng.randint(1, 12)):
            if k in expected and rng.random() < 0.3:
                ops.append((k, None, True))
                del expected[k]
            else:
                val = f"b{b}k{k}"
                ops.append((k, val, False))
                expected[k] = val
        ks, vs, dels = zip(*ops)
        pq.write_table(
            pa.table(
                {
                    "k": pa.array(ks, pa.int64()),
                    "v": pa.array(vs, pa.string()),
                    "is_delete": pa.array(dels, pa.bool_()),
                }
            ),
            str(src / f"batch{b}.parquet"),
        )
        run_once()
        time.sleep(1.1)
        snap = {
            r.k: r.v for r in read_upsert_snapshot(spark, table).collect()
        }
        assert snap == expected, f"divergence after batch {b}"


def test_streaming_upsert_nonatomic_fs_crash_replay(spark, tmp_path):
    """r6 verdict item 6: on an object store without atomic rename the
    commit switches to the marker-file protocol (manifest PUT, then an
    atomic zero-byte _COMMITTED PUT). Inject a non-atomic fake FS that
    crashes BETWEEN the two writes: the half-committed version must
    stay invisible to readers (last committed snapshot still served),
    and restarting the stream must replay the batch from the
    checkpoint, overwrite the debris, and commit — exactly once."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from corral_spark.streaming.ops import (
        COMMIT_MARKER,
        PosixTableFS,
        foreach_batch_upsert_sink,
        read_upsert_snapshot,
    )

    import os

    class NonAtomicFS(PosixTableFS):
        atomic_rename = False

        def __init__(self):
            self.crash_on_marker = False

        def put_text(self, path, data):
            if self.crash_on_marker and path.endswith(COMMIT_MARKER):
                raise RuntimeError("simulated crash before commit marker")
            super().put_text(path, data)

    fs = NonAtomicFS()
    src = tmp_path / "cdc"
    src.mkdir()
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")

    def _write(name, rows):
        ks, vs, dels = zip(*rows)
        pq.write_table(
            pa.table(
                {
                    "k": pa.array(ks, pa.int64()),
                    "v": pa.array(vs, pa.string()),
                    "is_delete": pa.array(dels, pa.bool_()),
                }
            ),
            str(src / name),
        )

    def run_once():
        stream = spark.readStream.schema(
            "k long, v string, is_delete boolean"
        ).parquet(str(src))
        q = foreach_batch_upsert_sink(
            stream, table, ckpt, "k", delete_col="is_delete", fs=fs
        )
        q.awaitTermination()

    _write("b1.parquet", [(1, "a", False), (2, "b", False)])
    run_once()
    assert os.path.isfile(f"{table}/v=0/{COMMIT_MARKER}")  # marker commit
    snap1 = {r.k: r.v for r in read_upsert_snapshot(spark, table, fs=fs).collect()}
    assert snap1 == {1: "a", 2: "b"}

    time.sleep(1.1)
    _write("b2.parquet", [(2, "B", False), (3, "c", False)])
    fs.crash_on_marker = True
    import pytest as _pytest

    with _pytest.raises(Exception):
        run_once()  # crash after manifest PUT, before marker PUT
    # Half-committed: manifest exists, marker does not -> invisible.
    assert os.path.isfile(f"{table}/v=1/manifest.json")
    assert not os.path.isfile(f"{table}/v=1/{COMMIT_MARKER}")
    snap_mid = {
        r.k: r.v for r in read_upsert_snapshot(spark, table, fs=fs).collect()
    }
    assert snap_mid == snap1, "uncommitted version must be invisible"

    fs.crash_on_marker = False
    run_once()  # checkpoint did not advance: batch replays, commits
    snap2 = {r.k: r.v for r in read_upsert_snapshot(spark, table, fs=fs).collect()}
    assert snap2 == {1: "a", 2: "B", 3: "c"}
    assert os.path.isfile(f"{table}/v=1/{COMMIT_MARKER}")


def test_legacy_migration_refuses_new_layout_debris(spark, tmp_path):
    """ADVICE r6: a manifest-less version dir containing __bucket=
    partition subdirectories is an UNCOMMITTED new-layout version
    (crash debris after checkpoint loss), not a genuine pre-manifest
    full snapshot — both the reader's legacy fallback and the sink's
    migration path must refuse it loudly instead of committing a
    truncated table."""
    import pytest as _pytest

    from corral_spark.streaming.ops import (
        _assert_genuine_legacy,
        read_upsert_snapshot,
    )  # noqa: F401

    table = tmp_path / "table"
    debris = table / "v=3" / "__bucket=0"
    debris.mkdir(parents=True)
    spark.range(2).selectExpr("id as k", "cast(id as string) as v").coalesce(
        1
    ).write.mode("overwrite").parquet(str(debris))

    with _pytest.raises(RuntimeError, match="refusing migration"):
        _assert_genuine_legacy(str(table), 3)
    with _pytest.raises(RuntimeError, match="refusing migration"):
        read_upsert_snapshot(spark, str(table))


def test_streaming_rollup_sink_restart_and_retraction(spark, tmp_path):
    """Rollup-maintenance sink: batch 1 builds the COUNT/SUM rollup;
    batch 2 (after the query was down) retracts some rows (-1) and
    inserts others; a third run with no data changes nothing. Each
    state must equal a full recompute over the surviving base rows —
    exactly-once across restarts via the versioned manifest commit."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from corral_spark.streaming.ops import (
        foreach_batch_rollup_sink,
        read_rollup_snapshot,
    )

    src = tmp_path / "delta"
    src.mkdir()
    table = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    def _write(name, rows):
        gs, xs, ss = zip(*rows)
        pq.write_table(
            pa.table(
                {
                    "g": pa.array(gs, pa.int64()),
                    "x": pa.array(xs, pa.int64()),
                    "sign": pa.array(ss, pa.int32()),
                }
            ),
            str(src / name),
        )

    def run_once():
        stream = spark.readStream.schema(
            "g long, x long, sign int"
        ).parquet(str(src))
        q = foreach_batch_rollup_sink(
            stream, table, ckpt, ["g"], ["x"], sign_col="sign"
        )
        q.awaitTermination()

    b1 = [(1, 10, 1), (1, 20, 1), (2, 5, 1), (2, 7, 1), (3, 100, 1)]
    _write("b1.parquet", b1)
    run_once()
    snap1 = {
        r.g: (r.n, r.x) for r in read_rollup_snapshot(spark, table).collect()
    }
    assert snap1 == {1: (2, 30), 2: (2, 12), 3: (1, 100)}

    time.sleep(1.1)
    # Retract one row of group 1, ALL of group 3, insert into group 4.
    b2 = [(1, 20, -1), (3, 100, -1), (4, 9, 1)]
    _write("b2.parquet", b2)
    run_once()
    snap2 = {
        r.g: (r.n, r.x) for r in read_rollup_snapshot(spark, table).collect()
    }
    assert snap2 == {1: (1, 10), 2: (2, 12), 4: (1, 9)}  # 3 vanished

    run_once()  # no new data
    snap3 = {
        r.g: (r.n, r.x) for r in read_rollup_snapshot(spark, table).collect()
    }
    assert snap3 == snap2


def test_streaming_rollup_append_only_defaults_to_inserts(spark, tmp_path):
    """Without sign_col every batch row is a +1 insert — the plain
    streaming-aggregation shape, maintained incrementally."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from corral_spark.streaming.ops import (
        foreach_batch_rollup_sink,
        read_rollup_snapshot,
    )

    src = tmp_path / "delta"
    src.mkdir()
    pq.write_table(
        pa.table(
            {
                "g": pa.array([1, 1, 2], pa.int64()),
                "x": pa.array([3, 4, 5], pa.int64()),
            }
        ),
        str(src / "b1.parquet"),
    )
    stream = spark.readStream.schema("g long, x long").parquet(str(src))
    q = foreach_batch_rollup_sink(
        stream,
        str(tmp_path / "rollup"),
        str(tmp_path / "ckpt"),
        ["g"],
        ["x"],
    )
    q.awaitTermination()
    snap = {
        r.g: (r.n, r.x)
        for r in read_rollup_snapshot(
            spark, str(tmp_path / "rollup")
        ).collect()
    }
    assert snap == {1: (2, 7), 2: (1, 5)}
