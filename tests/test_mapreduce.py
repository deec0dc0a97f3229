"""Port of the reference's end-to-end MapReduce goldens
(reference driver_test.go:82-153, 188-219) plus unit goldens for
record parsing (job_test.go:9-27) and the FNV-64a partitioner
(emitter_test.go:25-28)."""

from __future__ import annotations

import os

import pytest

from corral_spark.mapreduce import (
    Driver,
    Emitter,
    Job,
    Mapper,
    MultiStageDriver,
    Reducer,
    fnv64a_partition,
)
from corral_spark.mapreduce.api import _parse_kv_line


class WCMapper(Mapper):
    # reference driver_test.go:32-36: split on whitespace, emit (word, "1")
    def map(self, key, value, emitter):
        for word in value.split():
            emitter.emit(word, "1")


class WCReducer(Reducer):
    def reduce(self, key, values, emitter):
        emitter.emit(key, str(sum(1 for _ in values.iter())))


class PrefixFilter(Mapper, Reducer):
    # reference driver_test.go:46-61
    def __init__(self, prefix):
        self.prefix = prefix

    def map(self, key, value, emitter):
        if key.startswith(self.prefix):
            emitter.emit(key, value)

    def reduce(self, key, values, emitter):
        for v in values.iter():
            emitter.emit(key, v)


def read_output(path_dir: str) -> set[tuple[str, str]]:
    pairs = set()
    for fname in os.listdir(path_dir):
        if fname.startswith("output-part-"):
            with open(os.path.join(path_dir, fname)) as f:
                for line in f:
                    line = line.rstrip("\n")
                    parts = line.split("\t")
                    if len(parts) == 2:
                        pairs.add((parts[0], parts[1]))
    return pairs


def test_parse_kv_line_reference_goldens():
    # reference job_test.go:9-27
    assert _parse_kv_line("foo\tbar") == ("foo", "bar")
    assert _parse_kv_line("foo bar") == ("", "foo bar")
    assert _parse_kv_line("foo\tbar\tbaz") == ("", "foo\tbar\tbaz")
    assert _parse_kv_line("") == ("", "")
    assert _parse_kv_line("\t") == ("", "")


def test_fnv64a_partition_reference_golden():
    # reference emitter_test.go:25-28: hashPartition("foo", 100) == 0x63
    assert fnv64a_partition("foo", 100) == 0x63


def test_emitter_concurrent_emit_thread_safety():
    """Twin of reference emitter_test.go:45-71
    (TestReducerEmitterThreadSafety): 10 threads emitting through ONE
    emitter must each land exactly one intact record — no torn or
    lost emissions. The reference guards a shared writer with a
    mutex; the facade's per-task Emitter relies on list.append being
    atomic in CPython, which this pins against regressions (e.g. a
    future buffered/str-concat emitter would need its own lock).
    Spark itself never shares an emitter across tasks (one per
    mapPartitions task), but user Reducer code may spawn threads —
    the reference contract covers that, so the facade must too."""
    import threading

    emitter = Emitter()
    barrier = threading.Barrier(10)

    def worker(key: int) -> None:
        barrier.wait()  # maximize real interleaving
        for _ in range(1000):
            emitter.emit(str(key), "value")

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(10)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert len(emitter.pairs) == 10_000
    from collections import Counter

    counts = Counter(emitter.pairs)
    assert counts == {(str(i), "value"): 1000 for i in range(10)}


def test_local_mapreduce_wordcount(spark, tmp_path):
    # reference driver_test.go:82-116
    (tmp_path / "test_input").write_text("the test input\nthe input test\nfoo bar baz")
    job = Job(WCMapper(), WCReducer())
    Driver(job, [str(tmp_path / "test_input")], str(tmp_path), spark=spark).main()
    pairs = read_output(str(tmp_path))
    assert pairs == {
        ("the", "2"),
        ("test", "2"),
        ("input", "2"),
        ("foo", "1"),
        ("bar", "1"),
        ("baz", "1"),
    }


def test_local_multi_stage(spark, tmp_path):
    # reference driver_test.go:118-153: wordcount then prefix-'t' filter
    (tmp_path / "test_input").write_text("the test input\nthe input test\nfoo bar baz")
    job1 = Job(WCMapper(), WCReducer())
    f = PrefixFilter("t")
    job2 = Job(f, f)
    MultiStageDriver(
        [job1, job2], [str(tmp_path / "test_input")], str(tmp_path), spark=spark
    ).main()
    pairs = read_output(str(tmp_path / "job1"))
    assert pairs == {("the", "2"), ("test", "2")}


class StatefulMapper(Mapper):
    # reference driver_test.go:188-219: closure-captured state works
    def __init__(self, allowed):
        self.allowed = set(allowed)
        self.seen = 0

    def map(self, key, value, emitter):
        self.seen += 1
        for word in value.split():
            if word in self.allowed:
                emitter.emit(word, "1")


def test_stateful_mapper(spark, tmp_path):
    (tmp_path / "in.txt").write_text("a b c\nb c d\n")
    job = Job(StatefulMapper(["b", "c"]), WCReducer())
    Driver(job, [str(tmp_path / "in.txt")], str(tmp_path), spark=spark).main()
    assert read_output(str(tmp_path)) == {("b", "2"), ("c", "2")}


def test_missing_input_graceful_noop(spark, tmp_path):
    # reference driver_test.go:155-164: nonexistent inputs are a no-op
    job = Job(WCMapper(), WCReducer())
    Driver(job, [str(tmp_path / "nope.txt")], str(tmp_path), spark=spark).main()
    assert read_output(str(tmp_path)) == set()


class RouteAllToZero(Mapper, Reducer):
    def map(self, key, value, emitter):
        emitter.emit(value, "x")

    def reduce(self, key, values, emitter):
        for v in values.iter():
            emitter.emit(key, v)


def test_file_uri_inputs_and_working_location(spark, tmp_path):
    # The reference's corfs resolves multiple URI schemes
    # (corfs/filesys.go:31-46); the facade accepts file:// for both
    # inputs and working_location, normalizing for the os-level
    # output-part renames.
    (tmp_path / "in.txt").write_text("a a b\n")
    job = Job(WCMapper(), WCReducer())
    Driver(
        job,
        [f"file://{tmp_path}/in.txt"],
        f"file://{tmp_path}",
        spark=spark,
    ).main()
    assert read_output(str(tmp_path)) == {("a", "2"), ("b", "1")}


def test_remote_working_location_rejected_early(spark, tmp_path):
    # s3a:// output would write fine and then crash in the os-level
    # rename — fail fast at construction instead.
    job = Job(WCMapper(), WCReducer())
    with pytest.raises(ValueError, match="local path or file://"):
        Driver(job, [str(tmp_path / "in.txt")], "s3a://bucket/out", spark=spark)


def test_missing_file_uri_input_graceful_noop(spark, tmp_path):
    # file:// inputs take part in the same no-op-on-missing check as
    # plain local paths (reference driver_test.go:155-164).
    job = Job(WCMapper(), WCReducer())
    Driver(job, [f"file://{tmp_path}/nope.txt"], str(tmp_path), spark=spark).main()
    assert read_output(str(tmp_path)) == set()


class BigFanoutMapper(Mapper):
    # Each input line fans out to many emissions: exercises the
    # per-line drain in run_map (emissions must not accumulate across
    # the partition).
    def map(self, key, value, emitter):
        for i in range(int(value)):
            emitter.emit(f"k{i % 7}", "1")


def test_map_fanout_streams_per_line(spark, tmp_path):
    (tmp_path / "in.txt").write_text("70\n70\n")
    job = Job(BigFanoutMapper(), WCReducer())
    Driver(job, [str(tmp_path / "in.txt")], str(tmp_path), spark=spark).main()
    assert read_output(str(tmp_path)) == {(f"k{i}", "20") for i in range(7)}


def test_custom_partition_func(spark, tmp_path):
    # reference emitter_test.go:129-155: custom routing controls file
    # layout, never semantics.
    (tmp_path / "in.txt").write_text("p\nq\nr\n")
    job = Job(RouteAllToZero(), RouteAllToZero(), partition_func=lambda k, n: 0)
    Driver(
        job, [str(tmp_path / "in.txt")], str(tmp_path), num_bins=4, spark=spark
    ).main()
    zero = (tmp_path / "output-part-0").read_text().strip().split("\n")
    assert sorted(zero) == ["p\tx", "q\tx", "r\tx"]
    for i in (1, 2, 3):
        p = tmp_path / f"output-part-{i}"
        assert not p.exists() or p.read_text() == ""


class StructFieldFilter(Mapper, Reducer):
    # reference driver_test.go:166-186: a job whose behavior depends on
    # struct-field state (filter_words), map emits matching words,
    # reduce counts them.
    def __init__(self, filter_words):
        self.filter_words = filter_words

    def map(self, key, value, emitter):
        for word in value.split():
            if word in self.filter_words:
                emitter.emit(word, "1")

    def reduce(self, key, values, emitter):
        emitter.emit(key, str(sum(1 for _ in values.iter())))


def test_directory_input_struct_field_job(spark, tmp_path):
    # reference driver_test.go:188-219 (TestLocalStructFieldMapReduce):
    # the INPUT is a directory — the facade must resolve it to the
    # files inside, like corfs glob semantics.
    (tmp_path / "test_input").write_text(
        "the test input\nthe input test\nfoo bar baz"
    )
    j = StructFieldFilter(["foo", "bar"])
    Driver(
        Job(mapper=j, reducer=j), [str(tmp_path)], str(tmp_path), spark=spark
    ).main()
    assert read_output(str(tmp_path)) == {("foo", "1"), ("bar", "1")}
