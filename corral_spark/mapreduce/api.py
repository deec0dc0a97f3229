"""corral-compatible MapReduce facade on Spark RDDs.

API-surface parity with the reference framework (SURVEY §7 Phase 3):

* ``Mapper.map(key, value, emitter)`` — user flat-map, 0..N emits per
  input pair, may keep instance state across calls within a partition
  (reference mapreduce.go:22-24; statefulness pinned by reference
  driver_test.go:188-219).
* ``Reducer.reduce(key, values, emitter)`` — all values for a key in
  exactly one call, arbitrary order (reference mapreduce.go:26-29,
  README.md:211-215).
* ``PartitionFunc(key, num_bins) -> bin`` — custom key routing
  (reference mapreduce.go:31-34); default is FNV-64a mod bins
  (reference emitter.go:83-87), bit-compatible with the reference's
  golden ``hashPartition("foo", 100) == 99`` (emitter_test.go:25-28).
* ``Driver`` / ``MultiStageDriver`` — run jobs over text inputs with
  the reference's I/O conventions: splitInputRecord parsing on the way
  in (job.go:52-63), ``key\\tvalue`` lines in ``output-part-<P>`` on
  the way out (emitter.go:43, job.go:113), stage i+1 reading stage i's
  ``output-*`` from a ``job<i>`` subdir (driver.go:202-212).

Design: this is the ONE corner of the engine where arbitrary user
Python runs, so it lowers to RDDs (``mapPartitions`` ->
``partitionBy(n, fn)`` -> ``groupByKey`` -> ``mapPartitions``) instead
of DataFrames — a DataFrame plan can't honor an arbitrary Python
partition function (SURVEY §4 "custom work" #2). Relational workloads
should use the DataFrame operators in ``corral_spark.queries``; this
facade exists for drop-in migration of corral user code.

Semantic upgrades over the reference (documented, deliberate):
reducers stream/spill via Spark instead of requiring reducer input to
fit in memory (reference job.go:120, README.md:213 — corral OOMs where
this succeeds).
"""

from __future__ import annotations

import os
from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import SparkSession

PartitionFunc = Callable[[str, int], int]

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3


def fnv64(data: str) -> int:
    """FNV-1 64-bit (multiply, then xor) over the UTF-8 bytes — the
    reference's hashPartition uses Go's ``fnv.New64()``, i.e. FNV-1,
    not FNV-1a (reference emitter.go:82-87)."""
    h = _FNV_OFFSET
    for b in data.encode("utf-8"):
        h = (h * _FNV_PRIME) & 0xFFFFFFFFFFFFFFFF
        h ^= b
    return h


def fnv64a_partition(key: str, num_bins: int) -> int:
    """Default partitioner: FNV-1(key) % bins — bit-compatible with
    the reference golden hashPartition("foo", 100) == 0x63
    (emitter_test.go:25-28)."""
    return fnv64(key) % num_bins


class Emitter:
    """Collects (key, value) emissions from user map/reduce calls.
    Values are stringified like the reference (everything is a string
    record, mapreduce.go:36-40)."""

    def __init__(self) -> None:
        self.pairs: list[tuple[str, str]] = []

    def emit(self, key: str, value: str) -> None:
        self.pairs.append((str(key), str(value)))


class ValueIterator:
    """Iterator over a key's values (reference mapreduce.go:6-13).
    ``iter()`` mirrors the reference's ``Iter()`` channel accessor."""

    def __init__(self, values: Iterable[str]) -> None:
        self._values = values

    def iter(self) -> Iterator[str]:
        return iter(self._values)

    def __iter__(self) -> Iterator[str]:
        return iter(self._values)


class Mapper:
    """Subclass and override ``map``. Instances are pickled to
    executors once per partition, so instance attributes provide the
    reference's stateful-mapper semantics (driver_test.go:188-219)."""

    def map(self, key: str, value: str, emitter: Emitter) -> None:
        raise NotImplementedError


class Reducer:
    def reduce(self, key: str, values: ValueIterator, emitter: Emitter) -> None:
        raise NotImplementedError


class Job:
    """One map+reduce stage (reference job.go, NewJob)."""

    def __init__(
        self,
        mapper: Mapper,
        reducer: Reducer,
        partition_func: PartitionFunc | None = None,
    ) -> None:
        self.mapper = mapper
        self.reducer = reducer
        self.partition_func = partition_func or fnv64a_partition


def _parse_kv_line(line: str) -> tuple[str, str]:
    """splitInputRecord semantics (reference job.go:52-63): exactly one
    tab -> (key, value); else ("", line). Pinned by job_test.go:9-27."""
    parts = line.split("\t")
    if len(parts) == 2:
        return parts[0], parts[1]
    return "", line


def _strip_file_scheme(path: str) -> str:
    """file:///x -> /x (the facade's os-level rename/move work on the
    local filesystem). A non-empty authority (file://host/...) is
    rejected rather than silently treated as a relative local path.
    Other schemes pass through unchanged."""
    if path.startswith("file://"):
        rest = path[len("file://") :]
        if rest and not rest.startswith("/"):
            raise ValueError(
                f"file URI with remote authority not supported: {path!r}"
            )
        return rest
    return path


class Driver:
    """Runs a job over text inputs, writing reference-format TSV output
    (``output-part-<P>``) under ``working_location``.

    ``working_location`` accepts a plain local path or a ``file://``
    URI. Remote schemes (s3a://, hdfs://) are rejected up front: the
    reference-format renames below are os-level, so a remote location
    would write successfully and then crash renaming. (The DataFrame
    sinks in ``corral_spark.sources.sinks`` go through Hadoop
    FileSystem and do support remote URIs.)"""

    def __init__(
        self,
        job: Job,
        inputs: list[str],
        working_location: str | None = None,
        num_bins: int | None = None,
        spark: SparkSession | None = None,
    ) -> None:
        from corral_spark.mapreduce.config import load_config

        # Reference precedence chain (config.go:7-45): defaults <
        # corralrc.json < CORRAL_* env < explicit constructor arg.
        self.config = load_config(
            overrides={"workingLocation": working_location}
        )
        working_location = _strip_file_scheme(self.config["workingLocation"])
        if "://" in working_location:
            raise ValueError(
                "Driver working_location must be a local path or file:// URI, "
                f"got {working_location!r}: reference-format output renaming "
                "(output-part-<P>) is os-level"
            )
        self.jobs = [job]
        self.inputs = inputs
        self.working_location = working_location
        self.num_bins = num_bins
        self.spark = spark

    def _session(self) -> SparkSession:
        if self.spark is None:
            from corral_spark.session import local_session

            self.spark = local_session("corral_spark-mapreduce")
        return self.spark

    def _run_job(self, job: Job, inputs: list[str], out_dir: str) -> bool:
        spark = self._session()
        sc = spark.sparkContext

        import glob as _glob

        # Graceful no-op on nonexistent inputs, like the reference
        # (driver_test.go:155-164): glob-expand local paths first and
        # skip the stage when nothing matches.
        if not inputs:
            return False
        local = [
            _strip_file_scheme(p)
            for p in inputs
            if "://" not in p or p.startswith("file://")
        ]
        if local and not any(_glob.glob(p) for p in local):
            return False

        paths = ",".join(inputs)
        # splitSize (reference config.go:28, default 100 MB): size the
        # read so each split covers ~splitSize input bytes.
        min_parts = None
        split_size = int(self.config.get("splitSize") or 0)
        if split_size > 0:
            total = sum(
                os.path.getsize(f)
                for p in local
                for f in _glob.glob(p)
                if os.path.isfile(f)
            )
            if total > 0:
                min_parts = max(1, -(-total // split_size))
        lines = sc.textFile(paths, min_parts) if min_parts else sc.textFile(paths)
        num_bins = self.num_bins or max(lines.getNumPartitions(), 1)

        mapper, reducer = job.mapper, job.reducer

        def run_map(part: Iterator[str]) -> Iterator[tuple[str, str]]:
            # One mapper instance per partition => stateful mappers work
            # like the reference's per-task mapper (job.go:34-50).
            # Emissions are drained per input line so Spark can stream/
            # spill map output instead of materializing the whole
            # partition's output in one Python list (the reference
            # emitter also writes incrementally, emitter.go:106-119).
            em = Emitter()
            for line in part:
                key, value = _parse_kv_line(line)
                mapper.map(key, value, em)
                if em.pairs:
                    yield from em.pairs
                    em.pairs = []

        def run_reduce(part: Iterator[tuple[str, Iterable[str]]]) -> Iterator[str]:
            for key, values in part:
                em = Emitter()
                reducer.reduce(key, ValueIterator(values), em)
                for k, v in em.pairs:
                    yield f"{k}\t{v}"

        # Route keys with the job's PartitionFunc inside the ONE
        # groupByKey shuffle (passing it to partitionBy separately
        # would shuffle twice: pyspark's groupByKey defaults to
        # portable_hash, which would re-partition).
        pf = job.partition_func
        (
            lines.mapPartitions(run_map)
            .groupByKey(num_bins, lambda k: pf(k, num_bins))
            .mapPartitions(run_reduce)
            .saveAsTextFile(out_dir)
        )
        _rename_parts(out_dir)
        return True

    def run(self) -> None:
        if self.config.get("verbose"):
            # reference Main() raises the log level on -v
            # (driver.go:227-229).
            self._session().sparkContext.setLogLevel("INFO")
        n = len(self.jobs)
        inputs = self.inputs
        for i, job in enumerate(self.jobs):
            out = (
                os.path.join(self.working_location, f"job{i}")
                if n > 1
                else self.working_location
            )
            stage_out = os.path.join(out, "__stage_out") if n == 1 else out
            # For single jobs the reference writes output-part-* directly
            # into the working location (job.go:113); Spark needs a fresh
            # dir, so write to a scratch subdir then move files up.
            ran = self._run_job(job, inputs, stage_out)
            if not ran:
                break
            if stage_out != out:
                _move_up(stage_out, out)
            inputs = [os.path.join(out, "output-part-*")]

    def main(self, argv: list[str] | None = None) -> None:
        """Reference ``Main()`` CLI surface (driver.go:219-247):
        ``--out``/``-o`` overrides the working location, ``--verbose``/
        ``-v`` raises the log level, positional args are appended to
        the job inputs; the execution time is printed at the end.
        ``--lambda``/``--undeploy``/``--memprofile`` are deployment
        infra, out of scope per SURVEY §2.1 F15/F19.

        ``argv=None`` means "no flags" (library use — the common case
        in tests); CLI scripts pass ``sys.argv[1:]`` explicitly so the
        facade never fights the host process's own argument parsing.
        """
        import argparse
        import time

        parser = argparse.ArgumentParser(prog="corral", add_help=True)
        parser.add_argument("--out", "-o", default=None, help="Output directory")
        parser.add_argument(
            "--verbose", "-v", action="store_true", default=False
        )
        parser.add_argument("inputs", nargs="*", default=[])
        ns = parser.parse_args(argv if argv is not None else [])
        if ns.out:
            wl = _strip_file_scheme(ns.out)
            if "://" in wl:
                raise ValueError(
                    f"--out must be a local path or file:// URI, got {ns.out!r}"
                )
            self.working_location = wl
        if ns.verbose:
            self.config["verbose"] = True
        # Positional inputs apply to THIS invocation only — appending
        # to self.inputs permanently would double-read them on a
        # second main() call.
        saved_inputs = self.inputs
        self.inputs = list(self.inputs) + list(ns.inputs)
        start = time.time()
        try:
            self.run()
        finally:
            self.inputs = saved_inputs
        # reference driver.go:245: "Job Execution Time: ..."
        print(f"Job Execution Time: {time.time() - start:.3f}s")


class MultiStageDriver(Driver):
    """Sequential stages; stage i writes job<i>/output-part-*, stage
    i+1 reads them (reference driver.go:89-93, 195-216)."""

    def __init__(
        self,
        jobs: list[Job],
        inputs: list[str],
        working_location: str,
        num_bins: int | None = None,
        spark: SparkSession | None = None,
    ) -> None:
        super().__init__(jobs[0], inputs, working_location, num_bins, spark)
        self.jobs = list(jobs)


def _rename_parts(out_dir: str) -> None:
    """part-00000 -> output-part-0 (reference naming, job.go:113)."""
    for fname in sorted(os.listdir(out_dir)):
        if fname.startswith("part-") and not fname.endswith(".crc"):
            idx = int(fname.split("-")[1])
            os.rename(
                os.path.join(out_dir, fname),
                os.path.join(out_dir, f"output-part-{idx}"),
            )


def _move_up(src_dir: str, dst_dir: str) -> None:
    import shutil

    for fname in os.listdir(src_dir):
        if fname.startswith("output-part-"):
            shutil.move(os.path.join(src_dir, fname), os.path.join(dst_dir, fname))
    shutil.rmtree(src_dir, ignore_errors=True)
