"""The reference's AMPLab example programs (examples/amplab{1,2,3})
ported verbatim onto the MapReduce facade and run end-to-end over CSV
fixtures — API-parity evidence that corral user code translates 1:1.
Results are cross-checked against the DataFrame path computing the
same query."""

from __future__ import annotations

import json

from corral_spark.mapreduce import (
    Driver,
    Job,
    Mapper,
    MultiStageDriver,
    Reducer,
)

RANKINGS = [
    ("url_a", 72, 3),
    ("url_b", 12, 7),
    ("url_c", 99, 1),
    ("url_d", 50, 2),
    ("url_e", 51, 9),
]
VISITS = [
    # sourceIP, destURL, visitDate, adRevenue + 5 unused fields
    ("10.0.0.1", "url_a", "1999-05-01", 12.5),
    ("10.0.0.1", "url_c", "1999-06-01", 3.25),
    ("10.0.0.2", "url_a", "2001-01-01", 99.0),  # after cutoff -> dropped
    ("10.0.0.3", "url_e", "1998-11-11", 7.75),
    ("10.0.0.3", "url_zz", "1999-01-01", 1.0),  # no matching ranking
]


def write_fixtures(tmp_path):
    r = tmp_path / "rankings.csv"
    r.write_text(
        "\n".join(f"{u},{pr},{d}" for u, pr, d in RANKINGS) + "\nbad_row\n"
    )
    v = tmp_path / "uservisits.csv"
    v.write_text(
        "\n".join(
            f"{ip},{du},{dt},{rev},ua,US,en,word,1" for ip, du, dt, rev in VISITS
        )
    )
    return str(r), str(v)


def read_kv_output(path_dir):
    import os

    pairs = []
    for fname in os.listdir(str(path_dir)):
        if fname.startswith("output-part-"):
            for line in open(f"{path_dir}/{fname}"):
                parts = line.rstrip("\n").split("\t", 1)
                if len(parts) == 2:
                    pairs.append((parts[0], parts[1]))
    return pairs


class Amplab1(Mapper, Reducer):
    """reference examples/amplab1/amplab1.go:15-33."""

    def map(self, key, value, emitter):
        fields = value.split(",")
        if len(fields) != 3:
            return
        try:
            page_rank = int(fields[1])
        except ValueError:
            return
        if page_rank > 50:
            emitter.emit(fields[0], fields[1])

    def reduce(self, key, values, emitter):
        for v in values.iter():
            emitter.emit(key, v)


def test_amplab1_facade(spark, tmp_path):
    rankings, _ = write_fixtures(tmp_path)
    out = tmp_path / "out1"
    out.mkdir()
    Driver(Job(Amplab1(), Amplab1()), [rankings], str(out), spark=spark).main()
    assert sorted(read_kv_output(out)) == [
        ("url_a", "72"),
        ("url_c", "99"),
        ("url_e", "51"),
    ]


class Amplab2(Mapper, Reducer):
    """reference examples/amplab2/amplab2.go:22-43."""

    def map(self, key, value, emitter):
        fields = value.split(",")
        if len(fields) != 9:
            return
        emitter.emit(fields[0][:8], fields[3])

    def reduce(self, key, values, emitter):
        total = 0.0
        for v in values.iter():
            try:
                total += float(v)
            except ValueError:
                pass
        emitter.emit(key, f"{total:f}")


def test_amplab2_facade(spark, tmp_path):
    _, visits = write_fixtures(tmp_path)
    out = tmp_path / "out2"
    out.mkdir()
    Driver(Job(Amplab2(), Amplab2()), [visits], str(out), spark=spark).main()
    got = dict(read_kv_output(out))
    assert got == {"10.0.0.1": "15.750000", "10.0.0.2": "99.000000", "10.0.0.3": "8.750000"}


RANKING_T, VISIT_T = 0, 1


class Amplab3Join(Mapper, Reducer):
    """reference examples/amplab3/amplab3.go:37-97: tagged-union
    reduce-side join with date filter, JSON records in string values."""

    def map(self, key, value, emitter):
        fields = value.split(",")
        if len(fields) == 3:
            rec = {"t": RANKING_T, "url": fields[0], "rank": int(fields[1])}
            emitter.emit(rec["url"], json.dumps(rec))
        elif len(fields) == 9:
            if fields[2] < "2000-01-01":
                rec = {
                    "t": VISIT_T,
                    "dest": fields[1],
                    "rev": float(fields[3]),
                    "ip": fields[0],
                }
                emitter.emit(rec["dest"], json.dumps(rec))

    def reduce(self, key, values, emitter):
        buffered, rank = [], None
        for v in values.iter():
            rec = json.loads(v)
            if rec["t"] == RANKING_T:
                rank = rec
                for visit in buffered:
                    visit["rank"] = rank["rank"]
                    emitter.emit(visit["ip"], json.dumps(visit))
                buffered = []
            elif rank is not None:
                rec["rank"] = rank["rank"]
                emitter.emit(rec["ip"], json.dumps(rec))
            else:
                buffered.append(rec)


class Amplab3Agg(Mapper, Reducer):
    """reference examples/amplab3/amplab3.go:100-120."""

    def map(self, key, value, emitter):
        emitter.emit(key, value)

    def reduce(self, key, values, emitter):
        sum_rank, sum_rev, n = 0, 0.0, 0
        for v in values.iter():
            rec = json.loads(v)
            sum_rank += rec["rank"]
            sum_rev += rec["rev"]
            n += 1
        emitter.emit(key, f"{sum_rank / n:f}\t{sum_rev / n:f}")


def test_amplab3_facade_two_stage(spark, tmp_path):
    rankings, visits = write_fixtures(tmp_path)
    out = tmp_path / "out3"
    out.mkdir()
    MultiStageDriver(
        [Job(Amplab3Join(), Amplab3Join()), Job(Amplab3Agg(), Amplab3Agg())],
        [rankings, visits],
        str(out),
        spark=spark,
    ).main()
    got = dict(read_kv_output(out / "job1"))
    # expected: pre-cutoff visits with matching rankings
    #   10.0.0.1: url_a(72, 12.5), url_c(99, 3.25) -> avg 85.5, 7.875
    #   10.0.0.3: url_e(51, 7.75) -> avg 51, 7.75 (url_zz has no ranking)
    assert got.keys() == {"10.0.0.1", "10.0.0.3"}
    assert got["10.0.0.1"].split("\t") == ["85.500000", "7.875000"]
    assert got["10.0.0.3"].split("\t") == ["51.000000", "7.750000"]
