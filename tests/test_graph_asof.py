"""Direct operator tests for connected_components / dedup_clusters /
asof_join: empty-input handling, driver-vs-distributed path agreement,
and tie-break determinism (VERDICT r1 advisories)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from corral_spark.operators.asof import asof_join
from corral_spark.operators.graph import connected_components, dedup_clusters

EDGES = [
    # two components: {1,2,3,4} (chain+extra edge) and {10,11}
    (2, 1),
    (2, 3),
    (3, 4),
    (1, 4),
    (10, 11),
]
EXPECTED = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def _edges_df(spark, rows=EDGES):
    return spark.createDataFrame(rows, ["src", "dst"])


def test_cc_empty_edges_returns_empty_typed_frame(spark):
    empty = _edges_df(spark).limit(0)
    out = connected_components(empty)
    assert out.columns == ["node", "component"]
    assert out.count() == 0
    # Component column keeps the edge column's type.
    assert out.schema["component"].dataType == empty.schema["src"].dataType


def test_cc_empty_edges_distributed_path(spark):
    out = connected_components(_edges_df(spark).limit(0), collect_threshold=0)
    assert out.count() == 0


def test_cc_driver_path(spark):
    got = {
        r["node"]: r["component"]
        for r in connected_components(_edges_df(spark)).collect()
    }
    assert got == EXPECTED


def test_cc_distributed_path_matches_driver_path(spark):
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            _edges_df(spark), collect_threshold=0
        ).collect()
    }
    assert got == EXPECTED


def test_cc_conf_driven_threshold(spark):
    # conf forces the distributed path even though the default
    # collect_threshold would take the driver path.
    spark.conf.set("corral.cc.collectThreshold", "0")
    try:
        got = {
            r["node"]: r["component"]
            for r in connected_components(_edges_df(spark)).collect()
        }
        assert got == EXPECTED
    finally:
        spark.conf.unset("corral.cc.collectThreshold")


def test_dedup_clusters_with_no_pairs(spark):
    # A clean corpus (zero near-dup pairs) must not crash: everyone
    # represents themselves.
    df = spark.createDataFrame([(i,) for i in range(5)], ["doc_id"])
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    out = dedup_clusters(df, pairs, "doc_id").collect()
    assert len(out) == 5
    assert all(r["doc_id"] == r["cluster_rep"] and r["is_rep"] for r in out)


def test_asof_join_tied_right_timestamps_deterministic(spark):
    left = spark.createDataFrame([Row(k="a", ts=10), Row(k="a", ts=20)])
    # Three right rows share (k, ts=10): the attached payload must be
    # the same row on every run regardless of shuffle order.
    right_rows = [Row(k="a", ts=10, payload=p) for p in ("x", "y", "z")]
    results = []
    for shuffle_seed in (1, 3, 7):
        right = spark.createDataFrame(right_rows).repartition(shuffle_seed)
        out = asof_join(left, right, on="ts", by="k")
        results.append(sorted((r["ts"], r["payload_right"]) for r in out.collect()))
    assert results[0] == results[1] == results[2]
    # Both left rows see the same winning payload for the ts=10 tie.
    assert results[0][0][1] == results[0][1][1]
