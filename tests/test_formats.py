"""File-format coverage (SURVEY §2.3: the reference supports only
text/TSV/JSON-lines; the engine handles parquet/csv/json/text/orc) —
write/read round-trips preserving schema and values."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from corral_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_roundtrip_preserves_rows(spark, tmp_path, fmt):
    src = load_table(spark, SF, "nation")
    out = str(tmp_path / f"nation_{fmt}")
    writer = src.write.mode("overwrite")
    reader = spark.read
    if fmt == "csv":
        writer = writer.option("header", True)
        reader = reader.option("header", True).option("inferSchema", True)
    getattr(writer.format(fmt), "save")(out)
    back = reader.format(fmt).load(out)
    assert sorted(back.columns) == sorted(src.columns)
    a = sorted(tuple(r) for r in src.select(*sorted(src.columns)).collect())
    b = sorted(tuple(r) for r in back.select(*sorted(src.columns)).collect())
    assert a == b


def test_write_compacted_bounds_file_count(spark, tmp_path):
    import os

    from corral_spark.sources.layout import plan_target_files, write_compacted

    li = load_table(spark, SF, "lineitem")  # 6000 rows
    n = li.count()
    out = str(tmp_path / "compact")
    write_compacted(
        li,
        out,
        max_records_per_file=1000,
        target_files=plan_target_files(n, 1000),
    )
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    # 6000 rows / 1000 per file -> 6 files from coalesce(6)
    assert len(files) == 6
    assert spark.read.parquet(out).count() == n


def test_range_clustered_write_enables_file_skipping(spark, tmp_path):
    """Each range-clustered file must cover a disjoint o_orderkey
    range (parquet min/max stats then skip whole files for selective
    key predicates)."""
    import os

    from corral_spark.sources.layout import write_range_clustered

    orders = load_table(spark, SF, "orders")
    out = str(tmp_path / "clustered")
    write_range_clustered(orders, out, ["o_orderkey"], n_files=4)

    files = sorted(
        f for f in os.listdir(out) if f.endswith(".parquet")
    )
    assert len(files) == 4
    ranges = []
    for f in files:
        mm = (
            spark.read.parquet(os.path.join(out, f))
            .agg(F.min("o_orderkey"), F.max("o_orderkey"))
            .collect()[0]
        )
        ranges.append((mm[0], mm[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"file ranges overlap: {ranges}"
    assert spark.read.parquet(out).count() == orders.count()


def test_partitioned_parquet_write_prunes(spark, tmp_path):
    """Hive-partitioned layout: partition column pruning must reach the
    file listing (the 100 TB layout strategy in docs/SCALE.md)."""
    orders = load_table(spark, SF, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year")
    orders.write.mode("overwrite").partitionBy("order_year").parquet(out)

    back = spark.read.parquet(out).filter(F.col("order_year") == 1997)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(order_year" in plan
    assert back.count() == orders.filter(F.col("order_year") == 1997).count()


def test_schema_evolution_merge_schema(spark, tmp_path):
    # A long-lived 100 TB table accretes columns over time; readers
    # must unify old and new footers (mergeSchema) with NULL backfill
    # rather than requiring a rewrite of petabytes of history.
    v1 = spark.createDataFrame([(1, "a")], ["id", "s"])
    v2 = spark.createDataFrame([(2, "b", 9.5)], ["id", "s", "score"])
    v1.write.parquet(f"{tmp_path}/t/v=1")
    v2.write.parquet(f"{tmp_path}/t/v=2")
    df = spark.read.option("mergeSchema", "true").parquet(f"{tmp_path}/t")
    assert set(df.columns) == {"id", "s", "score", "v"}
    rows = {r.id: r.score for r in df.collect()}
    assert rows == {1: None, 2: 9.5}  # old files read NULL for new col
    # Default reads (no mergeSchema) must still work on the new footer.
    only_v2 = spark.read.parquet(f"{tmp_path}/t/v=2")
    assert only_v2.count() == 1


def test_zorder_write_localizes_both_dimensions(spark, tmp_path):
    import glob as _glob

    from corral_spark.sources.layout import write_zorder_clustered

    # 64x64 uniform grid; 16 files. Z-order must localize BOTH dims
    # per file; single-dim clustering leaves the other dim spanning
    # the whole domain in every file.
    n = 64
    grid = spark.createDataFrame(
        [(x, y, x * n + y) for x in range(n) for y in range(n)],
        ["x", "y", "payload"],
    )
    write_zorder_clustered(grid, f"{tmp_path}/z", "x", "y", n_files=16)
    files = _glob.glob(f"{tmp_path}/z/part-*.parquet")
    assert len(files) >= 8
    xfrac, yfrac = [], []
    for f in files:
        pdf = spark.read.parquet(f).toPandas()
        xfrac.append((pdf.x.max() - pdf.x.min() + 1) / n)
        yfrac.append((pdf.y.max() - pdf.y.min() + 1) / n)
    # Every file's bounding box is a strict sub-range in BOTH dims on
    # average — the multi-dimensional skipping property.
    assert sum(xfrac) / len(xfrac) < 0.7
    assert sum(yfrac) / len(yfrac) < 0.7


def test_zorder_rank_beats_minmax_under_skew(spark, tmp_path):
    """On Zipf-like data, min/max z-order collapses most rows into a
    few cells (unbalanced files); equi-depth (rank) z-order keeps
    files balanced while preserving two-dimensional localization."""
    import glob as _glob

    from corral_spark.sources.layout import (
        write_zorder_clustered,
        write_zorder_rank_clustered,
    )

    # Heavy skew: 90% of x mass in [0, 10), tail stretched to 1e6.
    rows = []
    for i in range(4096):
        x = (i % 10) if i % 10 != 9 else (i * 271) % 1_000_000
        y = (i * 37) % 1000
        rows.append((x, y, i))
    df = spark.createDataFrame(rows, ["x", "y", "payload"])

    def _file_counts(path):
        return [
            spark.read.parquet(f).count()
            for f in _glob.glob(f"{path}/part-*.parquet")
        ]

    write_zorder_clustered(df, f"{tmp_path}/mm", "x", "y", n_files=8)
    write_zorder_rank_clustered(df, f"{tmp_path}/rk", "x", "y", n_files=8)

    # Row balance is fine either way (repartitionByRange equi-depth
    # samples the z-key); what differs is SKIPPING in the dense
    # region: min/max normalization maps every x in [0,10) to z-cell
    # x-bucket 0 (10/1e6 of the range), so nearly every file's
    # min/max box covers a dense-region point query — no file can be
    # skipped.  Rank bucketing gives each dense x value its own
    # bucket, so only the files actually holding x=5 rows match.
    def _files_matching(path, xval):
        hits = 0
        for f in _glob.glob(f"{path}/part-*.parquet"):
            pdf = spark.read.parquet(f).toPandas()
            if pdf.x.min() <= xval <= pdf.x.max():
                hits += 1
        return hits

    mm_hits = _files_matching(f"{tmp_path}/mm", 5)
    rk_hits = _files_matching(f"{tmp_path}/rk", 5)
    assert mm_hits >= 6, mm_hits  # min/max: dense point query scans ~all files
    # Rank: x=5 pins the two high x-bits, leaving y7 free -> 2 core
    # files + up to 2 straddling an equi-depth boundary. (Not <=3: the
    # quantile sketch's merge order shifts boundaries by one file
    # between runs.)
    assert rk_hits <= 4, rk_hits
    assert rk_hits < mm_hits, (rk_hits, mm_hits)
    # Rank layout keeps files balanced too.
    rk = _file_counts(f"{tmp_path}/rk")
    assert max(rk) / (sum(rk) / len(rk)) < 1.5


def test_zorder_rank_empty_and_constant_inputs(spark, tmp_path):
    from corral_spark.sources.layout import write_zorder_rank_clustered

    empty = spark.createDataFrame([], "x int, y int")
    write_zorder_rank_clustered(empty, f"{tmp_path}/e", "x", "y", n_files=4)
    assert spark.read.parquet(f"{tmp_path}/e").count() == 0

    # All-constant columns -> every quantile identical -> splits
    # collapse to one bucket; must still write all rows.
    const = spark.createDataFrame([(7, 7, i) for i in range(100)], ["x", "y", "p"])
    write_zorder_rank_clustered(const, f"{tmp_path}/c", "x", "y", n_files=4)
    assert spark.read.parquet(f"{tmp_path}/c").count() == 100


def test_dynamic_partition_pruning_from_dim_filter(spark, tmp_path):
    """DYNAMIC partition pruning: when the partition key is only
    constrained THROUGH a join (filter lives on the dim side), the
    fact scan must still skip partitions at runtime via the injected
    dynamicpruning subquery — at 100 TB this is the difference
    between scanning one day and scanning the table whenever the date
    predicate arrives via a calendar/dim join (the static-pruning
    sibling above covers the literal-predicate case)."""
    orders = load_table(spark, SF, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year")
    orders.write.mode("overwrite").partitionBy("order_year").parquet(out)

    fact = spark.read.parquet(out)
    # The dim's filter column must NOT be statically derivable from
    # the partition key, or the optimizer constant-folds it into a
    # plain static PartitionFilter (verified: is_current =
    # (order_year == 1997) produced exactly that) — label values only
    # exist in the dim's DATA, so pruning must happen at RUNTIME.
    years = [r[0] for r in orders.select("order_year").distinct().collect()]
    dim = spark.createDataFrame(
        [(y, "current" if y == 1997 else "old") for y in years],
        "order_year int, label string",
    )
    joined = fact.join(
        dim.filter(F.col("label") == "current"), on="order_year"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert (
        joined.count()
        == orders.filter(F.col("order_year") == 1997).count()
    )


def test_zonemap_report_and_skipping_ratio(spark, tmp_path):
    """Footer-derived zonemaps quantify what each layout buys: range
    clustering makes its own column's range predicates skip most
    files but leaves the other column unskippable; z-order makes BOTH
    columns skip. The report reads footers only — it must agree with
    the actual data distribution the writers created."""
    from pyspark.sql import functions as F

    from corral_spark.sources.layout import (
        skipping_ratio,
        write_range_clustered,
        write_zorder_clustered,
        zonemap_report,
    )

    df = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
    )
    rng_path, z_path = str(tmp_path / "rng"), str(tmp_path / "zord")
    write_range_clustered(df, rng_path, ["x"], n_files=16)
    write_zorder_clustered(df, z_path, "x", "y", n_files=16, bits=6)

    rep_rng = zonemap_report(rng_path, ["x", "y"])
    rep_z = zonemap_report(z_path, ["x", "y"])
    assert sum(r["n_rows"] for r in rep_rng) == 64 * 64
    assert all(r["x_min"] is not None for r in rep_rng)

    # Narrow range predicate on each dimension (1/8 of the domain).
    lo, hi = 0, 7
    # x-clustered: x skips nearly everything, y skips nothing.
    assert skipping_ratio(rep_rng, "x", lo, hi) >= 0.75
    assert skipping_ratio(rep_rng, "y", lo, hi) == 0.0
    # z-ordered: BOTH dimensions skip a real fraction of files.
    assert skipping_ratio(rep_z, "x", lo, hi) >= 0.5
    assert skipping_ratio(rep_z, "y", lo, hi) >= 0.5
    # The report is honest: no file's zonemap excludes a value the
    # file actually contains (spot-check via a full read per file).
    import os

    for rec in rep_z:
        pdf = spark.read.parquet(
            os.path.join(z_path, rec["file"])
        ).toPandas()
        assert pdf.x.min() == rec["x_min"] and pdf.x.max() == rec["x_max"]
