"""Reproducible sampling operators for training-data pipelines.

Random `df.sample()` is seed-stable only within one engine; these
operators instead hash a stable row id (md5, available and identical
in every engine) and compare against a hex threshold — the standard
content-addressed sampling trick that makes train/test splits
reproducible across engines, re-runs, and backfills, and lets the
DuckDB oracle check sampling exactly.

Scale: pure scan-side JVM expressions — no shuffle, no RNG state, no
driver coordination; a 100 TB sample is one filter pushdown away.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hex_threshold(fraction: float) -> str:
    """Threshold such that P(md5_8hex_prefix < t) == fraction.

    fraction >= 1.0 returns "g", which every 8-char hex string sorts
    below — naive format() would yield the 9-char "100000000", which
    sorts BELOW most 8-char prefixes and silently sampled ~6% instead
    of 100% (caught by a hypothesis monotonicity property)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    scaled = int(fraction * 0x100000000)
    if scaled >= 0x100000000:
        return "g"
    return format(scaled, "08x")


def sample_key(id_col: Column, salt: str) -> Column:
    """First 8 hex chars of md5(salt || id) — lowercase hex compares
    lexicographically == numerically, in Spark and in SQL oracles."""
    return F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 8)


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by content hash of the id —
    the same rows every run, on every engine."""
    return df.filter(sample_key(F.col(id_col), salt + ":") < _hex_threshold(fraction))


def train_test_split(
    df: DataFrame, id_col: str, train_fraction: float = 0.8, salt: str = "split"
) -> DataFrame:
    """Add a ``split`` column ('train'/'test') by hashed id."""
    is_train = sample_key(F.col(id_col), salt + ":") < _hex_threshold(train_fraction)
    return df.withColumn(
        "split", F.when(is_train, F.lit("train")).otherwise(F.lit("test"))
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample common
    classes, keep rare ones) — ``sampleBy`` with cross-engine
    reproducibility."""
    key = sample_key(F.col(id_col), salt + ":")
    cond = None
    for value, frac in sorted(fractions.items()):
        this = (F.col(strata_col) == value) & (key < _hex_threshold(frac))
        cond = this if cond is None else cond | this
    others = ~F.col(strata_col).isin(*fractions.keys()) & (
        key < _hex_threshold(default_fraction)
    )
    return df.filter(cond | others if cond is not None else others)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    cap: int,
    salt: str = "cap",
) -> DataFrame:
    """Deterministic per-group row cap (the RefinedWeb/CommonCrawl
    per-DOMAIN cap: no single source may contribute more than ``cap``
    documents to the corpus). Rows are ranked inside each group by
    md5(salt || id) — content-addressed, so the survivors are the same
    rows every run on every engine, and adding new rows to a group
    never evicts a previously-kept row unless the newcomer hashes
    earlier (stable under incremental ingest).

    Scale shape: one row_number window partitioned by group.  Spark's
    WindowGroupLimit pushes ``rank <= cap`` below the exchange — each
    map task keeps at most ``cap`` rows per group locally before
    shuffling — so a hot domain with 10^9 pages moves O(cap * tasks)
    rows, not 10^9, through the exchange (same plan discipline as
    sketches.grouped_top_k, pinned in tests/test_plans.py).
    """
    from pyspark.sql.window import Window

    key = sample_key(F.col(id_col), salt + ":")
    w = Window.partitionBy(group_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= cap)
        .drop("__rn")
    )


def temperature_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    alpha: float = 0.3,
    budget_fraction: float = 0.5,
    salt: str = "temp",
) -> DataFrame:
    """APPLY temperature resampling: deterministically sample the
    corpus so each group's share approaches its (n_g/N)^alpha
    normalized weight, at an overall budget of ``budget_fraction`` of
    all rows. Closes the loop on weight DERIVATION (the
    lang_sampling_weights query): per-group keep-rate
    r_g = min(1, budget * w_g * N / n_g), applied with the same
    cross-engine md5 content-addressed rule as deterministic_sample —
    so upsampled-to-cap rare groups keep everything and common groups
    thin out, the same rows every run on every engine.

    Rates are data-derived doubles; they quantize to 6 dp before the
    threshold compare (registry float convention) so the oracle's pow()
    agrees bit-for-bit after rounding. The comparison is numeric — the
    md5 8-hex prefix parsed as a long against floor(rate * 2^32) —
    because a per-row STRING threshold cannot use the precomputed-hex
    trick of the fixed-fraction samplers.

    Scale shape: one partial-aggregated group count (group-cardinality
    rows, materialized — it feeds both the N/Z totals and the rate
    table, and cutting lineage also avoids the self-join attribute
    clash of joining a frame with its own aggregate), then one
    broadcast join of the per-group rate onto the scan — no corpus
    shuffle at any size.

    Implementation note: the total column is ``__tot``, not "__N" —
    Spark resolves column names CASE-INSENSITIVELY by default, so
    "__N" aliases "__n" and withColumn("__N", ...) silently REPLACES
    the per-group count (observed: every group's count became the
    global total). Same-letter different-case names are a trap in any
    derived-column chain.

    NULL-group rows are EXCLUDED: they are filtered before counting
    (so N, Z and every rate are computed over non-null groups only)
    and the inner rate join drops them from the output. Without the
    up-front filter they would inflate the totals while still being
    dropped at the join, silently shrinking the effective budget
    below ``budget_fraction``.
    """
    from corral_spark.materialize import materialize

    counts = materialize(
        df.filter(F.col(group_col).isNotNull())
        .groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("__n")),
        eager=False,
    )
    total = counts.agg(F.sum("__n").alias("__tot"))
    p = counts.crossJoin(F.broadcast(total)).withColumn(
        "__pw",
        F.pow(F.col("__n").cast("double") / F.col("__tot"), F.lit(alpha)),
    )
    z = p.agg(F.sum("__pw").alias("__z"))
    rates = (
        p.crossJoin(F.broadcast(z))
        .select(
            group_col,
            F.round(
                F.least(
                    F.lit(1.0),
                    F.lit(budget_fraction)
                    * (F.col("__pw") / F.col("__z"))
                    * F.col("__tot")
                    / F.col("__n"),
                ),
                6,
            ).alias("__rate"),
        )
    )
    key_num = F.conv(
        sample_key(F.col(id_col), salt + ":"), 16, 10
    ).cast("long")
    # Explicit floor on the threshold: cast(double -> long) truncates
    # toward zero in Spark but rounds half-away in some SQL engines;
    # floor() on BOTH sides (here and in the DuckDB oracle) removes the
    # off-by-one at exact 2^32-boundary rates from the bit-for-bit
    # contract. Rates are non-negative so floor == truncation.
    return (
        df.join(F.broadcast(rates), on=group_col)
        .filter(
            key_num
            < F.floor(F.col("__rate") * F.lit(float(1 << 32))).cast("long")
        )
        .drop("__rate")
    )


def target_share_sample(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    targets: dict[str, int],
    token_budget: int,
    salt: str = "mix",
) -> DataFrame:
    """Domain-mixture sampling to EXPLICIT target shares: thin each
    group (language / source domain) so its expected kept token mass
    is ``token_budget * w_g / W`` (W = sum of target weights), capped
    by what the group actually has — the standard pretraining-mixture
    step ("50% en, 30% code, 20% de") that temperature_sample's
    count-derived weights cannot express.

    Per-group keep rate r_g = min(1, T * w_g / (W * tok_g)) with
    tok_g the group's total weight (token count). The keep rule is
    INTEGER-exact (weighted_bernoulli_sample discipline — no float
    rounding anywhere near the comparison):

        keep  iff  u32 * W * tok_g  <  T * w_g * 2^32

    evaluated in DECIMAL(38,0), so it is replayable bit-for-bit by a
    SQL oracle using HUGEINT/DECIMAL. The r_g >= 1 case needs no
    special-casing: u32 < 2^32 makes the inequality universally true
    exactly when T*w_g >= W*tok_g. Bound: u32 (10 digits) * W * tok_g
    must stay under 10^38 — holds for any real corpus (tok_g 10^14 *
    W 10^4 leaves 10 digits of headroom).

    Groups absent from ``targets`` (and NULL groups) are dropped:
    a mixture spec is a whitelist. Weights must be non-negative
    integers; zero-weight rows are never kept.

    Scale shape: one partial-aggregated per-group weight sum
    (group-cardinality rows) broadcast back over the scan, then a
    pure projection filter — no shuffle of the data at any size.
    """
    if token_budget < 0:
        raise ValueError("token_budget must be >= 0")
    bad = {g: w for g, w in targets.items() if not isinstance(w, int) or w < 0}
    if bad or not targets:
        raise ValueError(f"targets must be positive int weights, got {bad or targets}")
    W = sum(targets.values())
    dec = "decimal(38,0)"
    tok = (
        df.filter(F.col(group_col).isin(*targets.keys()))
        .groupBy(group_col)
        .agg(F.sum(F.col(weight_col).cast("long")).alias("__tokg"))
    )
    tmap = F.create_map(
        *[F.lit(x) for gw in sorted(targets.items()) for x in gw]
    )
    u32 = F.conv(sample_key(F.col(id_col), salt + ":"), 16, 10).cast("long")
    wg = tmap[F.col(group_col)].cast(dec)
    lhs = u32.cast(dec) * F.lit(W).cast(dec) * F.col("__tokg").cast(dec)
    rhs = F.lit(token_budget).cast(dec) * wg * F.lit(1 << 32).cast(dec)
    return (
        df.join(F.broadcast(tok), on=group_col)
        .filter(lhs < rhs)
        .drop("__tokg")
    )


def weighted_bernoulli_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    rate_at_max: float = 1.0,
    salt: str = "wsamp",
) -> DataFrame:
    """Deterministic IMPORTANCE-weighted Bernoulli sample: each row is
    kept with probability ``rate_at_max * w / max(w)`` — the standard
    quality/length-proportional corpus thinning rule — under the same
    content-addressed md5 discipline as deterministic_sample, so the
    kept set is reproducible and cross-engine replayable.

    Integer-exact keep rule (no float rounding in the comparison):

        keep  iff  u32 * max_w  <  w * floor(rate_at_max * 2^32)

    with u32 the row's md5 8-hex prefix as a long. Both products are
    exact BIGINT arithmetic, so a DuckDB oracle reproduces the sample
    bit-for-bit. Weights must be non-negative integers with
    max_w * 2^32 < 2^63 (max_w < 2^31 — any realistic doc-length or
    score-bucket weight); zero-weight rows are never kept.

    Scale shape: one max() aggregate (a scalar) broadcast back over
    the scan, then a pure projection filter — no shuffle of the data.
    """
    if not 0.0 <= rate_at_max <= 1.0:
        # A keep PROBABILITY above 1 is meaningless, and r > 2^32
        # would un-guard the RHS product w * r (w can be 2^31 - 1
        # under the maxw bound, so r must stay <= 2^32 for the
        # product to fit in BIGINT).
        raise ValueError("rate_at_max must be in [0, 1]")
    maxw = df.agg(F.max(F.col(weight_col)).cast("long").alias("__maxw"))
    u32 = F.conv(sample_key(F.col(id_col), salt + ":"), 16, 10).cast("long")
    r = int(rate_at_max * float(1 << 32))
    # ENFORCE the documented bound, don't just document it: under the
    # session's non-ANSI mode an overflowing BIGINT product would wrap
    # silently and invert keep decisions for an arbitrary subset of
    # rows. The guard lives inside the comparison expression itself so
    # it cannot be pruned away, and costs one branch on a broadcast
    # scalar.
    lhs = F.when(
        F.col("__maxw") < F.lit(1 << 31),
        u32 * F.col("__maxw"),
    ).otherwise(
        F.raise_error(
            F.lit(
                "weighted_bernoulli_sample: max(weight) must be < 2^31 "
                "(BIGINT product would overflow); rescale the weights"
            )
        ).cast("long")
    )
    return (
        df.crossJoin(F.broadcast(maxw))
        .filter(lhs < (F.col(weight_col).cast("long") * F.lit(r)))
        .drop("__maxw")
    )
