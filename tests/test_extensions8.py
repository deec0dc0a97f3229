"""Round-7 second-wave operators: semantic dedup (SemDeDup), int8
scalar-quantized similarity, and target-share domain mixing.

The registry oracles prove cross-engine exactness (test_correctness);
these tests pin the SEMANTIC claims the oracles cannot see: planted
near-duplicates actually cluster, int8 ranking actually tracks the
exact float ranking, and the mixture sampler actually lands on the
requested shares.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _emb(spark, sf_dir=SF_SMOKE):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------- semantic


def test_semantic_dedup_planted_duplicates_cluster(spark):
    """Planting a near-copy of vector v (v + tiny noise) must put both
    in one cluster with the lower id as representative, regardless of
    which cell they land in — near-identical vectors get identical
    cell assignments, so the SemDeDup cell pruning cannot split a
    genuine near-dup pair."""
    from corral_spark.operators.similarity import semantic_dedup

    emb = _emb(spark).select("vec_id", "embedding")
    # Clone vec_id 7 as id 100000 with each component nudged +1e-4.
    clone = (
        emb.filter(F.col("vec_id") == 7)
        .select(
            F.lit(100000).cast("long").alias("vec_id"),
            F.transform(
                "embedding", lambda x: x + F.lit(1e-4)
            ).alias("embedding"),
        )
    )
    out = semantic_dedup(emb.unionByName(clone), ncells=8, threshold=0.9)
    rows = {r.vec_id: r for r in out.collect()}
    assert rows[100000].cluster_rep == 7
    assert rows[7].is_rep and not rows[100000].is_rep


def test_semantic_pairs_restricted_to_cells(spark):
    """Every emitted pair shares a cell assignment — the SemDeDup
    pruning contract (and the reason the pair join is an equi-join,
    never a cross join)."""
    from corral_spark.operators.similarity import (
        deterministic_centroids,
        ivf_assign,
        semantic_near_dup_pairs,
    )

    emb = _emb(spark)
    pairs = semantic_near_dup_pairs(emb, ncells=8, threshold=0.2).collect()
    assert pairs, "no pairs at threshold 0.2 — test corpus changed?"
    cen = deterministic_centroids(emb, 8)
    cells = {
        r.vec_id: r.cell
        for r in ivf_assign(emb, cen, round_sim=6).collect()
    }
    for p in pairs:
        assert cells[p.id_a] == cells[p.id_b]


# ---------------------------------------------------------------- int8


def test_int8_quantization_codes_in_range_and_norm_preserved(spark):
    from corral_spark.functions.vectors import l2_normalize, quantize_int8

    emb = _emb(spark)
    q = emb.select(
        quantize_int8(l2_normalize(F.col("embedding"))).alias("qv")
    )
    stats = q.select(
        F.min(F.array_min("qv")).alias("lo"),
        F.max(F.array_max("qv")).alias("hi"),
        # ||q||^2 should be ~127^2 for a unit vector.
        F.min(
            F.aggregate(
                "qv", F.lit(0).cast("long"), lambda a, x: a + x.cast("long") * x
            )
        ).alias("minsq"),
        F.max(
            F.aggregate(
                "qv", F.lit(0).cast("long"), lambda a, x: a + x.cast("long") * x
            )
        ).alias("maxsq"),
    ).first()
    assert -127 <= stats.lo and stats.hi <= 127
    # Quantization error on 64 dims keeps ||q||^2 within ~5% of 127^2.
    assert 0.9 * 127**2 < stats.minsq and stats.maxsq < 1.1 * 127**2


def test_int8_topk_recall_vs_exact(spark):
    """int8 ranking must track the exact float ranking: mean top-10
    overlap >= 0.8 on the smoke corpus (measured 0.9+; int8 on
    64 dims loses ~1 ulp of cosine resolution per component)."""
    from corral_spark.operators.similarity import cosine_topk
    from corral_spark.queries.registry import REGISTRY

    emb = _emb(spark)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {
        (r.query_id, r.vec_id)
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    q8 = REGISTRY["emb_int8_topk"].spark(spark, SF_SMOKE)
    approx = {(r.query_id, r.vec_id) for r in q8.collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"int8 top-10 recall {recall}"


# ---------------------------------------------------------------- mixing


def test_target_share_sample_hits_target_shares(spark):
    """With a budget well under every group's mass, achieved kept-char
    shares must approach the requested 50/30/20 mix (binomial noise at
    n~hundreds of docs: ±10pp), and unlisted groups must vanish."""
    from corral_spark.operators.sampling import target_share_sample

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    kept = target_share_sample(
        docs,
        "lang",
        "doc_id",
        "n_chars",
        targets={"en": 50, "de": 30, "fr": 20},
        token_budget=30000,
    )
    got = {
        r.lang: r.chars
        for r in kept.groupBy("lang").agg(F.sum("n_chars").alias("chars")).collect()
    }
    assert set(got) <= {"en", "de", "fr"}
    total = sum(got.values())
    shares = {g: c / total for g, c in got.items()}
    for g, want in {"en": 0.5, "de": 0.3, "fr": 0.2}.items():
        assert abs(shares[g] - want) < 0.10, (g, shares)
    # Budget respected in expectation: kept mass within 35% of budget.
    assert 0.65 * 30000 < total < 1.35 * 30000


def test_target_share_sample_cap_branch_keeps_everything(spark):
    """A budget that exceeds every group's mass must keep ALL rows of
    listed groups (rate >= 1 needs no special-casing under the
    u32 < 2^32 identity)."""
    from corral_spark.operators.sampling import target_share_sample

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    kept = target_share_sample(
        docs, "lang", "doc_id", "n_chars",
        targets={"en": 1, "de": 1}, token_budget=10**9,
    )
    want = docs.filter(F.col("lang").isin("en", "de")).count()
    assert kept.count() == want


def test_target_share_sample_validates_inputs(spark):
    from corral_spark.operators.sampling import target_share_sample

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    with pytest.raises(ValueError):
        target_share_sample(docs, "lang", "doc_id", "n_chars", {}, 100)
    with pytest.raises(ValueError):
        target_share_sample(
            docs, "lang", "doc_id", "n_chars", {"en": -1}, 100
        )
    with pytest.raises(ValueError):
        target_share_sample(
            docs, "lang", "doc_id", "n_chars", {"en": 1}, -5
        )


def test_target_share_sample_deterministic_and_stable_under_growth(spark):
    """Content-addressed: the kept set is identical across runs, and a
    row's keep decision depends only on (its hash, its group's totals)
    — so re-running on the same data is a no-op diff."""
    from corral_spark.operators.sampling import target_share_sample

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    kw = dict(targets={"en": 2, "de": 1}, token_budget=3000)
    a = {
        r.doc_id
        for r in target_share_sample(
            docs, "lang", "doc_id", "n_chars", **kw
        ).collect()
    }
    b = {
        r.doc_id
        for r in target_share_sample(
            docs, "lang", "doc_id", "n_chars", **kw
        ).collect()
    }
    assert a == b and a
