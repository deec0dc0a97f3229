"""CI pins for the r15 invariance axes (tools/format_fuzz.py and
tools/partition_invariance.py --mode plan are the full-registry
round tools; these distill each axis to a fast representative subset
so a regression in either property fails CI, not just a round tool).

Representative queries chosen to cover the plan shapes the axes
exercise: a broadcast-eligible equi-join + agg (shipping_priority),
a window/top-k (window_top_orders), a text/explode aggregation
(wordcount), and an embedding/array pipeline (ann_cosine_topk).
"""

from __future__ import annotations

import math

import pytest

from corral_spark.queries import REGISTRY

SF = "/root/testdata/sf0.001"
REPRESENTATIVE = (
    "shipping_priority",
    "window_top_orders",
    "wordcount",
    "ann_cosine_topk",
)


def _canon(df):
    def norm(v):
        if isinstance(v, float):
            return math.nan if math.isnan(v) else v
        if isinstance(v, list):
            return tuple(norm(x) for x in v)
        if isinstance(v, dict):
            # Keep semantically identical to tools/format_fuzz.py's
            # canon (r15 ADVICE): map columns must not sort rows by
            # insertion-ordered dict repr.
            return tuple(sorted((k, norm(x)) for k, x in v.items()))
        return v

    cols = sorted(df.columns)
    return sorted(
        (tuple(norm(r[c]) for c in cols) for r in df.collect()),
        key=repr,
    )


@pytest.fixture(scope="module")
def format_twin(tmp_path_factory):
    """sf0.001 rewritten by the round tool's own writer
    (tools/format_fuzz.build: v1 pages, no dictionary, 512-row
    groups, gzip, reversed column order, no statistics) so the CI pin
    always exercises exactly the round tool's knob set (r15 ADVICE —
    a hardcoded copy here drifted the moment the tool grew a
    row_group_size parameter)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import format_fuzz

    out = tmp_path_factory.mktemp("format_twin")
    format_fuzz.build(SF, str(out), row_group_size=512)
    return str(out)


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_format_invariance(spark, name, format_twin):
    """Same logical data under hostile parquet physics -> bit-identical
    results (reader invariance; full-registry runs in SCALE.md r15)."""
    q = REGISTRY[name]
    assert _canon(q.spark(spark, SF)) == _canon(q.spark(spark, format_twin))


PLAN_ADVERSARIAL = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.codegen.wholeStage": "false",
    "spark.sql.adaptive.enabled": "false",
}


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_plan_strategy_invariance(spark, name):
    """The answer must not depend on which physical plan Catalyst
    picks: broadcasts off (joins degrade to shuffle), whole-stage
    codegen off (interpreted expressions), AQE off (no re-plan)."""
    q = REGISTRY[name]
    defaults = {k: spark.conf.get(k) for k in PLAN_ADVERSARIAL}
    base = _canon(q.spark(spark, SF))
    try:
        for k, v in PLAN_ADVERSARIAL.items():
            spark.conf.set(k, v)
        hostile = _canon(q.spark(spark, SF))
    finally:
        for k, v in defaults.items():
            spark.conf.set(k, v)
    assert base == hostile
