"""Plan-shape assertions for the round-10 operators: the scale guarantees
their docstrings claim must be visible in the executed plan (same
discipline as tests/test_plans.py; the global no-cartesian sweep there
already covers these queries)."""

from __future__ import annotations

from kinesis_sample_spark.plans import has_broadcast_join, has_partial_aggregate
from kinesis_sample_spark.queries import load_registry

REGISTRY = load_registry()
SF = "/root/testdata/sf0.01"


def _plan(spark, name: str) -> str:
    return REGISTRY[name].fn(spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_q206_broadcasts_brand_filter_and_coshuffles_threshold(spark):
    """The brand dim filter must broadcast into the fact scan, and the
    per-part threshold must join back as a partkey equi-join (sort-merge
    co-shuffle), never a nested loop."""
    plan = _plan(spark, "q206_correlated_avg_quantity")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q207_semi_join_never_duplicates_suppliers(spark):
    """The big-movers set must attach as LeftSemi (supplier rows can never
    duplicate) with the dims broadcast."""
    plan = _plan(spark, "q207_nested_semi_chain")
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan


def test_q208_single_user_shuffle_end_to_end(spark):
    """Sessionization's two window passes AND both aggregations must ride
    ONE user_id hash exchange — the docstring's 'same partitioning
    end-to-end' claim, pinned."""
    plan = _plan(spark, "q208_session_bounce")
    assert plan.count("hashpartitioning(user_id") == 1, plan[:800]


def test_q221_single_group_shuffle(spark):
    """Weighted median's cumulative window, total window, and the MIN-pick
    aggregation must share one l_returnflag exchange."""
    plan = _plan(spark, "q221_weighted_median")
    assert plan.count("hashpartitioning(l_returnflag") == 1, plan[:800]


def test_q224_single_user_shuffle(spark):
    """The lag window is the only user-keyed pass; the transition
    aggregate re-keys on the bounded (from, to) domain."""
    plan = _plan(spark, "q224_transition_latency")
    assert plan.count("hashpartitioning(user_id") == 1, plan[:800]


def test_q211_vocab_broadcasts(spark):
    """The rank-capped vocabulary must broadcast into the token stream —
    the bound that keeps the pair space k^2, not corpus-sized."""
    assert has_broadcast_join(REGISTRY["q211_cooccurrence_pmi"].fn(spark, SF))


def test_q212_stats_broadcast(spark):
    """The per-flag min/max/width relation (bounded rows) must broadcast
    into both the binning pass and the cumulative relation."""
    assert has_broadcast_join(REGISTRY["q212_percentile_bridge"].fn(spark, SF))


def test_q214_dims_broadcast_and_partial_agg(spark):
    df = REGISTRY["q214_hhi_concentration"].fn(spark, SF)
    assert has_broadcast_join(df)
    assert has_partial_aggregate(df)


def test_scalar_crossjoins_are_broadcast_nested_loop(spark):
    """q215/q229 attach single-row scalar relations via crossJoin — the
    plan must realize them as BroadcastNestedLoopJoin over the broadcast
    scalar (the accepted scalar-composition pattern), never a
    CartesianProduct."""
    for name in ("q215_benford_audit", "q229_rfm_segmentation"):
        plan = _plan(spark, name)
        assert "BroadcastNestedLoopJoin" in plan, name
        assert "CartesianProduct" not in plan, name
