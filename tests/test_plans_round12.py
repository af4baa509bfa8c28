"""Plan-shape assertions for the round-12 operators: the scale guarantees
their docstrings claim must be visible in the executed plan (same
discipline as tests/test_plans.py / test_plans_round10.py; the global
no-cartesian sweep there already covers all registered queries)."""

from __future__ import annotations

from kinesis_sample_spark.plans import has_broadcast_join, has_partial_aggregate
from kinesis_sample_spark.queries import load_registry

REGISTRY = load_registry()
SF = "/root/testdata/sf0.01"


def _df(spark, name: str):
    return REGISTRY[name].fn(spark, SF)


def _plan(spark, name: str) -> str:
    return _df(spark, name)._jdf.queryExecution().executedPlan().toString()


def test_q243_bidirectional_asof_plans_no_join(spark):
    """Both as-of passes are union + running first/last compositions —
    the whole bidirectional pipeline must contain ZERO join operators
    (the docstring's no-row-explosion claim, pinned: a regression to a
    join-based as-of would reintroduce the quadratic risk)."""
    plan = _plan(spark, "q243_asof_forward_spread")
    assert "Join" not in plan, plan[:800]


def test_q244_dimension_broadcast_and_partial_agg(spark):
    """The nation dim must broadcast into the customer scan, and the
    per-(region, nation, bin) sketch build must have a map-side partial
    phase (the mergeable-sketch property the query demonstrates)."""
    df = _df(spark, "q244_histogram_merge_rollup")
    assert has_broadcast_join(df)
    assert has_partial_aggregate(df)
    assert "CartesianProduct" not in _plan(spark, "q244_histogram_merge_rollup")


def test_q246_degree_count_partial_agg(spark):
    """Degree counting must map-side combine (shuffle carries (node,
    count) partials, not one row per edge endpoint)."""
    assert has_partial_aggregate(_df(spark, "q246_degree_distribution"))


def test_q251_backlog_is_equijoin_plus_one_sort(spark):
    """The interval-stab rewrite must NOT plan a range join: the only
    join is the orderkey equi-join to lineitem; the time axis is handled
    by the running-sum window."""
    plan = _plan(spark, "q251_daily_backlog")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_q253_interval_join_rides_user_equijoin(spark):
    """The point-in-time range predicate must ride a user_id equi-join
    (hash or sort-merge), never a nested loop over intervals."""
    plan = _plan(spark, "q253_point_in_time_join")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_q258_weight_table_broadcasts(spark):
    """The 30-row literal weight table must broadcast (the EWMA fan-out
    is a broadcast nested loop against a tiny side by design — what must
    NOT appear is a shuffle of the daily series for it)."""
    df = _df(spark, "q258_ewma_smoothing")
    assert has_broadcast_join(df)


def test_q261_customer_dim_broadcasts(spark):
    """The segment lookup must broadcast into the gap stream."""
    df = _df(spark, "q261_interarrival_stats")
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in _plan(spark, "q261_interarrival_stats")


def test_q266_self_join_is_key_partitioned(spark):
    """The repeat-order self-join must partition on the customer key —
    never a nested loop over orders (the date band is a post-join
    filter inside the customer partition)."""
    plan = _plan(spark, "q266_double_billing_audit")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_q245_blocked_pairing_is_equijoin(spark):
    """Prefix-block pairing must be an equi-join on the block key (the
    cap + blocking is what keeps it from going quadratic globally)."""
    plan = _plan(spark, "q245_prefix_lcp_neardup")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_q257_strided_pairs_are_equijoins(spark):
    """Strided pairing must plan as key-shifted equi-joins — a similarity
    query with no similarity-search scan."""
    plan = _plan(spark, "q257_cosine_pair_distribution")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_q270_allocation_single_orderkey_lineage(spark):
    """Quota, remainder rank, and the per-order rollup must all ride
    l_orderkey partitioning; the only other join is the audit join to
    orders."""
    plan = _plan(spark, "q270_largest_remainder_alloc")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_q275_abc_no_cartesian_and_partial_agg(spark):
    """Per-part revenue and monthly-demand rollups must map-side combine;
    no nested loop anywhere (the only broadcast-nested-loop allowed in
    the family is a deliberate single-row scalar, absent here)."""
    df = _df(spark, "q275_abc_xyz")
    assert has_partial_aggregate(df)
    assert "CartesianProduct" not in _plan(spark, "q275_abc_xyz")


def test_q276_customer_dim_broadcasts(spark):
    """The segment dimension must broadcast into the order scan."""
    assert has_broadcast_join(_df(spark, "q276_bowley_moors"))


def test_q281_fanout_audit_partial_agg(spark):
    """Both aggregates (basket sizes, size distribution) must map-side
    combine; the scalar total joins back as a broadcast."""
    df = _df(spark, "q281_basket_fanout_audit")
    assert has_partial_aggregate(df)
    assert "CartesianProduct" not in _plan(spark, "q281_basket_fanout_audit")


def test_q283_hill_is_rank_window_plus_scalar(spark):
    """The top-k ranking must not cartesian: the k+1 pivot broadcasts
    into the k-row term relation."""
    df = _df(spark, "q283_hill_tail_index")
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in _plan(spark, "q283_hill_tail_index")


def test_q285_ci_rank_lookups_are_equijoins(spark):
    """The order-statistic endpoint lookups must ride the segment rank
    window — no nested loop over the order table."""
    plan = _plan(spark, "q285_median_order_ci")
    assert "CartesianProduct" not in plan


def test_q288_census_rides_blocked_candidates(spark):
    """The cluster census must inherit q31's banded candidate generation
    — never an all-pairs join over documents."""
    plan = _plan(spark, "q288_dedup_cluster_census")
    assert "CartesianProduct" not in plan
