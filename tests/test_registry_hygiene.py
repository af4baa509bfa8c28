"""Registry hygiene: keep the driver's 50-entry correctness window pointed
at the frontier.

The external driver hash-checks only the first 50 registry entries per
round, so iteration order is the verification budget. These tests pin the
two invariants that protect it:

1. every registry entry carries an oracle, or documents its rows-only
   rationale in the docstring (so "no oracle" is always a decision, never
   an accident), and
2. the first 50 entries contain no query that already has green driver
   rows in two consecutive rounds — re-verifying settled queries wastes
   window slots that unverified queries need.
"""

from __future__ import annotations

from kinesis_sample_spark.queries import DRIVER_WINDOW, load_registry
from kinesis_sample_spark.settlement import (
    ROTATION_HINT,
    evidence_key,
    green_sets_by_round,
    histories,
    latest_round_failures,
    settled_set,
)

REGISTRY = load_registry()

WINDOW_SIZE = 50


def test_driver_window_is_exactly_the_driver_budget():
    assert len(DRIVER_WINDOW) == WINDOW_SIZE
    assert len(set(DRIVER_WINDOW)) == WINDOW_SIZE, "duplicate names in DRIVER_WINDOW"
    missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
    assert not missing, f"DRIVER_WINDOW names not in registry: {missing}"
    assert list(REGISTRY)[:WINDOW_SIZE] == list(DRIVER_WINDOW)


def test_every_entry_has_oracle_or_documented_rationale():
    undocumented = [
        n
        for n, q in REGISTRY.items()
        if q.oracle is None and "rows-only" not in q.doc.lower()
    ]
    assert not undocumented, (
        f"queries without oracle nor a 'rows-only' docstring rationale: {undocumented}"
    )


def test_window_excludes_twice_green_queries():
    """No slot in the 50-entry window may be spent on a query whose
    correctness is already settled by green rows in two consecutive
    driver rounds (one green row can be luck; two in a row is evidence)."""
    settled = settled_set(green_sets_by_round())
    stale = settled & set(DRIVER_WINDOW)
    assert not stale, (
        f"{ROTATION_HINT}. Twice-green queries still in the window: "
        f"{sorted(stale)}"
    )


def test_window_contains_every_never_green_query():
    """The rotation queue as a mechanical invariant (round-3 verdict item
    7): while any registry query has never received a green driver row,
    the window MUST contain all of them — deferring an unproven query
    (the way q38 sat red from round 2 to round 4) is a test failure, not
    a judgment call. If the never-green set ever outgrows the window,
    every slot must go to never-green queries."""
    greens = green_sets_by_round()
    ever_green: set[str] = set()
    for g in greens.values():
        ever_green |= g
    never_green = set(REGISTRY) - ever_green
    if len(never_green) <= WINDOW_SIZE:
        deferred = never_green - set(DRIVER_WINDOW)
        assert not deferred, (
            f"never-driver-green queries left out of the window: {sorted(deferred)}"
        )
    else:
        wasted = set(DRIVER_WINDOW) - never_green
        assert not wasted, (
            f"never-green backlog exceeds the window, yet slots re-verify "
            f"green queries: {sorted(wasted)}"
        )


def test_window_contains_latest_round_failures():
    """A query the driver just saw go red must re-enter the very next
    window — current behavior is unproven regardless of how many green
    rows history holds. Same mandatory-inclusion rule as never-green
    (which subsumes failures with no green history at all)."""
    greens = green_sets_by_round()
    ever_green: set[str] = set()
    for g in greens.values():
        ever_green |= g
    never = set(REGISTRY) - ever_green
    failed = latest_round_failures() & set(REGISTRY)
    mandatory = never | failed
    if len(mandatory) <= WINDOW_SIZE:
        deferred = failed - set(DRIVER_WINDOW)
        assert not deferred, (
            f"latest-round failures left out of the window: {sorted(deferred)}"
        )


def test_window_prioritizes_minimum_evidence():
    """Settlement-progress invariant (round-4 verdict item 3): the
    mechanical form of the rotation-queue comment on ``DRIVER_WINDOW``.

    Beyond the never-green entries (mandatory, previous test) every slot
    must be spent on one of exactly three legitimate things:

    - a *latest-round failure* — a query the driver just saw go red
      (settlement.latest_round_failures); a fresh failure outranks any
      evidence-count ordering, so the planner's class-2 queue jump must
      not be rejected here (planner and enforcer share the definition),
    - a *settlement-eligible* query — green in the latest recorded round
      and not yet settled, so one more green row settles it permanently
      (buying a freed slot every future round), or
    - a *minimum-evidence* query — re-confirming the registry's least
      trustworthy evidence, where evidence is ordered by (ever-green
      count ascending, last-green round ascending).

    Concretely: no query outside the window may carry strictly less
    evidence than a non-eligible query inside it. This is what stops a
    round-6+ window from drifting back to re-verifying fresh greens
    while round-1/2 observations age unrechecked."""
    greens = green_sets_by_round()
    if not greens:
        return
    latest = max(greens)
    settled = settled_set(greens)
    hist = histories(greens, REGISTRY)
    never = {q for q, rs in hist.items() if not rs}
    eligible = greens[latest] - settled

    def evidence(q: str) -> tuple[int, int]:
        return evidence_key(hist, q)

    failed = latest_round_failures() & set(REGISTRY)
    rotational = [
        q
        for q in DRIVER_WINDOW
        if q not in never and q not in eligible and q not in failed
    ]
    outside = [
        q
        for q in REGISTRY
        if q not in set(DRIVER_WINDOW)
        and q not in settled
        and q not in never
        and q not in eligible
        and q not in failed
    ]
    if not rotational or not outside:
        return
    worst_in = max(evidence(q) for q in rotational)
    starved = sorted(q for q in outside if evidence(q) < worst_in)
    assert not starved, (
        f"{ROTATION_HINT}. Window re-verifies evidence {worst_in} while "
        f"strictly less-evidenced queries sit outside it: {starved}"
    )


def test_every_entry_has_a_docstring():
    """A ``\"\"\"...\"\"\".format(...)`` first statement is NOT a docstring
    (Python only binds a bare string literal to ``__doc__``), so the
    registry silently stored ``doc=''`` for 30 queries until round 15.
    Guard the whole registry: every entry must carry a non-empty doc,
    because the rows-only rationale check (above) and the judge's parity
    reading both key off it."""
    empty = [name for name, q in REGISTRY.items() if not (q.doc or "").strip()]
    assert not empty, (
        f"registry entries with empty doc (a .format()-suffixed pseudo-"
        f"docstring is the usual cause): {empty}"
    )


def test_no_degenerate_zero_row_oracles():
    """A 0-row result passes the hash gate trivially (empty == empty), so
    a query that silently filters everything out would look green while
    checking nothing. Every oracle must return rows at sf0.01."""
    import duckdb

    from kinesis_sample_spark.queries import load_registry

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.01/{t}.parquet'"
        )
    zero = [
        name
        for name, q in load_registry().items()
        if q.oracle is not None and not con.execute(q.oracle).fetchall()
    ]
    assert not zero, f"degenerate 0-row oracles: {zero}"


def test_docstring_literals_match_module_constants():
    """The round-15 docstring sweep (e8408e6) inlined ``.format(...)``
    values as literals — which Python binds to ``__doc__``, unlike a
    format-suffixed string, but which can silently drift if the module
    constant later changes (round-15 ADVICE). This pin table rebuilds
    each inlined phrase FROM the live constant at test time: change the
    constant without updating the docstring and the pin fails, naming
    the query and the stale phrase."""
    from kinesis_sample_spark.queries import (
        bizaudit,
        graph_metrics,
        inference,
        opstats,
        retrieval,
        robuststats,
        similarity,
        sketches,
        streaming_live,
        temporal,
        textcal,
    )

    reg = load_registry()
    pins = {
        "q270_largest_remainder_alloc": [
            f"allocation: {bizaudit._ALLOC_POINTS} integer points",
        ],
        "q241_copurchase_communities": [
            f"support >= {graph_metrics.COMMUNITY_MIN_SUPPORT}:",
            f"support threshold (>= {graph_metrics.COMMUNITY_MIN_SUPPORT})",
        ],
        "q301_incremental_components": [
            f"pre-{graph_metrics.DELTA_CUT} graph",
            f"support threshold (>= {graph_metrics.COMMUNITY_MIN_SUPPORT})",
        ],
        "q302_affected_community_delta": [
            f"pre-{graph_metrics.DELTA_CUT} thresholded graph",
        ],
        "q304_percolation_threshold_sweep": [
            f"support thresholds {graph_metrics._PERC_TS}",
        ],
        "q311_kcore_census": [
            f"Census per k in {graph_metrics._KCORE_KS}",
            f"converged within {graph_metrics._KCORE_UNROLL} rounds",
        ],
        "q325_bfs_hop_histogram": [
            f"1, 2, ... {graph_metrics._BFS_HOPS} co-purchase hops",
            f"eccentricity-at-{graph_metrics._BFS_HOPS}",
        ],
        "q283_hill_tail_index": [
            f"top k={inference._HILL_K} order statistics",
            f"then a {inference._HILL_K}-row aggregate",
        ],
        "q287_rank_stability_rbo": [
            f"depth {inference._RBO_DEPTH})",
            f"top-{inference._RBO_DEPTH} parts",
        ],
        "q312_bootstrap_mean_ci": [
            f"B={inference._BOOT_B} replicas",
            f"all {inference._BOOT_B} resamples",
        ],
        "q282_control_chart": [
            f"first {opstats._SPC_BASELINE_MONTHS} months freeze",
        ],
        "q318_rendezvous_rebalance": [
            f"{opstats._HRW_OLD}→{opstats._HRW_NEW} scale-out",
        ],
        "q308_phrase_index_consistency": [
            f"top-{retrieval._PHRASE_TOP} bigrams",
        ],
        "q255_markov_stationary": [
            f"{robuststats._MARKOV_ITERS} unrolled iterations",
        ],
        "q262_rank_sum_test": [
            f"'{robuststats._RS_A}' and '{robuststats._RS_B}'",
        ],
        "q314_power_iteration_pc1": [
            f"hung DuckDB at K={robuststats._PC1_ITERS}",
            f"top-{robuststats._PC1_TOPK} dimensions",
        ],
        "q303_mutual_topk_pairs": [
            f"top-{similarity._MUTUAL_K} —",
        ],
        "q315_misra_gries_bounds": [
            f"k={sketches._MG_K} counters per partition-group",
            f"({sketches._MG_G} groups x {sketches._MG_K} counters",
        ],
        "q326_reservoir_merge_law": [
            f"R={sketches._RES_R} smallest md5 ranks",
            f"the {sketches._RES_G} group reservoirs",
        ],
        "q316_live_rate_limited_backlog": [
            f"{streaming_live._BACKLOG_FILES} time-sliced files",
            f"exactly {streaming_live._BACKLOG_FILES} data batches",
        ],
        "q250_cohort_ltv": [
            f"0..{temporal._LTV_MONTHS} —",
            f"(cohort x {temporal._LTV_MONTHS}) grid",
        ],
        "q256_peak_days": [
            f"Top {temporal._PEAK_TOP} peaks",
        ],
        "q258_ewma_smoothing": [
            f"trailing {temporal._EWMA_WINDOW} days",
            f"a = {temporal._EWMA_ALPHA}.",
        ],
        "q272_revenue_spread": [
            f"capped at {temporal._SPREAD_CAP} months",
            f"{temporal._SPREAD_CAP}-month cap",
        ],
        "q317_haar_wavelet_energy": [
            f"first-{temporal._HAAR_N}-day",
        ],
        "q322_sax_motif_census": [
            f"{temporal._SAX_N} days -> {temporal._SAX_SEGS} PAA segments "
            f"({temporal._SAX_W}-day sums)",
        ],
        "q245_prefix_lcp_neardup": [
            f"first {textcal._LCP_BLOCK} characters",
            f"capped at {textcal._LCP_CAP} docs",
        ],
        "q248_zipf_slope": [
            f"top {textcal._ZIPF_RANKS} token ranks",
            f"runs on {textcal._ZIPF_RANKS} rows",
        ],
        "q259_dedup_agreement": [
            f"{textcal._LCP_BLOCK}-char prefixes",
            f"{textcal._LCP_CAP}-doc cap",
        ],
        "q263_term_burstiness": [
            f"df >= {textcal._BURST_MIN_DF} filter",
            f"for the top {textcal._BURST_TOP}",
            f"top-{textcal._BURST_TOP} window",
        ],
    }
    stale = []
    for name, phrases in pins.items():
        doc = reg[name].doc
        for p in phrases:
            if p not in doc:
                stale.append((name, p))
    assert not stale, (
        "docstring literal drifted from its module constant "
        f"(update the docstring to match): {stale}"
    )
