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
