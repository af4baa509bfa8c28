"""Unit tests for the settlement-policy module (the single definition of
driver-evidence state shared by the hygiene tests and the planning tool).
"""

from __future__ import annotations

import json

from kinesis_sample_spark.settlement import (
    evidence_key,
    green_sets_by_round,
    histories,
    latest_round_failures,
    settled_set,
)


def _write_round(tmp_path, n, rows):
    (tmp_path / f"CORRECTNESS_r{n:02d}.json").write_text(json.dumps(rows))


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True}
RED = {"rows_match": True, "schema_match": True, "hash_match": False}


def test_green_sets_require_all_three_gates(tmp_path):
    _write_round(tmp_path, 1, {"qa": GREEN, "qb": RED, "qc": {"rows_match": False}})
    greens = green_sets_by_round(tmp_path)
    assert greens == {1: {"qa"}}


def test_settled_requires_consecutive_rounds(tmp_path):
    _write_round(tmp_path, 1, {"qa": GREEN, "qb": GREEN})
    _write_round(tmp_path, 2, {"qa": GREEN})
    _write_round(tmp_path, 4, {"qb": GREEN})  # green r1 and r4: NOT consecutive
    greens = green_sets_by_round(tmp_path)
    assert settled_set(greens) == {"qa"}


def test_evidence_key_orders_never_then_oldest(tmp_path):
    _write_round(tmp_path, 1, {"qa": GREEN, "qb": GREEN})
    _write_round(tmp_path, 2, {"qa": GREEN})
    greens = green_sets_by_round(tmp_path)
    hist = histories(greens, ["qa", "qb", "qc"])
    assert evidence_key(hist, "qc") == (0, 0)  # never-green sorts first
    assert evidence_key(hist, "qb") == (1, 1)
    assert evidence_key(hist, "qa") == (2, 2)
    assert sorted(["qa", "qb", "qc"], key=lambda q: evidence_key(hist, q)) == [
        "qc",
        "qb",
        "qa",
    ]


def test_latest_round_failures_reads_only_newest_round(tmp_path):
    _write_round(tmp_path, 1, {"qa": RED, "qb": GREEN})
    _write_round(tmp_path, 2, {"qa": GREEN, "qb": RED, "qc": {"rows_match": False}})
    assert latest_round_failures(tmp_path) == {"qb", "qc"}


def test_latest_round_failures_empty_without_reports(tmp_path):
    assert latest_round_failures(tmp_path) == set()


# ---------------------------------------------------------------------------
# Empty-report semantics (round-7 regression): a CORRECTNESS_r{N}.json of
# `{}` means the driver crashed before observing anything — it must be
# invisible to the evidence model, not read as "every query went un-green".
# ---------------------------------------------------------------------------


def test_empty_report_is_not_an_observed_round(tmp_path):
    _write_round(tmp_path, 1, {"qa": GREEN})
    _write_round(tmp_path, 2, {})  # crashed round: zero observations
    greens = green_sets_by_round(tmp_path)
    assert greens == {1: {"qa"}}


def test_empty_round_does_not_break_settlement_consecutiveness(tmp_path):
    _write_round(tmp_path, 6, {"qa": GREEN, "qb": GREEN})
    _write_round(tmp_path, 7, {})  # the round-7 import failure
    _write_round(tmp_path, 8, {"qa": GREEN})
    greens = green_sets_by_round(tmp_path)
    # qa green in the two consecutive OBSERVED rounds (6, 8) -> settled
    assert settled_set(greens) == {"qa"}


def test_latest_round_failures_skips_empty_newest_report(tmp_path):
    _write_round(tmp_path, 1, {"qa": RED, "qb": GREEN})
    _write_round(tmp_path, 2, {})
    # newest OBSERVED round is 1, so qa is still the live failure signal
    assert latest_round_failures(tmp_path) == {"qa"}


# ---------------------------------------------------------------------------
# Rotation-tool output safety (round-7 regression): --emit-python stdout
# must be nothing but a parseable DRIVER_WINDOW assignment, and --write's
# in-place editor must refuse to leave an uncompilable registry module.
# ---------------------------------------------------------------------------


def test_emit_python_stdout_is_pure_parseable_python():
    import ast
    import pathlib
    import subprocess
    import sys

    repo = pathlib.Path(__file__).resolve().parent.parent
    proc = subprocess.run(
        [sys.executable, str(repo / "tools" / "settlement_report.py"), "--emit-python"],
        capture_output=True,
        text=True,
        check=True,
        cwd=repo,
    )
    tree = ast.parse(proc.stdout)  # raises if any report prose leaked in
    assigns = [n for n in tree.body if isinstance(n, ast.AnnAssign)]
    assert len(tree.body) == 1 and len(assigns) == 1
    assert assigns[0].target.id == "DRIVER_WINDOW"
    assert len(assigns[0].value.elts) == 50


def test_write_registry_window_replaces_assignment(tmp_path):
    import subprocess
    import sys
    import pathlib

    repo = pathlib.Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "tools"))
    try:
        from settlement_report import render_assignment, write_registry_window
    finally:
        sys.path.pop(0)

    module = tmp_path / "reg.py"
    module.write_text(
        "X = 1\n"
        "DRIVER_WINDOW: tuple[str, ...] = (\n"
        "    # -- old\n"
        '    "q_old",\n'
        ")\n"
        "Y = 2\n"
    )
    snippet = render_assignment(
        ["q_never", "q_elig"], {"q_never"}, set(), {"q_elig"}, latest=6
    )
    write_registry_window(snippet, str(module))
    ns: dict = {}
    exec(module.read_text(), ns)
    assert ns["DRIVER_WINDOW"] == ("q_never", "q_elig")
    assert ns["X"] == 1 and ns["Y"] == 2  # surrounding code untouched


def test_round_file_discovery_requires_exact_name(tmp_path):
    """ADVICE r07: a stray CORRECTNESS_r06_local7.json must not shadow
    CORRECTNESS_r06.json (fullmatch, not search)."""
    _write_round(tmp_path, 6, {"qa": GREEN})
    (tmp_path / "CORRECTNESS_r06_local7.json").write_text(json.dumps({"qa": RED}))
    (tmp_path / "CORRECTNESS_r6.json.bak").write_text("{}")
    greens = green_sets_by_round(tmp_path)
    assert greens == {6: {"qa"}}


# ---------------------------------------------------------------------------
# Planner/enforcer consistency, property-based: for ANY evidence history,
# the window settlement.propose_window proposes must satisfy every
# invariant tests/test_registry_hygiene.py enforces. This is what makes
# copying the tool's printed window into DRIVER_WINDOW a mechanical act —
# the planner can never propose something the enforcer rejects.
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_sample_spark.settlement import propose_window

_NAMES = [f"q{i:03d}" for i in range(24)]


@st.composite
def _evidence_state(draw):
    """Random rounds of green sets + a failure set drawn from the latest
    round's non-green queries (the only shape a real report can produce)."""
    n_rounds = draw(st.integers(min_value=0, max_value=6))
    greens = {
        r: draw(st.sets(st.sampled_from(_NAMES), max_size=len(_NAMES)))
        for r in range(1, n_rounds + 1)
    }
    if greens:
        latest = max(greens)
        candidates = sorted(set(_NAMES) - greens[latest])
        failures = (
            draw(st.sets(st.sampled_from(candidates), max_size=len(candidates)))
            if candidates
            else set()
        )
    else:
        failures = set()
    window_size = draw(st.integers(min_value=1, max_value=len(_NAMES)))
    return greens, failures, window_size


@settings(max_examples=300, deadline=None)
@given(_evidence_state())
def test_proposed_window_always_satisfies_enforcer_invariants(state):
    greens, failures, window_size = state
    window = propose_window(greens, failures, _NAMES, window_size)
    wset = set(window)

    # shape: correct size (bounded by unsettled pool), no duplicates
    settled = settled_set(greens)
    pool = [q for q in _NAMES if q not in settled]
    assert len(window) == min(window_size, len(pool))
    assert len(wset) == len(window)

    hist = histories(greens, _NAMES)
    never = {q for q, rs in hist.items() if not rs}
    latest = max(greens) if greens else 0
    eligible = (greens.get(latest, set()) - settled) if greens else set()
    failed = (failures & set(_NAMES)) - never - settled

    # invariant 1 (test_window_excludes_twice_green_queries)
    assert not (settled & wset)

    # invariant 2 (test_window_contains_every_never_green_query)
    if len(never) <= window_size:
        assert never <= wset
    else:
        assert wset <= never

    # invariant 3 (test_window_contains_latest_round_failures)
    if len(never | failed) <= window_size:
        assert failed <= wset

    # invariant 4 (test_window_prioritizes_minimum_evidence): no query
    # outside the window may carry strictly less evidence than a
    # non-mandatory, non-eligible query inside it
    rotational = [q for q in window if q not in never and q not in eligible and q not in failed]
    outside = [
        q
        for q in _NAMES
        if q not in wset
        and q not in settled
        and q not in never
        and q not in eligible
        and q not in failed
    ]
    if rotational and outside:
        worst_in = max(evidence_key(hist, q) for q in rotational)
        starved = [q for q in outside if evidence_key(hist, q) < worst_in]
        assert not starved


def test_rotation_trigger_message_names_the_fix(monkeypatch):
    """A red hygiene suite caused by freshly landed driver evidence must
    say so (round-9 verdict item 8): the failure message names the exact
    command (`settlement_report.py --write`) so nobody misreads the
    designed rotation trigger as engine breakage."""
    import pytest

    import test_registry_hygiene as hyg
    from kinesis_sample_spark.settlement import ROTATION_HINT

    monkeypatch.setattr(hyg, "green_sets_by_round", lambda: {1: {"qx"}, 2: {"qx"}})
    monkeypatch.setattr(hyg, "DRIVER_WINDOW", ["qx"])
    with pytest.raises(AssertionError) as exc:
        hyg.test_window_excludes_twice_green_queries()
    assert ROTATION_HINT in str(exc.value)
    assert "settlement_report.py --write" in ROTATION_HINT


def test_reverify_since_voids_pre_rewrite_greens(tmp_path, monkeypatch):
    """A query listed in REVERIFY_SINCE must lose every green earned
    before its rewrite round: it re-enters planning as never-green even
    though the raw artifacts would have settled it (the q36 case — a
    semantically rewritten implementation cannot ride evidence earned by
    the code it replaced)."""
    import kinesis_sample_spark.settlement as st

    _write_round(tmp_path, 1, {"qa": GREEN, "qb": GREEN})
    _write_round(tmp_path, 2, {"qa": GREEN, "qb": GREEN})
    _write_round(tmp_path, 3, {"qb": GREEN})
    monkeypatch.setattr(st, "REVERIFY_SINCE", {"qa": 3})
    greens = st.green_sets_by_round(tmp_path)
    # qa's r1/r2 greens are void; qb's survive untouched
    assert greens == {1: {"qb"}, 2: {"qb"}, 3: {"qb"}}
    assert st.settled_set(greens) == {"qb"}
    hist = st.histories(greens, ["qa", "qb"])
    assert st.evidence_key(hist, "qa") == (0, 0)  # never-green again
    # a fresh green AT/AFTER the rewrite round counts normally
    _write_round(tmp_path, 4, {"qa": GREEN})
    _write_round(tmp_path, 5, {"qa": GREEN})
    greens2 = st.green_sets_by_round(tmp_path)
    assert st.settled_set(greens2) == {"qb", "qa"}
