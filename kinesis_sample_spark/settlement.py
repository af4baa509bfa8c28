"""Settlement policy — the single definition of driver-evidence state.

Both the hygiene tests (tests/test_registry_hygiene.py, which REJECT a
bad DRIVER_WINDOW) and the planning tool (tools/settlement_report.py,
which PROPOSES the next one) interpret the accumulated
``CORRECTNESS_r*.json`` rounds. Keeping the green-gate definition, the
settled fold, and the evidence ordering here means a change to any of
them (say, a fourth gate key in the driver's report) cannot desynchronize
the enforcer from the planner.

Definitions:

- **green**: a driver row with all three gates true
  (rows_match ∧ schema_match ∧ hash_match).
- **observed round**: a CORRECTNESS report with at least one row. An
  EMPTY report (``{}`` — the driver crashed before testing anything,
  e.g. round 7's import failure) carries no evidence for or against any
  query and is invisible to every function here: it is not the "latest"
  round, it does not break settlement consecutiveness, and it
  contributes no failures.
- **settled**: green in two CONSECUTIVE observed rounds — permanently
  excluded from future windows (one green can be luck; two in a row is
  evidence). Consecutive means adjacent in the sorted list of observed
  rounds: a no-evidence round between two greens does not reset a
  query's settlement progress, because nothing was observed in between.
- **evidence key**: (ever-green count ascending, last-green round
  ascending) — the re-verification priority for unsettled queries.
"""

from __future__ import annotations

import json
import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parent.parent


def _round_files(repo: pathlib.Path = REPO) -> dict[int, pathlib.Path]:
    """The one definition of CORRECTNESS report discovery (round → path),
    shared by every reader below so the glob/round-number rule cannot
    drift between the green fold and the failure class."""
    out: dict[int, pathlib.Path] = {}
    for p in repo.glob("CORRECTNESS_r*.json"):
        m = re.fullmatch(r"CORRECTNESS_r(\d+)\.json", p.name)
        if m:
            out[int(m.group(1))] = p
    return out


def _observed_rounds(repo: pathlib.Path = REPO) -> dict[int, dict]:
    """Round → report rows, EXCLUDING empty reports. An empty artifact
    means the driver produced zero observations that round (e.g. the
    package failed to import); it must not masquerade as a round in
    which every query silently went un-green."""
    out: dict[int, dict] = {}
    for rnd, p in _round_files(repo).items():
        rows = json.loads(p.read_text())
        if rows:
            out[rnd] = rows
    return out


def _is_green(row: dict) -> bool:
    return bool(row.get("rows_match") and row.get("schema_match") and row.get("hash_match"))


#: Settled queries whose implementation was SEMANTICALLY REWRITTEN after
#: the evidence that settled them was earned: green rows from rounds
#: before the rewrite round prove the OLD implementation, not the one
#: that ships. Mapping query name -> first round whose evidence counts.
#: Both the planner (tools/settlement_report.py) and the enforcer
#: (tests/test_registry_hygiene.py) read greens through the filter below,
#: so a listed query re-enters the window as never-green until it
#: re-settles on the new form — then its entry here should be removed.
REVERIFY_SINCE: dict[str, int] = {
    # (empty) q36_embedding_neardup rode here rounds 12-13 after its
    # round-10 banded-hyperplane-LSH rewrite; it re-settled on the new
    # form with driver greens in rounds 12 and 13, so the entry was
    # removed in round 14 per its own removal rule above.
}


def green_sets_by_round(repo: pathlib.Path = REPO) -> dict[int, set[str]]:
    """Queries with all three gates true, per OBSERVED round (empty
    CORRECTNESS reports are skipped — no observations, no round).
    Greens earned before a query's ``REVERIFY_SINCE`` round are
    dropped: pre-rewrite evidence does not speak for the shipped
    code."""
    return {
        rnd: {
            n
            for n, r in rows.items()
            if _is_green(r) and rnd >= REVERIFY_SINCE.get(n, 0)
        }
        for rnd, rows in _observed_rounds(repo).items()
    }


def latest_round_failures(repo: pathlib.Path = REPO) -> set[str]:
    """Queries with a NON-green row in the most recent OBSERVED round's
    report — the driver saw them and at least one gate
    (rows/schema/hash) failed. These re-enter the next window
    immediately: a failure is the strongest possible evidence-staleness
    signal, stronger than any (count, last-green-round) ordering can
    express. An empty newest report is skipped: zero rows means zero
    observations, not zero failures in 180 queries."""
    observed = _observed_rounds(repo)
    if not observed:
        return set()
    rows = observed[max(observed)]
    return {n for n, r in rows.items() if not _is_green(r)}


ROTATION_HINT = (
    "rotation pending — newly landed driver evidence changed settlement "
    "state; run `python tools/settlement_report.py --write` and commit"
)
"""Prefix the hygiene tests put on rotation-trigger failures so a red
suite caused by a freshly landed CORRECTNESS artifact is never misread
as engine breakage (round-9 verdict item 8)."""


def settled_set(greens: dict[int, set[str]]) -> set[str]:
    """Queries green in two consecutive OBSERVED rounds (adjacent in the
    sorted round list — a no-evidence round in between, like the empty
    r07 artifact, does not reset settlement progress)."""
    settled: set[str] = set()
    rounds = sorted(greens)
    for prev, cur in zip(rounds, rounds[1:]):
        settled |= greens[prev] & greens[cur]
    return settled


def histories(
    greens: dict[int, set[str]], names: "list[str] | dict"
) -> dict[str, list[int]]:
    """Per-query sorted list of green rounds (empty = never green)."""
    return {q: [r for r in sorted(greens) if q in greens[r]] for q in names}


def evidence_key(hist: dict[str, list[int]], q: str) -> tuple[int, int]:
    """(ever-green count, last green round); (0, 0) for never-green."""
    rs = hist[q]
    return (len(rs), rs[-1] if rs else 0)


def propose_window(
    greens: dict[int, set[str]],
    failures: set[str],
    names: "list[str]",
    window_size: int = 50,
) -> list[str]:
    """The planner's rotation queue as a pure function of evidence state:
    never-green (mandatory) → latest-round failures (re-enter) →
    settlement-eligible → minimum-evidence backfill, truncated to the
    window size. tools/settlement_report.py prints this; the property
    suite proves any proposal satisfies the hygiene-test invariants for
    ANY evidence history, so the planner can never propose a window the
    enforcer rejects."""
    settled = settled_set(greens)
    hist = histories(greens, names)
    never = {q for q, rs in hist.items() if not rs}
    latest = max(greens) if greens else 0
    eligible = (greens.get(latest, set()) - settled) if greens else set()
    failed = (set(failures) & set(names)) - never - settled

    def ev(q: str) -> tuple[tuple[int, int], str]:
        return (evidence_key(hist, q), q)

    # eligible ∩ failed is impossible from one well-formed report (a row
    # is either green or not), but keep the queue total anyway: such a
    # query rides the eligible class rather than being double-booked or,
    # worse, dropped from both
    queue: list[str] = sorted(never)
    queue += sorted(failed - eligible, key=ev)
    queue += sorted(eligible, key=ev)
    queue += sorted(
        (
            q
            for q in names
            if q not in settled and q not in never and q not in eligible and q not in failed
        ),
        key=ev,
    )
    return queue[:window_size]
