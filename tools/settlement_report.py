#!/usr/bin/env python
"""Settlement-state report: the mechanical source for each round's
DRIVER_WINDOW rotation.

Reads every CORRECTNESS_r*.json plus the query registry and prints, per
query, its green history and settlement class; then proposes the next
round's 50-slot window under the same policy the hygiene tests enforce
(tests/test_registry_hygiene.py):

1. every never-green query (mandatory),
2. any latest-round failure (re-enters immediately: queries with a
   non-green row in the newest CORRECTNESS report get their own queue
   slot right after the never-green class, ahead of the generic
   evidence ordering — settlement.latest_round_failures),
3. settlement-eligible queries — green in the latest round, not yet
   settled; one more green row settles them permanently,
4. minimum-evidence back-fill — (ever-green count ascending, last-green
   round ascending), so the oldest observations are re-checked first.

Settled queries (green in two CONSECUTIVE rounds) are excluded forever.

The proposal is greedy (settle everything eligible first). When the
eligible set is larger than the window leaves room for, trading some
settlement slots for oldest-evidence re-checks is equally valid under
the hygiene invariant — round 5 did exactly that, spending 40 slots on
round-1 greens (stale, pre-refactor observations) and only 9 on
settling fresh r04 greens. Use the proposal as the default, deviate
deliberately.

Usage: python tools/settlement_report.py [--window-size 50]

With ``--emit-python`` stdout carries ONLY the paste-ready
``DRIVER_WINDOW`` assignment (guaranteed parseable — the round-7 outage
was this tool's human-readable summary getting pasted into the module);
the report prose moves to stderr. With ``--write`` the tool edits
``kinesis_sample_spark/queries/__init__.py`` in place, replacing the
existing assignment, and refuses to leave a file that does not compile —
no paste step at all.
"""

from __future__ import annotations

import argparse
import ast
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesis_sample_spark.queries import DRIVER_WINDOW, load_registry
from kinesis_sample_spark.settlement import (
    evidence_key,
    green_sets_by_round,
    histories,
    latest_round_failures,
    propose_window,
    settled_set,
)


REGISTRY_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "kinesis_sample_spark",
    "queries",
    "__init__.py",
)

_ASSIGNMENT_RE = re.compile(
    r"^DRIVER_WINDOW: tuple\[str, \.\.\.\] = \(\n(?:[^)].*\n)*?\)\n",
    re.MULTILINE,
)


def render_assignment(proposal, never, failed, eligible, latest) -> str:
    """The DRIVER_WINDOW assignment as a self-contained, parseable Python
    snippet — per-class comments only, no report prose."""
    lines = ["DRIVER_WINDOW: tuple[str, ...] = ("]
    last_cls = None
    for q in proposal:
        cls = (
            "never-green (mandatory)" if q in never
            else f"re-entering r{latest:02d} failures" if q in failed and q not in eligible
            else "settlement-eligible (one more green settles)" if q in eligible
            else "minimum-evidence backfill (oldest evidence first)"
        )
        if cls != last_cls:
            lines.append(f"    # -- {cls}")
            last_cls = cls
        lines.append(f'    "{q}",')
    lines.append(")")
    snippet = "\n".join(lines) + "\n"
    ast.parse(snippet)  # the whole point: never emit non-Python again
    return snippet


def write_registry_window(snippet: str, path: str = REGISTRY_PATH) -> None:
    """Replace the existing DRIVER_WINDOW assignment in the registry
    module with ``snippet`` and refuse to leave an uncompilable file."""
    src = open(path).read()
    if not _ASSIGNMENT_RE.search(src):
        raise SystemExit(f"no DRIVER_WINDOW assignment found in {path}")
    new = _ASSIGNMENT_RE.sub(lambda _m: snippet, src, count=1)
    ast.parse(new, filename=path)
    with open(path, "w") as f:
        f.write(new)
    import py_compile

    py_compile.compile(path, doraise=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window-size", type=int, default=50)
    ap.add_argument(
        "--emit-python",
        action="store_true",
        help="print ONLY the paste-ready DRIVER_WINDOW assignment on "
        "stdout (report prose moves to stderr); output is ast.parse-"
        "checked before printing",
    )
    ap.add_argument(
        "--write",
        action="store_true",
        help="rewrite the DRIVER_WINDOW assignment in "
        "kinesis_sample_spark/queries/__init__.py in place "
        "(compile-checked; no paste step)",
    )
    args = ap.parse_args()

    # With --emit-python, stdout must carry ONLY parseable Python.
    import builtins
    import functools

    report = sys.stderr if (args.emit_python or args.write) else sys.stdout
    print = functools.partial(builtins.print, file=report)  # noqa: A001

    registry = load_registry()
    greens = green_sets_by_round()
    latest = max(greens) if greens else 0

    hist = histories(greens, registry)
    settled = settled_set(greens)
    never = {q for q, rs in hist.items() if not rs}
    eligible = (greens.get(latest, set()) - settled) if greens else set()

    def evidence(q: str) -> tuple[int, int]:
        return evidence_key(hist, q)

    print(f"rounds recorded: {sorted(greens)}   registry: {len(registry)}")
    print(
        f"settled: {len(settled)}   never-green: {len(never)}   "
        f"settlement-eligible (green r{latest:02d}, unsettled): {len(eligible)}"
    )

    # proposed next window: never-green, then latest-round failures
    # (explicit class-2 slot — a just-failed once-green query must not
    # lose its place to the generic evidence ordering), then eligible,
    # then minimum-evidence backfill. The queue itself lives in
    # settlement.propose_window, where the property suite proves every
    # proposal satisfies the hygiene-test invariants.
    failed = (latest_round_failures() & set(registry)) - never - settled
    proposal = propose_window(
        greens, latest_round_failures(), list(registry), args.window_size
    )

    print(f"\nproposed next {args.window_size}-slot window "
          f"(never-green -> eligible-to-settle -> oldest evidence):")
    for q in proposal:
        cls = (
            "never-green" if q in never
            else f"FAILED r{latest:02d} (re-enter)" if q in failed and q not in eligible
            else f"settle (green r{hist[q][-1]:02d})" if q in eligible
            else f"evidence {evidence(q)}"
        )
        print(f"  {q:42s} {cls}")

    current = set(DRIVER_WINDOW)
    drop = sorted(current - set(proposal))
    add = sorted(set(proposal) - current)
    print(f"\nvs current DRIVER_WINDOW: +{len(add)} / -{len(drop)}")
    if add:
        print("  add:", ", ".join(add))
    if drop:
        print("  drop:", ", ".join(drop))

    if args.emit_python or args.write:
        snippet = render_assignment(proposal, never, failed, eligible, latest)
        if args.emit_python:
            sys.stdout.write(snippet)
        if args.write:
            write_registry_window(snippet)
            print(f"wrote DRIVER_WINDOW ({len(proposal)} names) to {REGISTRY_PATH}")


if __name__ == "__main__":
    main()
