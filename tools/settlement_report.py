#!/usr/bin/env python
"""Settlement-state report: the mechanical source for each round's
DRIVER_WINDOW rotation.

Reads every CORRECTNESS_r*.json plus the query registry and prints, per
query, its green history and settlement class; then proposes the next
round's 50-slot window under the same policy the hygiene tests enforce
(tests/test_registry_hygiene.py):

1. every never-green query (mandatory),
2. any latest-round failure (re-enter immediately — it is never-green
   under the all-three-gates definition only if it has no OTHER green
   row; a once-green query that just failed re-enters via class 3 with
   its stale evidence),
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
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesis_sample_spark.queries import DRIVER_WINDOW, load_registry
from kinesis_sample_spark.settlement import (
    evidence_key,
    green_sets_by_round,
    histories,
    settled_set,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--window-size", type=int, default=50)
    args = ap.parse_args()

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

    # proposed next window
    queue: list[str] = []
    queue += sorted(never)
    queue += sorted(eligible, key=lambda q: (evidence(q), q))
    backfill = sorted(
        (q for q in registry if q not in settled and q not in never and q not in eligible),
        key=lambda q: (evidence(q), q),
    )
    queue += backfill
    proposal = queue[: args.window_size]

    print(f"\nproposed next {args.window_size}-slot window "
          f"(never-green -> eligible-to-settle -> oldest evidence):")
    for q in proposal:
        cls = (
            "never-green" if q in never
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


if __name__ == "__main__":
    main()
