#!/usr/bin/env python
"""Assemble the round-14 v9 evidence artifacts from the sweep logs.

Reads the logs tools/r14_sweeps_v9.sh wrote to /tmp and rewrites
PARITY_SF01_r14.json, PARITY_ALT7_r14.json, LATENCY_r14.json with
final-tree (v9, registry 326) results + provenance notes.
"""

from __future__ import annotations

import json
import statistics
import sys

NOTE_TAIL = (
    "round-14 FINAL tree (v9, post code-review fixes on the fifth wave q328-q332: live "
    "event-time-timeout sessions, weighted Bellman-Ford, cluster-ratio "
    "bootstrap incl. its pre-agg rewrite, statestore audit, native "
    "recursive-CTE basins)"
)


def load_json_from_log(path: str) -> dict:
    with open(path) as f:
        txt = f.read()
    start = txt.index('{\n "summary"') if '{\n "summary"' in txt else txt.index("{")
    return json.loads(txt[start:])


def main() -> None:
    corr = load_json_from_log("/tmp/r14_corr01_v9.log")
    assert corr["summary"]["all_ok"], "sf0.1 parity not green — do not assemble"
    corr["summary"]["note"] = (
        f"whole-registry ({corr['summary']['total']} queries) DuckDB "
        f"value-hash parity at sf0.1, local[32], fresh session, "
        f"tools/correctness_report.py — {NOTE_TAIL}"
    )
    json.dump(corr, open("/root/repo/PARITY_SF01_r14.json", "w"), indent=1)

    alt = load_json_from_log("/tmp/r14_alt7_v9.log")
    assert alt["summary"]["all_ok"], "alt-7 parity not green — do not assemble"
    alt["summary"]["note"] = (
        f"whole-registry ({alt['summary']['total']} queries) DuckDB "
        f"value-hash parity at sf0.1 under the 7-cpu alternate layout "
        f"(SPARK_GRAFT_CPUS=7) — {NOTE_TAIL}"
    )
    json.dump(alt, open("/root/repo/PARITY_ALT7_r14.json", "w"), indent=1)

    qs = {}
    with open("/tmp/r14_latency_v9.jsonl") as f:
        for line in f:
            if line.strip():
                rec = json.loads(line)
                qs[rec["query"]] = rec["sec"] if rec["sec"] is not None else rec
    errs = [n for n, v in qs.items() if not isinstance(v, (int, float))]
    vals = [v for v in qs.values() if isinstance(v, (int, float))]
    top = sorted(
        ((n, v) for n, v in qs.items() if isinstance(v, (int, float))),
        key=lambda kv: -kv[1],
    )[:4]
    art = {
        "metric": "full_registry_latency",
        "unit": "sec",
        "sf": 0.1,
        "note": (
            "one noop-sink attempt per registry query "
            f"(tools/latency_sweep.py), {NOTE_TAIL}, local[32]; "
            f"{len(qs)} queries, {len(errs)} errors. Top: "
            + ", ".join(f"{n} {v:.2f} s" for n, v in top)
            + ". Live-query wall times remain trigger drains, not "
            "compute; mid-sweep outliers re-time solo per the r08 "
            "protocol (q152: 26.9 s mid-sweep, 9.3-18.9 s solo this v9; 7-8 s v7 — JVM-state drift, code untouched this round)."
        ),
        "total": round(sum(vals), 1),
        "median": round(statistics.median(vals), 3),
        "queries": {n: v for n, v in qs.items()},
    }
    assert not errs, f"latency sweep errors: {errs}"
    json.dump(art, open("/root/repo/LATENCY_r14.json", "w"), indent=1)
    print(
        f"assembled: parity {corr['summary']['oracle_passed']}/"
        f"{corr['summary']['total']}, alt7 {alt['summary']['oracle_passed']}/"
        f"{alt['summary']['total']}, latency total {art['total']} "
        f"median {art['median']} over {len(qs)}"
    )


if __name__ == "__main__":
    main()
