#!/usr/bin/env python
"""Assemble the round-16 evidence artifacts from the sweep logs.

Reads the logs tools/r16_sweeps.sh wrote to /tmp and writes
PARITY_SF01_r16.json, PARITY_ALT7_r16.json, LATENCY_r16.json with
final-tree (registry 344) results + provenance notes.
"""

from __future__ import annotations

import json
import statistics

NOTE_TAIL = (
    "round-16 FINAL tree (registry 344: the q337-q350 wave — SQL "
    "programmability (scalar/table SQL UDFs, session variables, parameter "
    "binding, scripting, collation), Arrow-optimized Python UDF/UDTF, "
    "bucketed-join and salted-skew-join oracle promotions, and the Python "
    "DataSource completion: streaming source with A9 resume, batch sink, "
    "stream pipeline, ForeachWriter — plus the round-15 advice fixes)"
)


def load_json_from_log(path: str) -> dict:
    with open(path) as f:
        txt = f.read()
    start = txt.index('{\n "summary"') if '{\n "summary"' in txt else txt.index("{")
    return json.loads(txt[start:])


def main() -> None:
    corr = load_json_from_log("/tmp/r16_corr01.log")
    assert corr["summary"]["all_ok"], "sf0.1 parity not green — do not assemble"
    corr["summary"]["note"] = (
        f"whole-registry ({corr['summary']['total']} queries) DuckDB "
        f"value-hash parity at sf0.1, local[32], fresh session, "
        f"tools/correctness_report.py — {NOTE_TAIL}"
    )
    json.dump(corr, open("/root/repo/PARITY_SF01_r16.json", "w"), indent=1)

    alt = load_json_from_log("/tmp/r16_alt7.log")
    assert alt["summary"]["all_ok"], "alt-7 parity not green — do not assemble"
    alt["summary"]["note"] = (
        f"whole-registry ({alt['summary']['total']} queries) DuckDB "
        f"value-hash parity at sf0.1 under the 7-cpu alternate layout "
        f"(SPARK_GRAFT_CPUS=7) — {NOTE_TAIL}"
    )
    json.dump(alt, open("/root/repo/PARITY_ALT7_r16.json", "w"), indent=1)

    qs: dict = {}
    extras: dict = {}
    with open("/tmp/r16_latency.jsonl") as f:
        for line in f:
            if line.strip():
                rec = json.loads(line)
                qs[rec["query"]] = rec["sec"] if rec["sec"] is not None else rec
                # round-16: the sweep now records JVM/disk-state columns
                # entering each query — carry them into the artifact so
                # the live-query drift diagnosis has data
                extras[rec["query"]] = {
                    k: rec[k]
                    for k in (
                        "rdd_blocks_before",
                        "active_streams_before",
                        "scratch_dirs_before",
                        "scratch_mb_before",
                    )
                    if k in rec
                }
    errs = [n for n, v in qs.items() if not isinstance(v, (int, float))]
    # check errors FIRST: an all-error sweep would otherwise die on
    # median([]) before this diagnostic ever fires
    assert not errs, f"latency sweep errors: {errs}"
    vals = [v for v in qs.values() if isinstance(v, (int, float))]
    top = sorted(
        ((n, v) for n, v in qs.items() if isinstance(v, (int, float))),
        key=lambda kv: -kv[1],
    )[:4]
    max_scratch = max(
        (e.get("scratch_mb_before", 0) for e in extras.values()), default=0
    )
    stream_leaks = [n for n, e in extras.items() if e.get("active_streams_before")]
    art = {
        "metric": "full_registry_latency",
        "unit": "sec",
        "sf": 0.1,
        "note": (
            "one noop-sink attempt per registry query "
            f"(tools/latency_sweep.py), {NOTE_TAIL}, local[32]; "
            f"{len(qs)} queries, {len(errs)} errors. Top: "
            + ", ".join(f"{n} {v:.2f} s" for n, v in top)
            + ". Live-query wall times remain trigger drains, not compute. "
            f"State columns (new this round): active-stream leaks entering "
            f"a query: {stream_leaks or 'none'}; peak scratch footprint "
            f"{max_scratch:.0f} MB. New-query costs are discussed in "
            "SCALING.md round-16."
        ),
        "total": round(sum(vals), 1),
        "median": round(statistics.median(vals), 3),
        "queries": {n: v for n, v in qs.items()},
        "state_before": extras,
    }
    json.dump(art, open("/root/repo/LATENCY_r16.json", "w"), indent=1)
    print(
        f"assembled: parity {corr['summary']['oracle_passed']}/"
        f"{corr['summary']['total']}, alt7 {alt['summary']['oracle_passed']}/"
        f"{alt['summary']['total']}, latency total {art['total']} "
        f"median {art['median']} over {len(qs)}"
    )


if __name__ == "__main__":
    main()
