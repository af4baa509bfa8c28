#!/usr/bin/env python
"""Fresh-session replay of the DRIVER_WINDOW queries against their
DuckDB oracles — the standard pre-driver check that protects the
window's settlement streaks from an environment surprise (round-13
formalization of the recipe run ad hoc since round 10).

Usage: python tools/window_replay.py [sf_dir]   (default sf0.01)
Exits nonzero if any window query fails its oracle.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesis_sample_spark.queries import DRIVER_WINDOW, load_registry
from kinesis_sample_spark.session import get_spark, release_checkpoints


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from tests.oracle_harness import compare, duck_connection

    spark = get_spark("window-replay")
    con = duck_connection(sf_dir)
    registry = load_registry()

    results = {}
    for name in DRIVER_WINDOW:
        q = registry[name]
        release_checkpoints(spark)
        try:
            if q.oracle is None:
                n = q.fn(spark, sf_dir).count()
                # rows_only pass = the query executed without raising;
                # the row count is recorded for the log, not gated.
                results[name] = {"check": "rows_only", "rows": n, "ok": True}
            else:
                cmp = compare(name, q.fn(spark, sf_dir), con, q.oracle)
                results[name] = {
                    "check": "oracle",
                    "rows": cmp.spark_rows,
                    "ok": cmp.ok,
                }
        except Exception as exc:  # noqa: BLE001 — the surprise this tool exists to catch
            results[name] = {"check": "error", "ok": False, "error": str(exc)}
        print(f"{name:45s} {'OK' if results[name]['ok'] else 'FAIL'}")
    n_ok = sum(r["ok"] for r in results.values())
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "window": len(DRIVER_WINDOW),
                "passed": n_ok,
                "all_ok": n_ok == len(DRIVER_WINDOW),
            }
        )
    )
    return 0 if n_ok == len(DRIVER_WINDOW) else 1


if __name__ == "__main__":
    raise SystemExit(main())
