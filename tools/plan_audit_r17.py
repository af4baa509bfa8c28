#!/usr/bin/env python
"""Whole-registry static plan audit (round-17 re-run of the r16 audit):
one explain("formatted") per non-live batch query at sf0.01, extracting
exchange count, per-table scan counts, BatchEvalPython/ArrowEvalPython,
CartesianProduct and single-partition exchanges. Appends one JSON line
per query (resumable).

Usage: python tools/plan_audit_r17.py [out_jsonl]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesis_sample_spark.plans.inspect import formatted_plan
from kinesis_sample_spark.queries import load_registry
from kinesis_sample_spark.session import get_spark, release_checkpoints

SF = "/root/testdata/sf0.01"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/plan_audit_r17.jsonl"
    done = set()
    if os.path.exists(out):
        with open(out) as f:
            for line in f:
                try:
                    done.add(json.loads(line)["query"])
                except Exception:
                    pass
    spark = get_spark("plan-audit-r17")
    registry = load_registry()
    todo = [n for n in sorted(registry) if "_live_" not in n and n not in done]
    print(f"auditing {len(todo)} batch queries ({len(done)} done)")
    with open(out, "a") as f:
        for name in todo:
            release_checkpoints(spark)
            t0 = time.time()
            try:
                plan = formatted_plan(registry[name].fn(spark, SF))
            except Exception as exc:  # noqa: BLE001
                f.write(json.dumps({"query": name, "error": repr(exc)[:200]}) + "\n")
                f.flush()
                continue
            scans = {
                t: plan.count(f"{t}.parquet")
                for t in TABLES
                if plan.count(f"{t}.parquet")
            }
            rec = {
                "query": name,
                "build_sec": round(time.time() - t0, 2),
                "exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
                "scans": scans,
                "multi_scan": {t: c for t, c in scans.items() if c >= 3},
                "batch_eval_py": plan.count("BatchEvalPython"),
                "arrow_eval_py": plan.count("ArrowEvalPython")
                + plan.count("MapInArrow")
                + plan.count("MapInPandas"),
                "cartesian": plan.count("CartesianProduct"),
                "single_partition_exchanges": plan.count("SinglePartition"),
            }
            f.write(json.dumps(rec) + "\n")
            f.flush()
    print("done ->", out)


if __name__ == "__main__":
    main()
