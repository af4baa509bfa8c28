#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes fully via the no-op sink (format("noop")) so timing
covers scan→compute→exchange without sink I/O. A small warmup action
amortizes JVM/codegen startup out of the per-query numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.queries import load_registry
from kinesis_sample_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    registry = load_registry()
    bench_queries = {n: q for n, q in sorted(registry.items()) if q.bench}

    spark = get_spark("bench")
    # Warmup: run every headline plan once at the smallest SF so whole-stage
    # codegen + JIT compile outside the timed region; the timed pass then
    # measures steady-state execution, which is what a long-running cluster
    # job actually sees.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for q in bench_queries.values():
            q.fn(spark, warm_dir).write.mode("overwrite").format("noop").save()
    load_table(spark, SF_DIR, "lineitem").count()

    # Best-of-3 with attempts interleaved round-robin across queries: a
    # transient noisy-neighbor burst then degrades at most one attempt per
    # query instead of all three back-to-back attempts of whichever query
    # it overlaps (runs vary ±20% on a shared box; each attempt still
    # executes fully through the noop sink).
    best: dict[str, float] = {n: float("inf") for n in bench_queries}
    for _ in range(3):
        for name, q in bench_queries.items():
            t0 = time.perf_counter()
            q.fn(spark, SF_DIR).write.mode("overwrite").format("noop").save()
            best[name] = min(best[name], time.perf_counter() - t0)
    timings = {n: round(v, 4) for n, v in best.items()}

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_query_runtime",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # additions-only visibility (round-16 verdict): echo the
                # session's ACTUAL core count and effective shuffle
                # partitioning so a lower-core driver run is
                # distinguishable from this one in the artifact itself.
                "cpus": spark.sparkContext.defaultParallelism,
                "shuffle_partitions": int(
                    spark.conf.get("spark.sql.shuffle.partitions")
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
