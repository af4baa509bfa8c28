#!/usr/bin/env python
"""Dump explain("formatted") for the round-16 optimization targets into
plans/r16/<query>_<tag>.txt (tag = before|after). The judge checks the
optimization claims in OPTIMIZATION_r16.md against these files.

Usage: python tools/plans_r16.py <tag> [query ...]
       (no query args = the default target list below)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesis_sample_spark.queries import load_registry
from kinesis_sample_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r16"
)

#: bench headline set + the compute-heavy registry tail under examination
DEFAULT_TARGETS = (
    # bench set (frozen 10)
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q14_top_orders_per_customer",
    "q23_tumbling_window",
    "q27_asof_purchase_view",
    "q31_minhash_lsh",
    "q34_cosine_topk",
    "q36_embedding_neardup",
    "q92_waiting_suppliers",
    # registry compute tail (LATENCY_r16 top non-live entries)
    "q341_scripting_bisection_quantile",
    "q343_arrow_udtf_bit_census",
    "q152_prefix_filter_simjoin",
    "q301_incremental_components",
    "q312_bootstrap_mean_ci",
    "q314_power_iteration_pc1",
    "q337_sql_udf_pricing_bands",
    "q150_triangle_count",
    "q332_peak_basin_clusters",
    "q345_bucketed_join_audit",
    "q125_pagerank_part_supplier",
    "q302_affected_community_delta",
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    targets = sys.argv[2:] or list(DEFAULT_TARGETS)
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plans-r16")
    registry = load_registry()
    for name in targets:
        q = registry[name]
        spark.sparkContext.setJobDescription(f"plans_r16:{name}")
        try:
            df = q.fn(spark, SF)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — record, keep dumping
            plan = f"PLAN DUMP FAILED: {exc!r}"
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — sf_dir={SF} — tag={tag}\n\n{plan}\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
