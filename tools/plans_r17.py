#!/usr/bin/env python
"""Dump explain("formatted") for the round-17 optimization targets into
plans/r17/<query>_<tag>.txt (tag = before|after). The judge checks the
optimization claims in OPTIMIZATION_r17.md against these files.

For q341 the returned DataFrame is the script's LocalTableScan result,
so the dump additionally includes the plan of the bisection's scratch
view (q341_cents in the before tree, q341_cents_hist after) — that view
is what every scripted statement re-plans, i.e. the thing the
optimization changed.

Usage: python tools/plans_r17.py <tag> [query ...]
       (no query args = the default target list below)

Run the `before` tag from a worktree checked out at the pre-round
commit; the OUT_DIR constant keeps writing into the MAIN repo's
plans/r17 so both tags land side by side.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesis_sample_spark.queries import load_registry
from kinesis_sample_spark.session import get_spark, release_checkpoints

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.environ.get(
    "SPARK_GRAFT_PLANS_OUT", "/root/repo/plans/r17"
)

DEFAULT_TARGETS = (
    "q341_scripting_bisection_quantile",
    "q152_prefix_filter_simjoin",
    "q104_rolling_zscore",
    "q100_locf_fill",
)


def main() -> None:
    tag = sys.argv[1]
    targets = sys.argv[2:] or DEFAULT_TARGETS
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("plans-r17")
    registry = load_registry()
    for name in targets:
        release_checkpoints(spark)
        df = registry[name].fn(spark, SF)
        parts = [
            f"# {name} — sf_dir={SF} — tag={tag}\n",
            df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            ),
        ]
        if name.startswith("q341"):
            for view in ("q341_cents", "q341_cents_hist"):
                try:
                    vdf = spark.table(view)
                except Exception:
                    continue
                parts.append(
                    f"\n# -- plan of scratch view `{view}` (what each scripted"
                    " statement re-plans) --\n"
                )
                parts.append(
                    vdf._sc._jvm.PythonSQLUtils.explainString(
                        vdf._jdf.queryExecution(), "formatted"
                    )
                )
        out = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(out, "w") as f:
            f.write("\n".join(parts))
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
