"""Query registry — single source of truth for the driver contract.

Each operator from SURVEY.md §2 registers here once, with:
- a Spark callable ``(spark, sf_dir) -> DataFrame`` (the engine path), and
- optionally an ANSI-SQL oracle string for DuckDB (the correctness gate).

``__spark_entry__.py`` just re-exports this registry. Column names are
aliased identically on both sides (driver hashes values after sorting
columns by name).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, bench: bool = False):
    """Decorator: register a query implementation."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "", bench=bench)
        return fn

    return deco


# ---------------------------------------------------------------------------
# Driver correctness window.
#
# The external driver hash-checks only the FIRST 50 registry entries per
# round, so iteration order IS the verification budget. Round 5 landed
# 50/50 green and produced the registry's first 9 permanently settled
# queries (the frozen bench set, green r04+r05). The budget therefore
# stays in SETTLEMENT mode, executing the rotation queue the round-5
# comment documented — this window is exactly the one
# tools/settlement_report.py computes from CORRECTNESS_r01–r05, plus the
# one planned surface addition:
#   1 slot  — q186_live_observed_metrics, NEW this round (A17
#             observability lifted to a live driver gate: per-batch
#             ``df.observe`` partials + progress numInputRows accumulated
#             across micro-batches and hash-checked against batch SQL —
#             the last reference behavior expressible as a query;
#             round-5 verdict item 2). Never-green → mandatory.
#   41 slots — the settlement-eligible set (green r05, unsettled):
#             q185 plus the 40 re-confirmed round-1 greens. One more
#             green row settles each permanently, freeing all 41 slots
#             for the remaining long tail from round 7 on.
#   8 slots — minimum-evidence backfill, oldest evidence first per the
#             settlement module's evidence key: q09_set_ops (deferred
#             from round 5, last green r01) then the oldest round-2
#             once-greens (q106 live stream-stream join, q113/q114,
#             q15–q18). q19 carries evidence (1, r02) identical to
#             q15–q18's and rotates in next round — dropping it is what
#             funds q186's slot without starving anything strictly less
#             evidenced (test_window_prioritizes_minimum_evidence).
#
# test_registry_hygiene.py enforces the queue mechanically: never-green
# queries must all be in the window; no slot may re-verify a settled
# (twice-consecutive-green) query; and every other slot must go either to
# a settlement-eligible query or to a minimum-evidence query (no
# strictly-less-evidenced query may sit outside the window).
#
# ROUND-7 ROTATION QUEUE (assuming CORRECTNESS_r06 lands green): the 41
# settlement slots free up (settled count reaches 50) and q186 becomes
# settlement-eligible. Window = any r06 failure first (mandatory), then
# q186 + the 8 backfills again (settling them), then ~41 slots of
# round-2 once-greens in evidence order (q19, q20–q22, q24–q26,
# q28, q30, q32/q33, q35/q36, q41–q43, q51, q56/q57, q62–q69,
# q80/q81/q83, …) — float-/state-sensitive first (q83 cosine profiles,
# q80/q81 live, q62 collect aggs). Steady state settles the previous
# round's fresh greens and back-fills with the oldest remaining
# evidence; the registry converges to fully settled around round 9.
# ---------------------------------------------------------------------------
DRIVER_WINDOW: tuple[str, ...] = (
    # -- new this round: A17 observability, live-gated
    "q186_live_observed_metrics",
    # -- settlement: the 41 eligible (q185 + 40 round-5 greens) — one
    #    more green row settles each permanently
    "q185_live_checkpoint_restart",
    "q04_order_priority",
    "q06_forecast_revenue",
    "q07_inactive_customers",
    "q08_customer_order_counts",
    "q10_distinct_counts",
    "q11_rollup",
    "q12_cube",
    "q13_band_join",
    "q44_pivot_status",
    "q45_grouping_sets",
    "q46_small_quantity_revenue",
    "q47_full_outer_activity",
    "q49_unpivot_balances",
    "q52_null_semantics",
    "q53_props_map_explode",
    "q54_hash_sample",
    "q55_gap_fill_daily",
    "q60_pandas_order_seq",
    "q70_volume_shipping",
    "q71_returned_items",
    "q72_promo_share",
    "q73_large_orders",
    "q74_disjunctive_revenue",
    "q75_best_supplier_per_part",
    "q76_rich_inactive_customers",
    "q84_market_share",
    "q85_profit_by_nation_year",
    "q86_ship_delay_priority",
    "q87_customer_distribution",
    "q88_top_supplier",
    "q89_parts_supplier_counts",
    "q90_small_quantity_revenue",
    "q91_promotion_suppliers",
    "q93_stratified_sample",
    "q94_per_stratum_bottom_k",
    "q95_weighted_sample",
    "q97_benchmark_decontamination",
    "q98_rare_token_ratio",
    "q115_pandas_group_range",
    "q116_udtf_fixed_chunks",
    # -- minimum-evidence backfill (oldest evidence first)
    "q09_set_ops",
    "q106_live_stream_stream_join",
    "q113_containment_neardup",
    "q114_revenue_share_window",
    "q15_running_order_totals",
    "q16_moving_avg_events",
    "q17_trailing_hour_count",
    "q18_customer_balance_distribution",
)


_MODULES = (
    "kinesis_sample_spark.queries.relational",
    "kinesis_sample_spark.queries.advanced",
    "kinesis_sample_spark.queries.tpch_more",
    "kinesis_sample_spark.queries.tpch_deep",
    "kinesis_sample_spark.queries.sampling_rollup",
    "kinesis_sample_spark.queries.contamination",
    "kinesis_sample_spark.queries.semantics",
    "kinesis_sample_spark.queries.extras",
    "kinesis_sample_spark.queries.corpus_quality",
    "kinesis_sample_spark.queries.capstone",
    "kinesis_sample_spark.queries.stats",
    "kinesis_sample_spark.queries.funnels",
    "kinesis_sample_spark.queries.streaming_live",
    "kinesis_sample_spark.queries.windows",
    "kinesis_sample_spark.queries.scalar",
    "kinesis_sample_spark.queries.stream_batch",
    "kinesis_sample_spark.queries.dedup",
    "kinesis_sample_spark.queries.similarity",
    "kinesis_sample_spark.queries.text",
    "kinesis_sample_spark.queries.multimodal",
    "kinesis_sample_spark.queries.pipeline_ops",
    "kinesis_sample_spark.queries.graph",
    "kinesis_sample_spark.queries.reweighting",
    "kinesis_sample_spark.queries.redaction",
    "kinesis_sample_spark.queries.formats",
    "kinesis_sample_spark.queries.versioning",
    "kinesis_sample_spark.queries.retrieval",
    "kinesis_sample_spark.queries.frames",
    "kinesis_sample_spark.queries.cogroup",
    "kinesis_sample_spark.queries.sketches",
    "kinesis_sample_spark.queries.pysource",
    "kinesis_sample_spark.queries.spark4",
)


def load_registry() -> dict[str, Query]:
    """Import all query modules (idempotent) and return the registry,
    reordered so ``DRIVER_WINDOW`` names come first (the driver checks only
    the first 50 entries — see the comment on ``DRIVER_WINDOW``)."""
    for mod in _MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # module not written yet — tolerate during incremental build
            if e.name and e.name.startswith("kinesis_sample_spark"):
                continue
            raise
    ordered = {n: REGISTRY[n] for n in DRIVER_WINDOW if n in REGISTRY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
