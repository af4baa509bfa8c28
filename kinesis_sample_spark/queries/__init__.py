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
# round, so iteration order IS the verification budget. CORRECTNESS_r09
# landed 50/50 green: the 35 settlement-eligible window entries settled
# (settled = 94) and the 15 round-9 additions q191-q205 became
# settlement-eligible. This round-10 window is exactly what
# tools/settlement_report.py --write computed from CORRECTNESS_r01-r09
# (no r09 failures, so no mandatory failure slots):
#   35 slots — the round-10 additions (never-green, mandatory),
#              landed in five batches: q206-q220 (Q17 correlated avg,
#              Q20 semi chain, session bounce/dwell, survival hazard,
#              priority canonical, co-occurrence PMI, percentile
#              bridge, Gini, HHI, Benford, CUSUM, median-of-means,
#              fulfillment latency, dimension variance, 3-itemsets),
#              q221-q226 (weighted median, chi-square independence,
#              activity streaks, transition latency, column profile,
#              rank fusion), q227-q234 (Pareto coverage, seasonality
#              index, RFM, association lift, percent-of-parent, vocab
#              growth, dormant parts, semi-additive EOD rollup),
#              q235-q237 (OHLC bars, new-vs-returning census,
#              brand-affinity matrix), q238-q240 (join-cardinality
#              audit, session conversion by entry type, mix-shift
#              drift series).
#   15 slots — the settlement-eligible set (green r09, unsettled):
#              q191-q205. One more green row settles each
#              (settled -> 109).
#    0 slots — backfills: the 35 displaced by the new batches were
#              once-green only, so no settlement streak was lost; the
#              window is now exactly never-green + eligible.
#
# test_registry_hygiene.py enforces the queue mechanically: any
# latest-round failure must lead the window; never-green queries must
# all be in the window; no slot may re-verify a settled
# (twice-consecutive-green) query; and every other slot must go either
# to a settlement-eligible query or to a minimum-evidence query (no
# strictly-less-evidenced query may sit outside the window).
#
# If r10 lands 50/50: settled -> 109, and the r11 rotation makes the
# 35 round-10 queries settlement-eligible + re-queues the displaced
# backfills; full registry settles ~r13-r14.
#
# ROTATION RULE (mechanical, post-r07): run
#   python tools/settlement_report.py --write
# at round start — it rewrites this assignment in place and refuses to
# leave an uncompilable file. NEVER hand-paste tool output here.
# COMMIT CANARY (no exceptions): an end-of-round snapshot commit is
# forbidden unless BOTH of these just ran clean:
#   python -c "import kinesis_sample_spark.queries"
#   python -m pytest tests/test_registry_hygiene.py -q
# ---------------------------------------------------------------------------
DRIVER_WINDOW: tuple[str, ...] = (
    # -- never-green (mandatory)
    "q206_correlated_avg_quantity",
    "q207_nested_semi_chain",
    "q208_session_bounce",
    "q209_survival_hazard",
    "q210_priority_canonical",
    "q211_cooccurrence_pmi",
    "q212_percentile_bridge",
    "q213_gini_concentration",
    "q214_hhi_concentration",
    "q215_benford_audit",
    "q216_cusum_changepoint",
    "q217_median_of_means",
    "q218_fulfillment_latency",
    "q219_dimension_variance",
    "q220_itemset3_support",
    "q221_weighted_median",
    "q222_chi_square_independence",
    "q223_activity_streaks",
    "q224_transition_latency",
    "q225_column_profile",
    "q226_rank_fusion",
    "q227_pareto_coverage",
    "q228_seasonality_index",
    "q229_rfm_segmentation",
    "q230_association_lift",
    "q231_percent_of_parent",
    "q232_vocab_growth",
    "q233_dormant_parts",
    "q234_semiadditive_eod",
    "q235_ohlc_bars",
    "q236_new_vs_returning",
    "q237_brand_affinity",
    "q238_join_cardinality_audit",
    "q239_session_conversion",
    "q240_mix_shift",
    # -- settlement-eligible (one more green settles)
    "q191_revenue_decile_lift",
    "q192_skyline_parts",
    "q193_ngram_novelty",
    "q194_token_entropy",
    "q195_bigram_cross_entropy",
    "q196_zorder_layout_audit",
    "q197_mad_outliers",
    "q198_copurchase_pairs",
    "q199_ks_drift",
    "q200_decay_attribution",
    "q201_k_anonymity_audit",
    "q202_transition_entropy",
    "q203_rolling_distinct_users",
    "q204_inverted_index",
    "q205_referential_integrity",
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
