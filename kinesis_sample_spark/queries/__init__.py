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
# round, so iteration order IS the verification budget.
#
# ROUND-15 WINDOW (consolidation): CORRECTNESS_r14 went 50/50 green, so
# all 50 round-14 slots became settlement-eligible (one more green
# settles them). The settlement tool kept 46 of them and placed the
# four round-15 additions first:
#   4 slots  — never-green (mandatory): q333_observed_metrics_audit
#              (batch Observation/CollectMetrics, opstats),
#              q334_int8_quantization_audit (mapInArrow, similarity),
#              q335_label_medoids (applyInArrow, similarity),
#              q336_wasserstein_drift (cogrouped applyInArrow, cogroup).
#   46 slots — settlement-eligible round-14 queries + 3 of the 7
#              backfills (q111/q117/q118/q119 displaced — they stay
#              once-green and settle on their next windowed green).
#
# Round-14 window history (43 new + 7 backfills), kept for provenance:
#   43 slots — never-green (mandatory): the round-14 additions —
#              first wave q290-q313 (live fan-in/fan-out, sketch-merge
#              algebra, bipartite projections, incremental components,
#              mutual-kNN, percolation, skylines, weighted sampling,
#              phrase-index law, z-order audit, grid density, k-core,
#              bootstrap CI); second wave q314-q324 — power-iteration
#              PC1 (robuststats), Misra-Gries merge law (sketches),
#              live rate-limited backlog (streaming_live), Haar energy
#              + Allen census + SAX motifs (temporal), rendezvous
#              rebalance (opstats), CUPED + KS-exponential (inference),
#              Neyman allocation (reweighting), Heaps' law (textcal);
#              third wave q325-q327 — BFS hop histogram
#              (graph_metrics), reservoir merge-closure law (sketches),
#              Little's-law conservation (temporal); fourth wave q328 —
#              live GroupState event-time timeout (streaming_live +
#              streaming/stateful.timeout_sessions), q329 — weighted
#              Bellman-Ford distances (graph_metrics), q330 —
#              cluster-bootstrap ratio CI (inference), q331 — state
#              store read back as a batch table (streaming_live),
#              q332 — density-peak basins via native recursive CTE
#              (graph_metrics).
#   7 slots  — backfills: the least-evidenced settled/once-green
#              queries (displacing a backfill costs nothing; every
#              displaced name was a min-evidence once-green).
#
# test_registry_hygiene.py enforces the queue mechanically: any
# latest-round failure must lead the window; never-green queries must
# all be in the window; no slot may re-verify a settled
# (twice-consecutive-green) query; and every other slot must go either
# to a settlement-eligible query or to a minimum-evidence query (no
# strictly-less-evidenced query may sit outside the window).
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
    "q333_observed_metrics_audit",
    "q334_int8_quantization_audit",
    "q335_label_medoids",
    "q336_wasserstein_drift",
    # -- settlement-eligible (one more green settles)
    "q290_live_union_two_streams",
    "q291_live_union_dedup_across_streams",
    "q292_live_union_heterogeneous_schema",
    "q293_live_priority_merge_latest",
    "q294_hll_merge_invariance",
    "q295_countmin_merge_skew",
    "q296_histogram_merge_commutativity",
    "q297_sample_union_stability",
    "q298_supplier_projection",
    "q299_part_projection_density",
    "q300_bipartite_degree_balance",
    "q301_incremental_components",
    "q302_affected_community_delta",
    "q303_mutual_topk_pairs",
    "q304_percolation_threshold_sweep",
    "q305_pareto_skyline_parts",
    "q306_supplier_skyline_3d",
    "q307_weighted_sample_es",
    "q308_phrase_index_consistency",
    "q309_zorder_locality_audit",
    "q310_grid_density_clusters",
    "q311_kcore_census",
    "q312_bootstrap_mean_ci",
    "q313_live_dual_sink_consistency",
    "q314_power_iteration_pc1",
    "q315_misra_gries_bounds",
    "q316_live_rate_limited_backlog",
    "q317_haar_wavelet_energy",
    "q318_rendezvous_rebalance",
    "q319_cuped_variance_reduction",
    "q320_neyman_allocation",
    "q321_allen_interval_census",
    "q322_sax_motif_census",
    "q323_heaps_vocabulary_growth",
    "q324_ks_exponential_fit",
    "q325_bfs_hop_histogram",
    "q326_reservoir_merge_law",
    "q327_little_law_conservation",
    "q328_live_session_timeout",
    "q329_bellman_ford_distances",
    "q330_cluster_ratio_bootstrap",
    "q331_live_state_store_audit",
    "q332_peak_basin_clusters",
    "q108_partition_fingerprints",
    "q109_retention_cohorts",
    "q110_funnel_conversion",
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
    "kinesis_sample_spark.queries.graph_metrics",
    "kinesis_sample_spark.queries.temporal",
    "kinesis_sample_spark.queries.robuststats",
    "kinesis_sample_spark.queries.bizaudit",
    "kinesis_sample_spark.queries.textcal",
    "kinesis_sample_spark.queries.opstats",
    "kinesis_sample_spark.queries.inference",
    "kinesis_sample_spark.queries.frontier",
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
