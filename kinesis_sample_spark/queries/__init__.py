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
# ROUND-16 WINDOW: CORRECTNESS_r15 went 50/50 green, settling the
# entire round-14 wave (193 -> 239 settled). This round's rotation:
#   14 slots — never-green (mandatory): the round-16 wave —
#              SQL programmability: q337 SQL scalar UDF (inlined), q338
#              SQL table function (month spine), q339 session variables
#              (literal pushdown), q340 parameter binding (named/
#              positional/EXECUTE IMMEDIATE), q341 SQL scripting
#              (bisection quantile), q344 collated grouping;
#              Arrow transports: q342 Arrow-optimized scalar UDF, q343
#              Arrow-optimized UDTF;
#              physical-layout promotions: q345 bucketed co-located join
#              (shuffle-freedom raised in-query), q346 salted skew join
#              (vs the unsalted oracle);
#              Python DataSource completion: q347 LIVE streaming source
#              (A9 resume law through a durable sink), q348 custom batch
#              sink (task-write/driver-commit, abort-tested), q349 the
#              fully custom source->sink micro-batch pipeline (batchId-
#              idempotent commit), q350 row-level ForeachWriter sink
#              (epoch/partition-named idempotent replay).
#   4 slots  — settlement-eligible (one more green settles): the
#              round-15 additions q333-q336 (CollectMetrics, mapInArrow,
#              applyInArrow, cogrouped applyInArrow).
#   32 slots — minimum-evidence backfill: the least-evidenced settled
#              band (q120-q153 plus q40), oldest evidence first.
#              Free slots doing settlement re-verification are the
#              verification budget working (VERDICT r15 §next).
#
# ROUND-15 WINDOW, kept for provenance: 4 never-green round-15
# additions (q333-q336) + 46 settlement-eligible round-14 carries;
# went 50/50 green (CORRECTNESS_r15.json).
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
    # -- settlement-eligible (one more green settles)
    "q337_sql_udf_pricing_bands",
    "q338_sql_tvf_month_spine",
    "q339_session_variable_threshold",
    "q340_parameterized_binding",
    "q341_scripting_bisection_quantile",
    "q342_arrow_udf_digit_census",
    "q343_arrow_udtf_bit_census",
    "q344_collated_grouping",
    "q345_bucketed_join_audit",
    "q346_salted_skew_join",
    "q347_live_python_stream_source",
    "q348_python_sink_roundtrip",
    "q349_live_python_stream_pipeline",
    "q350_live_foreach_row_sink",
    "q120_multiprobe_rerank",
    "q121_label_centroids",
    "q122_bloom_decontamination",
    "q123_importance_weights",
    "q124_pii_redaction",
    "q125_pagerank_part_supplier",
    "q126_live_stream_static_enrich",
    "q127_canonical_selection",
    "q128_winsorized_stats",
    "q129_hard_negative_mining",
    "q130_source_overlap_matrix",
    "q131_live_session_windows",
    "q132_countmin_heavy_hitters",
    "q133_frame_sampling",
    "q137_curriculum_bins",
    "q138_dedup_rate_per_source",
    "q139_scd2_intervals",
    "q140_workspace_manifest",
    "q141_transition_mining",
    "q142_int8_quantization",
    "q143_snapshot_diff",
    "q144_bpe_pair_counts",
    "q145_covariance_moments",
    "q146_interval_overlap_join",
    "q147_join_key_skew_audit",
    "q148_content_defined_chunks",
    "q149_top_terms_per_source",
    "q150_triangle_count",
    "q151_udtf_user_sessions",
    "q152_prefix_filter_simjoin",
    "q153_live_left_outer_join",
    "q40_token_stats",
    # -- minimum-evidence backfill (oldest evidence first)
    "q50_media_features",
    "q58_array_ops",
    "q59_string_extras",
    "q99_ols_regression",
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
    "kinesis_sample_spark.queries.sqlprog",
    "kinesis_sample_spark.queries.physical",
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
