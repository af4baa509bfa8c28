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
# round, so iteration order IS the verification budget. Rounds 1-3 produced
# green rows for 144 of 177 queries (r03 was 50/50). This round-4 window
# closes the evidence gap: every query that has NEVER had a green driver
# row goes first — q38_kmeans_ivf_ann leads (the only ever-red row, r02
# hash fail; its oracle was rebuilt in round 3 as fully-unrolled Lloyd
# iterations and has now had its decimal rounding pinned on both sides),
# then the q134-q136 format round-trips deferred from round 3, then the
# round-3 additions q154-q183, then q184 (new this round: the A11
# bounded-retry + DLQ operator under a live driver gate).
#
# That is 34 slots; the remaining 16 re-confirm once-green queries whose
# evidence is most load-bearing: the 9 frozen bench queries (their
# correctness underwrites every BENCH_r*.json number) and 7 float- or
# state-heavy singles (approx sketches, percentiles, decimal rollups,
# live stateful/CDC paths, q38's labeled sibling q37).
#
# test_registry_hygiene.py enforces this mechanically: while never-green
# queries exist, the window MUST contain all of them (so a q38 can never
# be deferred again), and no slot may re-verify a twice-green query.
#
# ROUND-5 ROTATION QUEUE (assuming CORRECTNESS_r04 lands green): the
# never-green set is then EMPTY — every registry query has a hard driver
# row. Round 5's window should (a) re-enter any r04 failure first
# (mandatory, hygiene-enforced), then (b) re-confirm once-green queries
# by OLDEST evidence: the round-1 greens not re-confirmed this round
# (q04, q06-q13, q15-q18, q44-q49, q51-q55, q70-q76, q84-q91, q93-q98,
# q114-q116), float-/state-sensitive ones first (q46/q90 decimal
# revenue, q61 approx already re-confirmed here, q83 cosine profiles,
# q80/q81/q106 live). Two consecutive green rounds settle a query
# permanently (the twice-green exclusion then locks it out of future
# windows), so rotating ~50 once-green names per round converges the
# whole registry to settled in ~3 rounds.
# ---------------------------------------------------------------------------
DRIVER_WINDOW: tuple[str, ...] = (
    # -- the only driver row ever to fail (r02): rebuilt oracle, pinned
    #    rounding — lands its green first this round
    "q38_kmeans_ivf_ann",
    # -- format round-trips deferred from round 3
    "q134_json_roundtrip_agg",
    "q135_csv_roundtrip_agg",
    "q136_orc_roundtrip_agg",
    # -- round-3 additions, never driver-checked
    "q154_bm25_topk",
    "q155_window_frame_gallery",
    "q156_hof_gallery",
    "q157_cogroup_reconcile",
    "q158_semantic_dedup",
    "q159_histogram_quantiles",
    "q160_producer_source_scan",
    "q162_exact_percentiles",
    "q163_map_ops_gallery",
    "q164_live_update_mode",
    "q165_regex_gallery",
    "q166_try_functions",
    "q167_date_arithmetic",
    "q168_recursive_cte",
    "q169_variant_payload",
    "q170_pipe_syntax",
    "q171_live_transform_with_state",
    "q172_lateral_topk",
    "q173_row_value_in",
    "q174_sql_sugar",
    "q175_time_weighted_avg",
    "q176_sequence_continuity",
    "q177_hll_sketch_merge",
    "q178_media_resize",
    "q179_schema_evolution_union",
    "q180_codec_roundtrip",
    "q181_first_conversion_path",
    "q182_incremental_store_dedup",
    "q183_bitmap_distinct",
    # -- new this round: A11 bounded-retry + poison-DLQ, live-gated
    "q184_live_retry_dlq",
    # -- re-confirmations: the 9 frozen bench queries ...
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q14_top_orders_per_customer",
    "q23_tumbling_window",
    "q27_asof_purchase_view",
    "q31_minhash_lsh",
    "q34_cosine_topk",
    "q92_waiting_suppliers",
    # -- ... and 7 float-/state-heavy once-green singles
    "q37_ivf_ann",
    "q48_quantity_percentiles",
    "q61_approx_stats",
    "q77_training_corpus_pipeline",
    "q82_live_stateful_counts",
    "q96_hypertable_rollup",
    "q112_live_cdc_upsert",
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
