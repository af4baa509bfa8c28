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
)


def load_registry() -> dict[str, Query]:
    """Import all query modules (idempotent) and return the registry."""
    for mod in _MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError as e:
            # module not written yet — tolerate during incremental build
            if e.name and e.name.startswith("kinesis_sample_spark"):
                continue
            raise
    return REGISTRY
