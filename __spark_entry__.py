"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``kinesis_sample_spark/``; this file only adapts
the registry to the driver's shape.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may load this file from any cwd — make the package importable
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from kinesis_sample_spark.queries import load_registry  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _assert_observability_live(spark: SparkSession) -> None:
    """A17 evidence that survives q186's settlement out of the driver
    window: the driver runs ``entry`` every round, so this re-proves the
    observed-metrics surface (``df.observe`` partials delivered through
    ``StreamingQueryListener.observedMetrics``) each time. A tiny 2-file
    replay with one observed count must deliver totals equal to the
    fixture's true row count; any break in the listener seam raises here
    with its own message instead of surfacing downstream."""
    import shutil
    import time
    import uuid

    from pyspark.sql import functions as F

    from kinesis_sample_spark.catalog import load_table
    from kinesis_sample_spark.scratch import scratch_dir
    from kinesis_sample_spark.sources.files import (
        replay_events_stream,
        write_stream_fixture,
    )
    from kinesis_sample_spark.streaming.observe import ObservedMetricsListener

    base = scratch_dir(prefix="kss_entry_a17_")
    metric = f"entry_a17_{uuid.uuid4().hex[:8]}"
    listener = ObservedMetricsListener(metric)
    spark.streams.addListener(listener)
    try:
        events_dir = write_stream_fixture(spark, SMOKE_SF_DIR, base, n_files=2)
        expected = load_table(spark, SMOKE_SF_DIR, "events").count()
        q = (
            replay_events_stream(spark, events_dir, files_per_trigger=2)
            .observe(metric, F.count(F.lit(1)).alias("n_records"))
            .writeStream.format("noop")
            .trigger(availableNow=True)
            .start()
        )
        if not q.awaitTermination(120):
            q.stop()
            raise RuntimeError("entry A17 smoke: replay did not drain in 120 s")
        deadline = time.monotonic() + 60
        while listener.totals().get("n_records", 0) < expected:
            if time.monotonic() >= deadline:
                raise RuntimeError(
                    f"entry A17 smoke: observed "
                    f"{listener.totals().get('n_records', 0)}/{expected} rows "
                    f"after 60 s — listener bus delivery broken"
                )
            time.sleep(0.25)
        # ADVICE r08: the query has drained and the bus has caught up, so
        # over-delivery (duplicate observedMetrics events) must fail too —
        # exact equality, matching q186's check, not just "enough rows".
        time.sleep(0.5)  # let any straggler duplicate event land first
        got = listener.totals().get("n_records", 0)
        if got != expected:
            raise RuntimeError(
                f"entry A17 smoke: observed {got} rows, expected exactly "
                f"{expected} — duplicate/over-delivered observed metrics"
            )
    finally:
        spark.streams.removeListener(listener)
        shutil.rmtree(base, ignore_errors=True)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001, after
    an observability smoke (A17) that rides every driver round.

    ADVICE r08: a smoke failure is an observability-infra problem, not a
    flagship-query problem — re-raise it with an unambiguous prefix so the
    evidence trail never mis-attributes it to q01_pricing_summary."""
    reg = load_registry()
    try:
        _assert_observability_live(spark)
    except Exception as exc:  # noqa: BLE001 — annotate, then propagate
        raise RuntimeError(
            "A17 OBSERVABILITY SMOKE FAILED (infra, not the flagship "
            f"q01_pricing_summary query): {exc}"
        ) from exc
    return reg["q01_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible ops)."""
    return {name: q.oracle for name, q in load_registry().items() if q.oracle is not None}
