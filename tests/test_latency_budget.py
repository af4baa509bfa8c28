"""Slow-lane latency budget: catch plan-shape regressions in the long
tail the frozen 9-query bench can't see (round-5 verdict item 6).

Every *batch* registry query runs once at sf0.01 under a generous
per-query ceiling derived from the committed round-5 full-registry sweep
(LATENCY_r05.json, measured at sf0.1): ceiling = max(FLOOR, 3x the
sf0.1 number). Since sf0.01 is 10x smaller than the calibration scale,
a breach is never noise — it means the physical plan fell off a cliff
(a lost broadcast, a new shuffle, a cartesian blow-up), exactly the
failure mode plan-tests guard for a handful of queries and this guards
for all of them.

Live streaming queries (``_live_`` in the name) are excluded: their
time is fixed MicroBatchExecution startup per incarnation, not data
volume, so a data-scale budget would only measure scheduler noise.
New queries without a round-5 calibration row get the DEFAULT ceiling.
"""

from __future__ import annotations

import json
import pathlib
import time

import pytest

from kinesis_sample_spark.queries import load_registry

REGISTRY = load_registry()
REPO = pathlib.Path(__file__).resolve().parent.parent

FLOOR_S = 10.0  # absolute floor — CI boxes stall for seconds at a time
DEFAULT_S = 30.0  # uncalibrated (new) queries
CALIBRATION = json.loads((REPO / "LATENCY_r05.json").read_text())["queries"]

BATCH_QUERIES = sorted(n for n in REGISTRY if "_live_" not in n)


def _ceiling(name: str) -> float:
    base = CALIBRATION.get(name)
    return max(FLOOR_S, 3.0 * base) if base is not None else DEFAULT_S


@pytest.mark.slow
@pytest.mark.parametrize("name", BATCH_QUERIES)
def test_latency_budget(name, spark, oracle_sf_dir):
    t0 = time.perf_counter()
    REGISTRY[name].fn(spark, oracle_sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()
    elapsed = time.perf_counter() - t0
    limit = _ceiling(name)
    assert elapsed <= limit, (
        f"{name} took {elapsed:.1f}s at sf0.01 — over its {limit:.1f}s budget "
        f"(3x its sf0.1 calibration); the plan likely lost a broadcast or "
        f"grew a shuffle — diff .explain('formatted') against the last "
        f"green round"
    )
