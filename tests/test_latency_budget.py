"""Slow-lane latency budget: catch plan-shape regressions in the long
tail the frozen 9-query bench can't see (round-5 verdict item 6).

Every *batch* registry query runs once at sf0.01 under a generous
per-query ceiling derived from the newest committed full-registry sweep
(highest-numbered LATENCY_r*.json, measured at sf0.1): ceiling =
max(FLOOR, 3x the sf0.1 number). Since sf0.01 is 10x smaller than the calibration scale,
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

import functools
import json
import pathlib
import time

import pytest

from kinesis_sample_spark.queries import load_registry

REGISTRY = load_registry()
REPO = pathlib.Path(__file__).resolve().parent.parent

FLOOR_S = 10.0  # absolute floor — CI boxes stall for seconds at a time
DEFAULT_S = 30.0  # uncalibrated (new) queries


@functools.lru_cache(maxsize=1)
def _newest_calibration() -> "tuple[dict | None, str]":
    """(queries dict, reason) from the newest sweep artifact; (None,
    why) when absent or unusable. Highest ROUND NUMBER (parsed, not
    lexicographic — r100 > r99 and a hypothetical LATENCY_r06_local7.json
    must not shadow LATENCY_r06.json), and the artifact must be the
    sf0.1 sweep the 3x-ceiling math assumes. Loaded lazily inside the
    test so a missing artifact skips the budget lane instead of killing
    collection of the whole suite (the round-7 failure class)."""
    import re

    best: tuple[int, pathlib.Path] | None = None
    for p in REPO.glob("LATENCY_r*.json"):
        m = re.fullmatch(r"LATENCY_r(\d+)\.json", p.name)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), p)
    if best is None:
        return None, "no LATENCY_r*.json calibration artifact found"
    art = json.loads(best[1].read_text())
    if art.get("sf") != 0.1:
        return None, f"{best[1].name} is not the sf0.1 sweep"
    return art["queries"], best[1].name


def test_missing_calibration_reports_reason_instead_of_raising(tmp_path, monkeypatch):
    """ADVICE r07: an absent/unusable sweep artifact must skip the budget
    lane, never abort suite collection (the round-7 failure class)."""
    import tests.test_latency_budget as mod

    monkeypatch.setattr(mod, "REPO", tmp_path)
    mod._newest_calibration.cache_clear()
    try:
        cal, reason = mod._newest_calibration()
        assert cal is None and "no LATENCY" in reason
        (tmp_path / "LATENCY_r09.json").write_text(
            json.dumps({"sf": 0.01, "queries": {}})
        )
        mod._newest_calibration.cache_clear()
        cal, reason = mod._newest_calibration()
        assert cal is None and "not the sf0.1 sweep" in reason
    finally:
        mod._newest_calibration.cache_clear()  # repo-path result must not leak


BATCH_QUERIES = sorted(n for n in REGISTRY if "_live_" not in n)


def _ceiling(name: str) -> float:
    calibration, _ = _newest_calibration()
    base = (calibration or {}).get(name)
    return max(FLOOR_S, 3.0 * base) if base is not None else DEFAULT_S


@pytest.mark.slow
@pytest.mark.parametrize("name", BATCH_QUERIES)
def test_latency_budget(name, spark, oracle_sf_dir):
    calibration, reason = _newest_calibration()
    if calibration is None:
        pytest.skip(f"latency budget uncalibrated: {reason}")
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
