"""Unit tests for the settlement-policy module (the single definition of
driver-evidence state shared by the hygiene tests and the planning tool).
"""

from __future__ import annotations

import json

from kinesis_sample_spark.settlement import (
    evidence_key,
    green_sets_by_round,
    histories,
    latest_round_failures,
    settled_set,
)


def _write_round(tmp_path, n, rows):
    (tmp_path / f"CORRECTNESS_r{n:02d}.json").write_text(json.dumps(rows))


GREEN = {"rows_match": True, "schema_match": True, "hash_match": True}
RED = {"rows_match": True, "schema_match": True, "hash_match": False}


def test_green_sets_require_all_three_gates(tmp_path):
    _write_round(tmp_path, 1, {"qa": GREEN, "qb": RED, "qc": {"rows_match": False}})
    greens = green_sets_by_round(tmp_path)
    assert greens == {1: {"qa"}}


def test_settled_requires_consecutive_rounds(tmp_path):
    _write_round(tmp_path, 1, {"qa": GREEN, "qb": GREEN})
    _write_round(tmp_path, 2, {"qa": GREEN})
    _write_round(tmp_path, 4, {"qb": GREEN})  # green r1 and r4: NOT consecutive
    greens = green_sets_by_round(tmp_path)
    assert settled_set(greens) == {"qa"}


def test_evidence_key_orders_never_then_oldest(tmp_path):
    _write_round(tmp_path, 1, {"qa": GREEN, "qb": GREEN})
    _write_round(tmp_path, 2, {"qa": GREEN})
    greens = green_sets_by_round(tmp_path)
    hist = histories(greens, ["qa", "qb", "qc"])
    assert evidence_key(hist, "qc") == (0, 0)  # never-green sorts first
    assert evidence_key(hist, "qb") == (1, 1)
    assert evidence_key(hist, "qa") == (2, 2)
    assert sorted(["qa", "qb", "qc"], key=lambda q: evidence_key(hist, q)) == [
        "qc",
        "qb",
        "qa",
    ]


def test_latest_round_failures_reads_only_newest_round(tmp_path):
    _write_round(tmp_path, 1, {"qa": RED, "qb": GREEN})
    _write_round(tmp_path, 2, {"qa": GREEN, "qb": RED, "qc": {"rows_match": False}})
    assert latest_round_failures(tmp_path) == {"qb", "qc"}


def test_latest_round_failures_empty_without_reports(tmp_path):
    assert latest_round_failures(tmp_path) == set()
