"""operators/workspace.py — materialized pipeline stages.

Three properties: (1) the pipeline's kept-set equals the registry
operators it composes (q69 components + q127 canonical policy), (2) a
re-run with an intact workspace recomputes nothing (file mtimes frozen),
(3) a crashed stage (no _SUCCESS) is recomputed, not half-read.
"""

from __future__ import annotations

import os
import time

from kinesis_sample_spark.operators.workspace import materialize, prepare_corpus
from kinesis_sample_spark.queries import load_registry

SF = "/root/testdata/sf0.001"


def _mtimes(root: str) -> dict[str, float]:
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out[p] = os.path.getmtime(p)
    return out


def test_prepare_corpus_matches_registry_operators(spark, tmp_path):
    R = load_registry()
    stages = prepare_corpus(spark, SF, str(tmp_path / "ws"))
    # canonical stage == q127's (component, canonical_doc) pairs
    want = {
        (r["component"], r["canonical_doc"])
        for r in R["q127_canonical_selection"].fn(spark, SF).collect()
    }
    got = {
        (r["component"], r["canonical_doc"]) for r in stages["canonical"].collect()
    }
    assert got == want
    # kept = all docs minus non-canonical cluster members
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    n_members = stages["clusters"].count()
    n_clusters = stages["canonical"].count()
    assert stages["kept"].count() == n_docs - (n_members - n_clusters)
    # manifest totals agree with kept
    assert (
        stages["manifest"].agg({"n_kept": "sum"}).collect()[0][0]
        == stages["kept"].count()
    )


def test_rerun_recomputes_nothing(spark, tmp_path):
    ws = str(tmp_path / "ws")
    prepare_corpus(spark, SF, ws)
    before = _mtimes(ws)
    time.sleep(1.1)  # mtime resolution guard
    stages = prepare_corpus(spark, SF, ws)
    assert _mtimes(ws) == before, "intact workspace must not be rewritten"
    assert stages["kept"].count() > 0


def test_crashed_stage_is_recomputed(spark, tmp_path):
    ws = str(tmp_path / "ws")
    stages = prepare_corpus(spark, SF, ws)
    kept_before = stages["kept"].count()
    # simulate a crash mid-write: _SUCCESS missing ⇒ stage must rebuild
    os.remove(os.path.join(ws, "kept", "_SUCCESS"))
    stages2 = prepare_corpus(spark, SF, ws)
    assert os.path.exists(os.path.join(ws, "kept", "_SUCCESS"))
    assert stages2["kept"].count() == kept_before


def test_materialize_cuts_lineage(spark, tmp_path):
    df = spark.range(10).withColumnRenamed("id", "x")
    out = materialize(df, str(tmp_path / "m"))
    # the returned relation scans parquet, not the in-memory range
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "parquet" in plan.lower()
    assert out.count() == 10
