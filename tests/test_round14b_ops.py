"""Cross-checks for the round-14 second wave (q314+): each operator is
re-derived with numpy / pure Python from the raw parquet, so a shared
formulation bug between the query and its DuckDB oracle can't hide.
Same methodology as tests/test_round14_ops.py."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _pd(table, sf=SF):
    return pd.read_parquet(f"{sf}/{table}.parquet")


def _run(spark, name, sf=SF):
    from kinesis_sample_spark.queries import load_registry

    return load_registry()[name].fn(spark, sf).collect()


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# q314 — power-iteration PC1
# ---------------------------------------------------------------------------
def test_q314_pc1_third_impl(spark):
    """Full-precision numpy power iteration from the same start vector
    must land within 1e-4 of the decimal-quantized engine loadings (the
    quantization perturbs each round by <=5e-10), and the structural
    contract must hold exactly: 10 rows, dims in 1..64, |loading|
    non-increasing, one shared eigenvalue, top-10 energy <= 1."""
    emb = _pd("embeddings")
    x = np.asarray(emb.embedding.to_list(), dtype=np.float64)
    # mirror the scaling: micro-unit ints, then unscale
    xl = np.round(x * 1e6)
    n = len(xl)
    s = xl.T @ xl
    muv = xl.sum(axis=0) / 1e6 / n
    cov = s / 1e12 / n - np.outer(muv, muv)
    v = np.full(64, 0.125)
    for _ in range(8):
        w = cov @ v
        v = w / np.sqrt((w * w).sum())
    lam = v @ cov @ v

    rows = _run(spark, "q314_power_iteration_pc1")
    assert len(rows) == 10
    assert all(1 <= r.dim <= 64 for r in rows)
    mags = [abs(r.loading) for r in rows]
    assert mags == sorted(mags, reverse=True)
    assert len({r.eigenvalue for r in rows}) == 1
    assert sum(m * m for m in mags) <= 1.0 + 1e-9
    # sign of the converged vector is arbitrary but shared: align on the
    # largest component before comparing
    top = rows[0]
    sign = 1.0 if v[top.dim - 1] * top.loading >= 0 else -1.0
    for r in rows:
        assert r.loading == pytest.approx(sign * v[r.dim - 1], abs=1e-4)
    assert rows[0].eigenvalue == pytest.approx(lam, abs=1e-5)
