"""Every registered query with an oracle must hash-match DuckDB at sf0.01.

This is a local replica of the driver's t2 correctness gate.
"""

from __future__ import annotations

import pytest

from kinesis_sample_spark.queries import load_registry
from tests.oracle_harness import compare

REGISTRY = load_registry()
WITH_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(name, spark, oracle_sf_dir, duck):
    q = REGISTRY[name]
    df = q.fn(spark, oracle_sf_dir)
    cmp = compare(name, df, duck, q.oracle)
    assert cmp.ok, (
        f"{name}: rows {cmp.spark_rows} vs {cmp.oracle_rows}, "
        f"cols_match={cmp.columns_match} ({cmp.spark_cols} vs {cmp.oracle_cols}), "
        f"hash_match={cmp.hash_match} {cmp.detail} "
        f"dtype_flags={list(cmp.dtype_flags)}"
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(name, spark, oracle_sf_dir):
    q = REGISTRY[name]
    df = q.fn(spark, oracle_sf_dir)
    assert df.count() >= 0
