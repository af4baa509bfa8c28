"""Edge-case regressions for the round-13 ADVICE fixes.

- q283_hill_tail_index: with <= _HILL_K rows the rn = k+1 pivot is
  empty; the old crossJoin yielded 0 Spark rows while the DuckDB
  oracle's global aggregate still emitted 1 row of NULLs. The left-join
  guard must make BOTH engines emit one all-NULL row (same class as the
  q212 w=0 guard).
- q271_spearman_rank_corr: sum(rx*rx) grows ~4n^3/3 per group and
  exceeds int64 near n~1.9M rows; the old BIGINT accumulation wrapped
  silently in Spark (non-ANSI) while DuckDB summed in HUGEINT — a
  silent cross-engine divergence just beyond the fixture envelope. The
  DECIMAL(38,0) widening must keep the engines equal (and the rho of a
  perfectly monotone pair exactly 1.0) ABOVE the int64 bound.
- q259_dedup_agreement: the prefix-block candidate side must carry
  q245's _LCP_CAP so a boilerplate prefix shared by >cap docs stays
  bounded — and capped identically in Spark and the oracle.

Each test runs the registered query AND its DuckDB oracle over a tiny
synthetic sf_dir so the guard is proven on the exact input the fixtures
never contain (fixtures: max prefix block 64 at sf<=0.1; lineitem groups
far below the int64 rank-moment bound).
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

from kinesis_sample_spark.queries import load_registry
from tests.oracle_harness import value_hash

REGISTRY = load_registry()


@pytest.fixture()
def duck_tmp(tmp_path):
    def _con(tables: dict[str, pd.DataFrame]) -> duckdb.DuckDBPyConnection:
        con = duckdb.connect()
        for name, df in tables.items():
            path = tmp_path / f"{name}.parquet"
            df.to_parquet(path)
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
        return con

    return _con


def _write(tmp_path, tables: dict[str, pd.DataFrame]) -> str:
    for name, df in tables.items():
        df.to_parquet(tmp_path / f"{name}.parquet")
    return str(tmp_path)


def _assert_parity(name, spark_df, con, sql):
    srows = [tuple(r) for r in spark_df.collect()]
    scols = spark_df.columns
    ores = con.execute(sql)
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert value_hash(srows, scols) == value_hash(orows, ocols)
    return srows, scols


def test_q283_degenerate_under_k_rows(spark, tmp_path, duck_tmp):
    # 5 orders << _HILL_K=200: the rn=201 pivot is empty. Both engines
    # must emit exactly ONE row: k=200 and NULL threshold/gamma/alpha.
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3, 4, 5],
            "o_totalprice": [10.0, 20.0, 30.0, 40.0, 50.0],
        }
    )
    sf = _write(tmp_path, {"orders": orders})
    con = duck_tmp({"orders": orders})
    q = REGISTRY["q283_hill_tail_index"]
    df = q.fn(spark, sf)
    rows, cols = _assert_parity(q.name, df, con, q.oracle)
    assert len(rows) == 1
    r = rows[0]
    assert r[cols.index("k")] == 200
    for c in ("threshold", "hill_gamma", "tail_alpha"):
        assert r[cols.index(c)] is None


def test_q271_rank_moments_beyond_int64(spark, tmp_path, duck_tmp):
    # One group of n=2e6 distinct values: rx = ry = 2*rank, so
    # sum(rx*rx) = 4*n(n+1)(2n+1)/6 ~ 1.07e19 > int64 max (9.22e18).
    # The old BIGINT path wrapped silently in Spark while DuckDB summed
    # in HUGEINT; the DECIMAL(38,0) moments must keep both engines equal
    # and the perfectly-monotone rho exactly 1.0.
    n = 2_000_000
    v = np.arange(1, n + 1, dtype=np.float64)
    sxx = 4 * (n * (n + 1) * (2 * n + 1)) // 6
    assert sxx > 2**63 - 1  # the test is vacuous unless we cross int64
    lineitem = pd.DataFrame(
        {"l_returnflag": "A", "l_quantity": v, "l_extendedprice": v}
    )
    sf = _write(tmp_path, {"lineitem": lineitem})
    con = duck_tmp({"lineitem": lineitem})
    q = REGISTRY["q271_spearman_rank_corr"]
    df = q.fn(spark, sf)
    rows, cols = _assert_parity(q.name, df, con, q.oracle)
    assert len(rows) == 1
    rho = rows[0][cols.index("spearman_rho")]
    assert rho == 1.0 and not math.isnan(rho)


def test_q259_prefix_block_cap(spark, tmp_path, duck_tmp):
    # 100 docs share one 12-char prefix (the boilerplate-header case):
    # the prefix candidate side must cap the block at _LCP_CAP=64 docs
    # -> C(64,2)=2016 prefix pairs, identically in Spark and the oracle.
    from kinesis_sample_spark.queries.textcal import _LCP_CAP

    texts = [
        f"BOILERPLATE_ header common to every doc body{i:03d} "
        + " ".join(f"w{i}_{j}" for j in range(10))
        for i in range(100)
    ]
    assert len({t[:12] for t in texts}) == 1
    docs = pd.DataFrame(
        {
            "doc_id": range(100),
            "text": texts,
            "lang": "en",
            "source": "synthetic",
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = _write(tmp_path, {"documents": docs})
    con = duck_tmp({"documents": docs})
    q = REGISTRY["q259_dedup_agreement"]
    df = q.fn(spark, sf)
    rows, cols = _assert_parity(q.name, df, con, q.oracle)
    assert len(rows) == 1
    n_prefix = rows[0][cols.index("n_prefix")]
    cap_pairs = _LCP_CAP * (_LCP_CAP - 1) // 2
    # All 100 docs share one prefix block, so the capped window emits
    # exactly C(64,2) pairs; uncapped would be C(100,2)=4950, and a
    # broken cap/blocking that emitted 0 pairs must also fail here.
    assert n_prefix == cap_pairs
