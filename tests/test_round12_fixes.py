"""Edge-case regressions for the round-12 ADVICE fixes.

- q212_percentile_bridge: a constant-price group (max = min ⇒ bin width
  w = 0) must emit est = mn / abs_err = 0 — not NaN/Inf from a
  divide-by-zero bin width — identically in Spark and DuckDB.
- q240_mix_shift: a priority present in only ONE of two consecutive
  years must contribute its full share to the L1 distance (full-outer
  join + COALESCE(share, 0)). The old lag-based form silently dropped
  such categories (and reached back to the last year the category
  appeared, not y-1), undercounting drift.

Both tests run the registered query AND its DuckDB oracle over a tiny
synthetic sf_dir so the guard is proven on the exact degenerate input the
fixtures never contain.
"""

from __future__ import annotations

import datetime
import math

import duckdb
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


def test_q212_constant_price_group_w0(spark, tmp_path, duck_tmp):
    lineitem = pd.DataFrame(
        {
            # group A: constant price (max = min ⇒ w = 0); group B: spread
            "l_returnflag": ["A"] * 5 + ["B"] * 10,
            "l_extendedprice": [10.0] * 5 + [float(i) for i in range(100, 110)],
        }
    )
    sf = _write(tmp_path, {"lineitem": lineitem})
    con = duck_tmp({"lineitem": lineitem})
    q = REGISTRY["q212_percentile_bridge"]
    df = q.fn(spark, sf)
    rows, cols = _assert_parity(q.name, df, con, q.oracle)
    by = {(r[cols.index("l_returnflag")], r[cols.index("p")]): r for r in rows}
    for p in (0.5, 0.9):
        r = by[("A", p)]
        est, exact, err = (
            r[cols.index("est")],
            r[cols.index("exact")],
            r[cols.index("abs_err")],
        )
        assert est == 10.0 and exact == 10.0 and err == 0.0
        assert not math.isnan(est) and not math.isinf(est)


def test_q240_category_churn_counts_fully(spark, tmp_path, duck_tmp):
    def year_rows(y, counts):
        rows = []
        for pr, n in counts.items():
            rows += [
                {"o_orderdate": datetime.date(y, 6, 1), "o_orderpriority": pr}
            ] * n
        return rows

    # 1994: P1 80%, P2 20%.  1995: P1 50%, P3 50% (P2 vanishes, P3 appears).
    # L1(1995) = |.5-.8| + |0-.2| + |.5-0| = 1.0; the old lag form saw only
    # the P1 term (0.3).
    orders = pd.DataFrame(
        year_rows(1994, {"P1": 8, "P2": 2}) + year_rows(1995, {"P1": 5, "P3": 5})
    )
    sf = _write(tmp_path, {"orders": orders})
    con = duck_tmp({"orders": orders})
    q = REGISTRY["q240_mix_shift"]
    df = q.fn(spark, sf)
    rows, cols = _assert_parity(q.name, df, con, q.oracle)
    assert len(rows) == 1  # 1994 has no prior year → only 1995 reports
    r = rows[0]
    assert r[cols.index("year")] == 1995
    assert r[cols.index("l1_mix_shift")] == pytest.approx(1.0, abs=1e-6)
    assert r[cols.index("n_orders")] == 10


def test_release_checkpoints_frees_rdd_blocks(spark):
    """clearCache does NOT free localCheckpoint/persist RDD blocks; the
    session-level helper must (the q152 47 s mid-sweep failure mode)."""
    from kinesis_sample_spark.session import release_checkpoints

    spark.range(1000).localCheckpoint(eager=True)
    cached = spark.range(100).persist()
    cached.count()
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    assert jmap.size() >= 2
    released = release_checkpoints(spark)
    # DataFrame.persist entries are freed by the clearCache() half (SQL
    # CacheManager); the counted RDD loop catches the localCheckpoint block.
    assert released >= 1
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0
    # an ordinary persist recomputes from lineage after release —
    # correctness unaffected (localCheckpoint plans are between-jobs only)
    assert cached.count() == 100
