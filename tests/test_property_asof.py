"""Property-based check: operators.asof.asof_join ≡ pandas.merge_asof on
random inputs (hypothesis drives key counts, timestamps, ties, and empty
sides). merge_asof is the public reference implementation of as-of
semantics, so agreement across random cases is much stronger evidence than
the fixed oracle query (q27) alone.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kinesis_sample_spark.operators.asof import asof_join

BASE = dt.datetime(2024, 1, 1)


def _mk_rows(draw_secs: list[int], keys: list[int], prefix: str):
    return [
        (k, BASE + dt.timedelta(seconds=s), f"{prefix}{i}")
        for i, (k, s) in enumerate(zip(keys, draw_secs))
    ]


rows_strategy = st.tuples(
    st.lists(st.integers(min_value=0, max_value=3600), min_size=0, max_size=25),
    st.lists(st.integers(min_value=0, max_value=3), min_size=0, max_size=25),
)


@pytest.mark.slow
@given(left=rows_strategy, right=rows_strategy)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_asof_matches_pandas_merge_asof(spark, left, right):
    lsecs, lkeys = left
    rsecs, rkeys = right
    n_l, n_r = min(len(lsecs), len(lkeys)), min(len(rsecs), len(rkeys))
    lrows = _mk_rows(lsecs[:n_l], lkeys[:n_l], "l")
    rrows = _mk_rows(rsecs[:n_r], rkeys[:n_r], "r")
    if not lrows:
        return  # empty left: nothing to assert

    ldf = spark.createDataFrame(lrows, "k long, ts timestamp, lv string")
    if rrows:
        rdf = spark.createDataFrame(rrows, "k long, ts timestamp, rv string")
    else:
        rdf = spark.createDataFrame([], "k long, ts timestamp, rv string")

    got = {
        (r["k"], r["lv"]): r["r_ts"]
        for r in asof_join(ldf, rdf, on="k").collect()
    }

    lp = pd.DataFrame(lrows, columns=["k", "ts", "lv"]).sort_values("ts", kind="stable")
    rp = (
        pd.DataFrame(rrows, columns=["k", "ts", "rv"])
        .sort_values("ts", kind="stable")
        .drop_duplicates()
    )
    if rrows:
        merged = pd.merge_asof(
            lp, rp.rename(columns={"ts": "r_ts"}), left_on="ts", right_on="r_ts",
            by="k", direction="backward", allow_exact_matches=True,
        )
    else:
        merged = lp.assign(r_ts=pd.NaT)

    for _, row in merged.iterrows():
        expect = None if pd.isna(row["r_ts"]) else row["r_ts"].to_pydatetime()
        assert got[(row["k"], row["lv"])] == expect, (row["k"], row["lv"])


@pytest.mark.slow
@given(left=rows_strategy, right=rows_strategy)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_forward_asof_matches_pandas_merge_asof(spark, left, right):
    """The round-12 ``direction="forward"`` mirror (first() over the
    following frame) against pandas merge_asof(direction="forward")."""
    lsecs, lkeys = left
    rsecs, rkeys = right
    n_l, n_r = min(len(lsecs), len(lkeys)), min(len(rsecs), len(rkeys))
    lrows = _mk_rows(lsecs[:n_l], lkeys[:n_l], "l")
    rrows = _mk_rows(rsecs[:n_r], rkeys[:n_r], "r")
    if not lrows:
        return

    ldf = spark.createDataFrame(lrows, "k long, ts timestamp, lv string")
    if rrows:
        rdf = spark.createDataFrame(rrows, "k long, ts timestamp, rv string")
    else:
        rdf = spark.createDataFrame([], "k long, ts timestamp, rv string")

    got = {
        (r["k"], r["lv"]): r["r_ts"]
        for r in asof_join(ldf, rdf, on="k", direction="forward").collect()
    }

    lp = pd.DataFrame(lrows, columns=["k", "ts", "lv"]).sort_values("ts", kind="stable")
    rp = (
        pd.DataFrame(rrows, columns=["k", "ts", "rv"])
        .sort_values("ts", kind="stable")
        .drop_duplicates()
    )
    if rrows:
        merged = pd.merge_asof(
            lp, rp.rename(columns={"ts": "r_ts"}), left_on="ts", right_on="r_ts",
            by="k", direction="forward", allow_exact_matches=True,
        )
    else:
        merged = lp.assign(r_ts=pd.NaT)

    for _, row in merged.iterrows():
        expect = None if pd.isna(row["r_ts"]) else row["r_ts"].to_pydatetime()
        assert got[(row["k"], row["lv"])] == expect, (row["k"], row["lv"])
