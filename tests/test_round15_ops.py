"""Round-15 additions: q333 (batch Observation / CollectMetrics) and
q334 (mapInArrow int8 quantization) — third implementations and
edge inputs independent of the shared Spark/DuckDB formulation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# q333 — the observed metrics must equal a pandas recomputation, and the
# plan must actually carry a CollectMetrics node (the surface under test).
# ---------------------------------------------------------------------------
def test_q333_observed_equals_pandas_recompute(spark):
    from kinesis_sample_spark.queries import load_registry

    df = load_registry()["q333_observed_metrics_audit"].fn(spark, SF)
    rows = df.collect()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    f = li[li["l_shipdate"] <= pd.Timestamp("1998-09-02")]
    assert len(rows) == f["l_returnflag"].nunique()
    for r in rows:
        grp = f[f["l_returnflag"] == r.l_returnflag]
        assert r.grp_rows == len(grp)
        assert r.grp_qty == float(grp["l_quantity"].sum())
        # the observed (accumulator-channel) columns are scan-global
        assert r.obs_rows == len(f)
        assert r.obs_sum_qty == float(f["l_quantity"].sum())
        assert r.obs_min_price == float(f["l_extendedprice"].min())
        assert r.obs_max_price == float(f["l_extendedprice"].max())
        assert pd.Timestamp(r.obs_last_ship) == f["l_shipdate"].max()


def test_q333_plan_contains_collect_metrics(spark):
    """The point of q333 is the CollectMetrics node — if a refactor
    swaps the observation for a separate aggregate job, the query
    silently stops testing the accumulator channel. Pin the node in the
    OBSERVED relation's plan (the returned df reads a checkpoint, so the
    node is asserted on the pre-action pipeline instead)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from kinesis_sample_spark.catalog import load_table

    obs = Observation("plan_probe")
    li = load_table(spark, SF, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("date")
    )
    observed = li.observe(obs, F.count(F.lit(1)).alias("n"))
    plan = observed._jdf.queryExecution().analyzed().toString()
    assert "CollectMetrics" in plan


# ---------------------------------------------------------------------------
# q334 — third implementation (row-at-a-time python ints, no numpy) and
# edge inputs (sliced batches, amax==0 vectors, single-element vectors).
# ---------------------------------------------------------------------------
def _quant_ref(vec):
    """Scalar reference: exact python-int quantization of one vector."""
    xi = [int(np.floor(float(np.float64(x)) * 1_000_000 + 0.5)) for x in vec]
    amax = max(abs(v) for v in xi)
    if amax == 0:
        return None
    q = [
        (1 if v > 0 else -1 if v < 0 else 0) * ((254 * abs(v) + amax) // (2 * amax))
        for v in xi
    ]
    err = sum(abs(127 * v - qq * amax) for v, qq in zip(xi, q))
    return len(xi), amax, err, max(abs(qq) for qq in q)


def test_q334_matches_scalar_reference(spark):
    from kinesis_sample_spark.queries import load_registry

    rows = (
        load_registry()["q334_int8_quantization_audit"].fn(spark, SF).collect()
    )
    emb = pd.read_parquet(f"{SF}/embeddings.parquet").set_index("vec_id")
    assert len(rows) > 0
    for r in rows:
        ref = _quant_ref(emb.loc[r.vec_id, "embedding"])
        assert ref is not None
        n_dims, amax, err, maxq = ref
        assert (r.n_dims, r.amax_u, r.sum_err_num, r.max_abs_q) == (
            n_dims,
            amax,
            err,
            maxq,
        )


def test_q334_properties(spark):
    """Two laws every correct amax quantizer satisfies: the argmax
    element hits code 127 exactly (max_abs_q == 127), and round-half-up
    keeps every element's error within half a code step
    (sum_err_num <= n_dims * ceil(amax/2))."""
    from kinesis_sample_spark.queries import load_registry

    rows = (
        load_registry()["q334_int8_quantization_audit"].fn(spark, SF).collect()
    )
    for r in rows:
        assert r.max_abs_q == 127
        assert r.sum_err_num <= r.n_dims * ((r.amax_u + 1) // 2)


def test_q334_plan_is_one_narrow_map(spark):
    """The scale claim in the docstring, guarded: the quantization is a
    MapInArrow node with NO shuffle of its own — the single exchange in
    the plan is the terminal deterministic-output sort (which a
    production run drops). A second exchange or a pandas eval node here
    means the Arrow path regressed."""
    from kinesis_sample_spark.plans.inspect import exchange_count, formatted_plan
    from kinesis_sample_spark.queries import load_registry

    df = load_registry()["q334_int8_quantization_audit"].fn(spark, SF)
    assert exchange_count(df) == 1
    plan = formatted_plan(df)
    assert "MapInArrow" in plan
    assert "ArrowEvalPython" not in plan and "MapInPandas" not in plan


def test_q335_matches_bruteforce_pairwise(spark):
    """Third implementation: the O(n^2) pairwise cost with unbounded
    Python ints (no Gram identity, no int64 — so an overflow or identity
    slip in the query shows up as a mismatch here, not just vs DuckDB)."""
    from kinesis_sample_spark.queries import load_registry

    rows = load_registry()["q335_label_medoids"].fn(spark, SF).collect()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    assert len(rows) == emb["label"].nunique()
    for r in rows:
        grp = emb[emb["label"] == r.label]
        xis = {
            int(vid): [int(np.floor(float(np.float64(x)) * 1_000_000 + 0.5)) for x in v]
            for vid, v in zip(grp["vec_id"], grp["embedding"])
        }
        costs = {
            i: sum(
                sum((a - b) ** 2 for a, b in zip(xi, xj))
                for xj in xis.values()
            )
            for i, xi in xis.items()
        }
        best = min(costs, key=lambda i: (costs[i], i))
        assert (r.n_members, r.medoid_id, r.medoid_cost) == (
            len(xis),
            best,
            costs[best],
        )


def test_q335_group_fn_edges():
    """Direct edges for _medoid_group: exact tie on cost breaks to the
    smaller vec_id; a ragged group raises instead of mis-reshaping."""
    from kinesis_sample_spark.queries.similarity import _medoid_group

    # two identical vectors + one outlier: ids 5 and 3 tie on cost ->
    # medoid must be 3 (smaller id), not first-row order
    t = pa.table(
        {
            "vec_id": pa.array([5, 3, 9], pa.int64()),
            "embedding": pa.array(
                [[1.0, 0.0], [1.0, 0.0], [100.0, 0.0]], pa.list_(pa.float32())
            ),
            "label": pa.array([7, 7, 7], pa.int32()),
        }
    )
    out = _medoid_group(t).to_pylist()[0]
    assert out["label"] == 7 and out["n_members"] == 3
    assert out["medoid_id"] == 3
    # cost of id 3: 0 (vs 5) + (99e6)^2 (vs 9)
    assert out["medoid_cost"] == (99 * 10**6) ** 2
    ragged = pa.table(
        {
            "vec_id": pa.array([1, 2], pa.int64()),
            "embedding": pa.array([[1.0], [1.0, 2.0]], pa.list_(pa.float32())),
            "label": pa.array([1, 1], pa.int32()),
        }
    )
    import pytest

    with pytest.raises(ValueError, match="ragged"):
        _medoid_group(ragged)
    # headroom guard fires BEFORE any int64 arithmetic can wrap: a single
    # 1-dim vector at 3000.0 gives m ~ 3e9, 4*n*d*m^2 ~ 3.6e19 > 2^63
    hot = pa.table(
        {
            "vec_id": pa.array([1], pa.int64()),
            "embedding": pa.array([[3000.0]], pa.list_(pa.float32())),
            "label": pa.array([1], pa.int32()),
        }
    )
    with pytest.raises(ValueError, match="headroom"):
        _medoid_group(hot)


def _w1_table(ids, prices):
    return pa.table(
        {
            "o_custkey": pa.array(ids, pa.int64()),
            "o_totalprice": pa.array(prices, pa.float64()),
            "o_orderdate": pa.array([None] * len(ids), pa.timestamp("us")),
        }
    )


def test_q336_matches_fraction_quantile_integral():
    """Independent third implementation of W1: integrate
    |F_a^{-1}(u) - F_b^{-1}(u)| du over exact Fractions by walking the
    merged quantile breakpoints i/n_a, j/n_b — a different formulation
    (inverse-CDF transport) than the query's CDF-area sum, so a slip in
    either form can't hide in the other."""
    from fractions import Fraction

    from kinesis_sample_spark.queries.cogroup import _w1_cogroup

    a = [101.004, 35.50, 35.50, 980.01, 4.99]
    b = [70.00, 35.50, 1200.00]
    out = _w1_cogroup(_w1_table([7] * 5, a), _w1_table([7] * 3, b)).to_pylist()[0]
    sa = sorted(int(np.floor(x * 100 + 0.5)) for x in a)
    sb = sorted(int(np.floor(x * 100 + 0.5)) for x in b)
    na, nb = len(sa), len(sb)
    cuts = sorted({Fraction(i, na) for i in range(na + 1)}
                  | {Fraction(j, nb) for j in range(nb + 1)})
    w1 = Fraction(0)
    for lo, hi in zip(cuts[:-1], cuts[1:]):
        mid = (lo + hi) / 2
        qa = sa[min(int(mid * na), na - 1)]
        qb = sb[min(int(mid * nb), nb - 1)]
        w1 += abs(qa - qb) * (hi - lo)
    assert out["w1_num"] == w1 * na * nb  # exact rational equality
    assert (out["custkey"], out["n_a"], out["n_b"]) == (7, na, nb)


def test_q336_equal_size_law_and_empty_side():
    """Equal sample sizes collapse W1 to the sorted elementwise mean:
    w1_num == n * sum|a_(i) - b_(i)|. And a key missing one side has no
    defined distance -> empty output."""
    from kinesis_sample_spark.queries.cogroup import _w1_cogroup

    a, b = [10.00, 50.00, 20.00], [30.00, 15.00, 60.00]
    out = _w1_cogroup(_w1_table([1] * 3, a), _w1_table([1] * 3, b)).to_pylist()[0]
    sa = sorted(int(x * 100) for x in a)
    sb = sorted(int(x * 100) for x in b)
    want = 3 * sum(abs(x - y) for x, y in zip(sa, sb))
    assert out["w1_num"] == want
    assert _w1_cogroup(_w1_table([1], [5.0]), _w1_table([], [])).num_rows == 0
    # headroom guard fires before the int64 fold can wrap: the sum is
    # bounded by n_a*n_b*(max-min), checked in Python ints
    import pytest

    with pytest.raises(ValueError, match="headroom"):
        _w1_cogroup(_w1_table([1, 1], [0.0, 4e16]), _w1_table([1, 1], [0.0, 4e16]))
    # identical distributions -> zero distance
    same = _w1_cogroup(_w1_table([2] * 2, a[:2]), _w1_table([2] * 2, a[:2]))
    assert same.to_pylist()[0]["w1_num"] == 0


def test_q336_survives_count_consumption(spark):
    """Regression: Catalyst pushes column pruning THROUGH
    FlatMapCoGroupsInArrow, so a consumer reading none of the output
    columns (df.count()) starved the UDF of o_totalprice and crashed —
    the oracle compare (which collects every column) could never see it.
    The persist barrier in the query must keep every consumption shape
    alive."""
    from kinesis_sample_spark.queries import load_registry

    df = load_registry()["q336_wasserstein_drift"].fn(spark, SF)
    assert df.count() == len(df.collect()) > 0


def test_q334_batch_fn_edges():
    """Drive _quant_batches directly with inputs the fixture can't
    produce: a SLICED RecordBatch (nonzero list offsets — the flatten()
    path must respect the slice), an all-zero vector (dropped, not
    divided by zero), and a single-element vector (q == +-127, zero
    error)."""
    from kinesis_sample_spark.queries.similarity import _quant_batches

    batch = pa.RecordBatch.from_arrays(
        [
            pa.array([10, 11, 12, 13], pa.int64()),
            pa.array(
                [[1.0, -2.0], [0.0, 0.0], [0.5], [-0.25, 0.75, 1.25]],
                pa.list_(pa.float32()),
            ),
        ],
        names=["vec_id", "embedding"],
    )
    sliced = batch.slice(1, 3)  # drops vec 10; offsets now nonzero
    (out,) = list(_quant_batches(iter([sliced])))
    got = {r["vec_id"]: r for r in out.to_pylist()}
    assert set(got) == {12, 13}  # 11 is all-zero -> dropped
    assert got[12]["max_abs_q"] == 127 and got[12]["sum_err_num"] == 0
    ref = _quant_ref([-0.25, 0.75, 1.25])
    assert (
        got[13]["n_dims"],
        got[13]["amax_u"],
        got[13]["sum_err_num"],
        got[13]["max_abs_q"],
    ) == ref
