"""Brute-force cross-checks for the round-12 operators (q241-q272).

Same methodology as tests/test_round9_ops.py / test_round10_ops.py: each
Spark operator is re-derived with pandas / pure-Python from the raw
parquet, so a shared formulation bug between the query and its DuckDB
oracle can't hide. Numeric comparisons use exact equality for integer /
quantized-decimal outputs and 1e-6-ish tolerances where the engines'
round(.,6) quantization is the last step.
"""

from __future__ import annotations

import itertools
import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _pd(table, sf=SF):
    return pd.read_parquet(f"{sf}/{table}.parquet")


def _run(spark, name, sf=SF):
    from kinesis_sample_spark.queries import load_registry

    return load_registry()[name].fn(spark, sf).collect()


def _copurchase_edges(sf=SF, min_support=1):
    """(part_a, part_b) -> support over capped distinct baskets."""
    li = _pd("lineitem", sf)
    baskets = defaultdict(set)
    for o, p in {(int(o), int(p)) for o, p in zip(li.l_orderkey, li.l_partkey)}:
        baskets[o].add(p)
    counts = Counter()
    for items in baskets.values():
        if len(items) > 32:
            continue
        for a, b in itertools.combinations(sorted(items), 2):
            counts[(a, b)] += 1
    return {e: c for e, c in counts.items() if c >= min_support}


# ---------------------------------------------------------------------------
# graph_metrics
# ---------------------------------------------------------------------------
def test_q241_communities_third_impl(spark):
    edges = _copurchase_edges(min_support=3)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    comp_nodes = defaultdict(set)
    for n in parent:
        comp_nodes[find(n)].add(n)
    # min-label representative
    expected = {}
    for nodes in comp_nodes.values():
        cid = min(nodes)
        n_edges = sum(1 for (a, b) in edges if find(a) == find(cid))
        total = sum(c for (a, b), c in edges.items() if find(a) == find(cid))
        expected[cid] = (len(nodes), n_edges, total)
    rows = _run(spark, "q241_copurchase_communities")
    got = {r.community: (r.n_parts, r.n_edges, r.total_support) for r in rows}
    assert got == expected and len(got) > 0


def test_q246_degree_distribution_third_impl(spark):
    edges = _copurchase_edges()
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    buckets = defaultdict(list)
    for d in deg.values():
        buckets[d.bit_length() - 1].append(d)
    rows = _run(spark, "q246_degree_distribution")
    got = {r.bucket: (r.min_degree, r.max_degree, r.n_parts) for r in rows}
    expected = {b: (min(v), max(v), len(v)) for b, v in buckets.items()}
    assert got == expected


def test_q247_assortativity_third_impl(spark):
    edges = _copurchase_edges()
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    r = np.corrcoef(xs, ys)[0, 1]
    rows = _run(spark, "q247_degree_assortativity")
    assert rows[0].n_edges == len(edges)
    assert rows[0].assortativity == pytest.approx(r, abs=2e-6)


# ---------------------------------------------------------------------------
# temporal
# ---------------------------------------------------------------------------
def test_q242_session_gaps_third_impl(spark):
    ev = _pd("events").sort_values(["user_id", "ts", "event_id"])
    epoch = pd.Timestamp("1970-01-01")
    gaps_by_wd = defaultdict(list)
    for _, g in ev.groupby("user_id"):
        ts = list(g.ts)
        sessions = []
        start = end = ts[0]
        for t in ts[1:]:
            if (t - end).total_seconds() > 1800:
                sessions.append((start, end))
                start = t
            end = t
        sessions.append((start, end))
        for (s0, e0), (s1, _e1) in zip(sessions, sessions[1:]):
            wd = (s1.normalize() - epoch).days % 7
            gaps_by_wd[wd].append((s1 - e0).total_seconds())
    rows = _run(spark, "q242_session_gap_stats")
    assert {r.weekday for r in rows} == set(gaps_by_wd)
    for r in rows:
        g = gaps_by_wd[r.weekday]
        assert r.n_gaps == len(g)
        assert r.avg_gap_s == pytest.approx(sum(g) / len(g), rel=1e-12)
        assert r.p50_gap_s == pytest.approx(np.percentile(g, 50), rel=1e-12)
        assert r.p90_gap_s == pytest.approx(np.percentile(g, 90), rel=1e-12)


def test_q243_asof_spread_third_impl(spark):
    orders = _pd("orders")
    ev = _pd("events")
    by_user = {u: sorted(g.ts) for u, g in ev.groupby("user_id")}
    agg = defaultdict(lambda: [0, 0, []])  # n_orders, n_both, spreads
    for _, o in orders.iterrows():
        a = agg[o.o_orderpriority]
        a[0] += 1
        ts = by_user.get(o.o_custkey, [])
        bwd = max((t for t in ts if t <= o.o_orderdate), default=None)
        fwd = min((t for t in ts if t >= o.o_orderdate), default=None)
        if bwd is not None and fwd is not None:
            a[1] += 1
            a[2].append((fwd - bwd).total_seconds())
    rows = _run(spark, "q243_asof_forward_spread")
    for r in rows:
        n, nb, spreads = agg[r.o_orderpriority]
        assert (r.n_orders, r.n_both) == (n, nb)
        if nb:
            assert r.avg_spread_s == pytest.approx(sum(spreads) / nb, rel=1e-12)
            assert r.p50_spread_s == pytest.approx(
                np.percentile(spreads, 50), rel=1e-12
            )


def test_q250_cohort_ltv_third_impl(spark):
    orders = _pd("orders")
    idx = orders.o_orderdate.dt.year * 12 + orders.o_orderdate.dt.month - 1
    cents = (orders.o_totalprice.round(2) * 100).round().astype("int64")
    df = pd.DataFrame(
        {"cust": orders.o_custkey, "idx": idx, "cents": cents}
    )
    m0 = df.groupby("cust").idx.min()
    df["m0"] = df.cust.map(m0)
    df["k"] = df.idx - df.m0
    size = m0.value_counts()
    rev = (
        df[df.k < 12].groupby(["m0", "k"]).cents.sum().unstack(fill_value=0)
    )
    rows = _run(spark, "q250_cohort_ltv")
    for r in rows:
        mm0 = (r.cohort // 100) * 12 + (r.cohort % 100) - 1
        ks = [k for k in rev.columns if k <= r.k and rev.loc[mm0, k] != 0]
        cum_cents = int(rev.loc[mm0, [c for c in rev.columns if c <= r.k]].sum())
        assert r.customers == int(size[mm0])
        assert r.cum_rev == pytest.approx(cum_cents / 100.0, rel=1e-12)
        assert r.ltv_per_customer == pytest.approx(
            (cum_cents / 100.0) / size[mm0], rel=1e-12
        )


def test_q251_backlog_third_impl(spark):
    orders = _pd("orders")
    li = _pd("lineitem")
    epoch = pd.Timestamp("1970-01-01")
    end = li.groupby("l_orderkey").l_shipdate.max()
    iv = [
        ((od.normalize() - epoch).days, (end[ok].normalize() - epoch).days)
        for ok, od in zip(orders.o_orderkey, orders.o_orderdate)
        if ok in end.index
    ]
    delta = Counter()
    for d0, d1 in iv:
        delta[d0] += 1
        delta[d1] -= 1
    cum, series = 0, {}
    for d in sorted(delta):
        cum += delta[d]
        series[d] = cum
    by_month = defaultdict(list)
    for d, v in series.items():
        dd = epoch + pd.Timedelta(days=d)
        by_month[dd.year * 100 + dd.month].append((d, v))
    rows = _run(spark, "q251_daily_backlog")
    assert {r.month for r in rows} == set(by_month)
    for r in rows:
        pts = by_month[r.month]
        assert r.peak_backlog == max(v for _, v in pts)
        assert r.eom_backlog == max(pts)[1]
        assert r.n_change_days == len(pts)


def test_q253_point_in_time_third_impl(spark):
    orders = _pd("orders").sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    ev = _pd("events")
    by_user = defaultdict(list)
    for _, o in orders.iterrows():
        by_user[o.o_custkey].append((o.o_orderdate, o.o_orderkey, o.o_orderpriority))
    state_counts = Counter()
    state_users = defaultdict(set)
    for _, e in ev.iterrows():
        ivs = by_user.get(e.user_id, [])
        state = "NONE"
        for i, (vf, _k, pri) in enumerate(ivs):
            vt = ivs[i + 1][0] if i + 1 < len(ivs) else None
            if e.ts >= vf and (vt is None or e.ts < vt):
                state = pri
                break
        state_counts[state] += 1
        state_users[state].add(e.user_id)
    rows = _run(spark, "q253_point_in_time_join")
    got = {r.state: (r.n_events, r.n_users) for r in rows}
    expected = {s: (c, len(state_users[s])) for s, c in state_counts.items()}
    assert got == expected


def test_q256_peaks_third_impl(spark):
    orders = _pd("orders")
    cents = (orders.o_totalprice.round(2) * 100).round().astype("int64")
    day = orders.o_orderdate.dt.normalize()
    daily = (
        pd.DataFrame({"day": day, "cents": cents})
        .groupby("day")
        .cents.sum()
        .sort_index()
    )
    vals = daily.values
    days = daily.index
    peaks = []
    for i in range(len(vals)):
        lmax = max(vals[max(0, i - 3) : i], default=None) if i > 0 else None
        rmax = max(vals[i + 1 : i + 4], default=None) if i + 1 < len(vals) else None
        if (lmax is None or vals[i] > lmax) and (rmax is None or vals[i] > rmax):
            prom = vals[i] - max(lmax or 0, rmax or 0)
            d = days[i]
            peaks.append(
                (vals[i], d.year * 10000 + d.month * 100 + d.day, prom)
            )
    peaks.sort(key=lambda t: (-t[0], t[1]))
    expected = peaks[:20]
    rows = _run(spark, "q256_peak_days")
    assert len(rows) == len(expected)
    for r, (cents_v, day_int, prom) in zip(rows, expected):
        assert r.day_int == day_int
        assert r.rev == pytest.approx(cents_v / 100.0, rel=1e-12)
        assert r.prominence == pytest.approx(prom / 100.0, rel=1e-12)


def test_q258_ewma_third_impl(spark):
    from decimal import Decimal

    from kinesis_sample_spark.queries.temporal import _EWMA_WEIGHTS

    orders = _pd("orders")
    epoch = pd.Timestamp("1970-01-01")
    d = (orders.o_orderdate.dt.normalize() - epoch).dt.days
    cents = (orders.o_totalprice.round(2) * 100).round().astype("int64")
    df = pd.DataFrame(
        {"pri": orders.o_orderpriority, "d": d, "cents": cents}
    )
    daily = df.groupby(["pri", "d"]).cents.sum()
    month_of = {}
    targets = {}
    for (pri, dd), _v in daily.items():
        date = epoch + pd.Timedelta(days=int(dd))
        m = date.year * 100 + date.month
        key = (pri, m)
        targets[key] = max(targets.get(key, -1), dd)
    rows = _run(spark, "q258_ewma_smoothing")
    assert {(r.o_orderpriority, r.month) for r in rows} == set(targets)
    for r in rows:
        t = targets[(r.o_orderpriority, r.month)]
        num = Decimal(0)
        den = Decimal(0)
        for i, w in _EWMA_WEIGHTS:
            key = (r.o_orderpriority, t - i)
            if key in daily.index:
                x = Decimal(int(daily[key])) / 100
                num += (w * x).quantize(Decimal("1e-8"))
                den += w
        assert r.ewma_rev == pytest.approx(float(num) / float(den), rel=1e-12)


def test_q260_autocorr_third_impl(spark):
    orders = _pd("orders")
    epoch = pd.Timestamp("1970-01-01")
    d = (orders.o_orderdate.dt.normalize() - epoch).dt.days
    cents = (orders.o_totalprice.round(2) * 100).round().astype("int64")
    daily = pd.DataFrame({"d": d, "c": cents}).groupby("d").c.sum()
    rows = {r.lag: r for r in _run(spark, "q260_revenue_autocorr")}
    for lag in (1, 7, 28):
        pairs = [
            (daily[dd] / 100.0, daily[dd - lag] / 100.0)
            for dd in daily.index
            if dd - lag in daily.index
        ]
        xs = np.array([a for a, _ in pairs])
        ys = np.array([b for _, b in pairs])
        r = np.corrcoef(xs, ys)[0, 1]
        assert rows[lag].n_pairs == len(pairs)
        assert rows[lag].autocorr == pytest.approx(r, abs=2e-6)


def test_q261_interarrival_third_impl(spark):
    orders = _pd("orders").sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    cust = _pd("customer")
    seg_of = dict(zip(cust.c_custkey, cust.c_mktsegment))
    epoch = pd.Timestamp("1970-01-01")
    gaps = defaultdict(list)
    for u, g in orders.groupby("o_custkey"):
        days = [(t.normalize() - epoch).days for t in g.o_orderdate]
        for a, b in zip(days, days[1:]):
            gaps[seg_of[u]].append(b - a)
    rows = _run(spark, "q261_interarrival_stats")
    for r in rows:
        g = np.array(gaps[r.c_mktsegment], dtype=float)
        n = len(g)
        mean = g.sum() / n
        sd = math.sqrt((n * (g * g).sum() - g.sum() ** 2) / (n * (n - 1)))
        assert r.n_gaps == n
        assert r.mean_days == pytest.approx(mean, abs=2e-6)
        assert r.cv == pytest.approx(sd / mean, abs=2e-6)
        assert r.p50_days == pytest.approx(np.percentile(g, 50), rel=1e-12)
        assert r.p90_days == pytest.approx(np.percentile(g, 90), rel=1e-12)


def test_q272_revenue_spread_third_impl(spark):
    orders = _pd("orders")
    li = _pd("lineitem")
    om_of = dict(
        zip(
            orders.o_orderkey,
            orders.o_orderdate.dt.year * 12 + orders.o_orderdate.dt.month - 1,
        )
    )
    monthly = Counter()
    slices = Counter()
    for _, l in li.iterrows():
        om = om_of[l.l_orderkey]
        sm = l.l_shipdate.year * 12 + l.l_shipdate.month - 1
        span = max(1, min(12, sm - om + 1))
        per = round(l.l_extendedprice / span, 6)
        for i in range(span):
            idx = om + i
            label = (idx // 12) * 100 + (idx % 12) + 1
            monthly[label] += round(per * 1_000_000)
            slices[label] += 1
    rows = _run(spark, "q272_revenue_spread")
    assert {r.month for r in rows} == set(monthly)
    for r in rows:
        assert r.n_slices == slices[r.month]
        assert r.recognized_rev == pytest.approx(
            monthly[r.month] / 1_000_000, rel=1e-9
        )
