"""Cross-checks for the round-14 second wave (q314+): each operator is
re-derived with numpy / pure Python from the raw parquet, so a shared
formulation bug between the query and its DuckDB oracle can't hide.
Same methodology as tests/test_round14_ops.py."""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

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


def _dec2(v: float) -> Decimal:
    return Decimal(repr(v)).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)


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


# ---------------------------------------------------------------------------
# q315 — Misra-Gries merge law
# ---------------------------------------------------------------------------
def test_q315_misra_gries_third_impl(spark):
    """Pure-Python mirror of the offline-MG merge over md5 groups; rows
    compare exactly (the md5-assigned construction is deterministic, so
    estimates — not just the law booleans — must match)."""
    from collections import Counter

    K, G, M = 64, 32, 1000000
    ev = _pd("events")
    per_group = [Counter() for _ in range(G)]
    total = Counter()
    for eid in ev.event_id:
        u = _md5_long(f"mgitem:{int(eid)}") % M
        item = M if u == 0 else int(1000000.0 // (u + 1)) + 1
        g = _md5_long(f"mggrp:{int(eid)}") % G
        per_group[g][item] += 1
        total[item] += 1
    n = len(ev)
    merged = Counter()
    for cnt in per_group:
        lam = sorted(cnt.values(), reverse=True)[K] if len(cnt) > K else 0
        for item, c in cnt.items():
            if c > lam:
                merged[item] += c - lam
    mu = sorted(merged.values(), reverse=True)[K] if len(merged) > K else 0
    final = {i: s - mu for i, s in merged.items() if s > mu}
    rows = _run(spark, "q315_misra_gries_bounds")
    hh = sorted(i for i, c in total.items() if c * (K + 1) > n)
    assert [r.item for r in rows] == hh
    for r in rows:
        est = final.get(r.item, 0)
        assert (r.exact_count, r.mg_estimate) == (total[r.item], est)
        assert r.in_summary == (r.item in final)
        assert r.within_bound and r.no_overestimate and r.summary_size_ok
        # the actual textbook inequality, re-derived
        assert (total[r.item] - est) * (K + 1) <= n
        assert 0 <= est <= total[r.item]
    assert len(final) <= K


# ---------------------------------------------------------------------------
# q316 — rate-limited backlog drain
# ---------------------------------------------------------------------------
def test_q316_backlog_third_impl(spark):
    """The final table must equal the pandas batch aggregate, and every
    progression-law boolean must have come out TRUE on a healthy run."""
    ev = _pd("events")
    rows = _run(spark, "q316_live_rate_limited_backlog")
    assert len(rows) == ev.event_type.nunique()
    for r in rows:
        g = ev[ev.event_type == r.event_type]
        s = sum((_dec2(v) for v in g.value), Decimal(0))
        assert r.n_events == len(g)
        assert r.min_event_id == int(g.event_id.min())
        assert r.max_event_id == int(g.event_id.max())
        assert r.sum_value == pytest.approx(float(s), abs=1e-9)
        assert r.one_file_per_trigger and r.drained_in_file_count_batches
        assert r.watermark_monotone and r.watermark_advanced and r.totals_match


# ---------------------------------------------------------------------------
# q317 — Haar wavelet energy
# ---------------------------------------------------------------------------
def test_q317_haar_third_impl(spark):
    """Iterative pairwise Haar in numpy (the textbook formulation) must
    produce the same top-10 coefficients as the engine's signed-sum
    formulation, and Parseval must hold exactly in Python ints."""
    orders = _pd("orders")
    d0 = orders.o_orderdate.min()
    idx = (orders.o_orderdate - d0).dt.days
    counts = idx[idx < 256].value_counts()
    x = np.zeros(256, dtype=np.int64)
    x[counts.index] = counts.values
    coeffs = {}
    s = x.copy()
    lhs = 0
    for k in range(1, 9):
        a, b = s[0::2], s[1::2]
        d = a - b
        for p, val in enumerate(d):
            coeffs[(k, p)] = int(val)
        lhs += (2 ** (8 - k)) * int((d.astype(object) ** 2).sum())
        s = a + b
    lhs += int(s[0]) ** 2
    energy = 256 * int((x.astype(object) ** 2).sum())
    assert lhs == energy
    top = sorted(coeffs.items(), key=lambda kv: (-abs(kv[1]), kv[0]))[:10]
    rows = _run(spark, "q317_haar_wavelet_energy")
    assert [((r.level, r.pos), r.coeff) for r in rows] == top
    assert all(r.parseval_ok for r in rows)
    assert rows[0][3] == energy  # energy_x256 column


# ---------------------------------------------------------------------------
# q318 — rendezvous rebalance
# ---------------------------------------------------------------------------
def test_q318_hrw_third_impl(spark):
    orders = _pd("orders")
    old_c = [0] * 8
    new_c = [0] * 8
    arrived = [0] * 8
    for key in orders.o_orderkey:
        hs = [_md5_long(f"hrw:{s}:{int(key)}") for s in range(8)]
        old = max(range(7), key=lambda s: hs[s])
        new = max(range(8), key=lambda s: hs[s])
        old_c[old] += 1
        new_c[new] += 1
        if old != new:
            arrived[new] += 1
            assert new == 7  # the HRW minimal-disruption law itself
    rows = _run(spark, "q318_rendezvous_rebalance")
    assert [(r.shard, r.n_old, r.n_new, r.n_arrived) for r in rows] == [
        (s, old_c[s], new_c[s], arrived[s]) for s in range(8)
    ]
    for r in rows:
        assert r.arrivals_only_at_new and r.old_shards_only_shrink
        assert r.moved_fraction_bounded and r.balanced


# ---------------------------------------------------------------------------
# q319 — CUPED
# ---------------------------------------------------------------------------
def test_q319_cuped_third_impl(spark):
    ev = _pd("events")
    ev = ev[ev.value.notna()].copy()
    day = (ev.ts - pd.Timestamp("1970-01-01")).dt.days
    sd = int((day.min() + day.max() + 1) // 2)
    ev["xv"] = [float(_dec2(v)) if d < sd else 0.0 for v, d in zip(ev.value, day)]
    ev["yv"] = [float(_dec2(v)) if d >= sd else 0.0 for v, d in zip(ev.value, day)]
    pu = ev.groupby("user_id")[["xv", "yv"]].sum()
    n = len(pu)
    vx = pu.xv.var(ddof=1)
    vy = pu.yv.var(ddof=1)
    cxy = pu.xv.cov(pu.yv)
    (r,) = _run(spark, "q319_cuped_variance_reduction")
    assert r.n_users == n
    assert r.mean_post == pytest.approx(pu.yv.mean(), rel=1e-5, abs=1e-6)
    assert r.theta == pytest.approx(cxy / vx, abs=1e-6)
    assert r.var_post == pytest.approx(vy, rel=1e-5)
    assert r.var_cuped == pytest.approx(vy - cxy * cxy / vx, rel=1e-5)
    assert 0 < r.variance_reduction < 1
    # the CUPED identity: adjusted variance equals var of Y - theta*X
    adj = pu.yv - (cxy / vx) * (pu.xv - pu.xv.mean())
    assert r.var_cuped == pytest.approx(adj.var(ddof=1), rel=1e-5)


# ---------------------------------------------------------------------------
# q320 — Neyman allocation
# ---------------------------------------------------------------------------
def test_q320_neyman_third_impl(spark):
    import math

    cust = _pd("customer")
    cust["bal"] = [float(_dec2(v)) for v in cust.c_acctbal]
    g = cust.groupby("c_mktsegment")
    stats = {
        seg: (len(d), d.bal.std(ddof=1), d.bal.mean()) for seg, d in g
    }
    wtot = sum(n * s for n, s, _ in stats.values())
    base = {seg: math.floor(500 * n * s / wtot) for seg, (n, s, _) in stats.items()}
    rem = {
        seg: 500 * n * s / wtot - base[seg] for seg, (n, s, _) in stats.items()
    }
    deficit = 500 - sum(base.values())
    order = sorted(stats, key=lambda seg: (-rem[seg], seg))
    alloc = {
        seg: base[seg] + (1 if i < deficit else 0) for i, seg in enumerate(order)
    }
    assert sum(alloc.values()) == 500
    rows = _run(spark, "q320_neyman_allocation")
    assert [r.segment for r in rows] == sorted(stats)
    for r in rows:
        n, s, mean = stats[r.segment]
        take = min(n, alloc[r.segment])
        assert (r.n_pop, r.n_alloc, r.n_sampled) == (n, alloc[r.segment], take)
        assert r.exhausted == (alloc[r.segment] > n)
        assert r.sd_pop == pytest.approx(s, rel=1e-6)
        assert r.pop_mean == pytest.approx(mean, rel=1e-6)
        assert r.budget_exact
        # the sampled mean comes from the md5-ranked draw — recompute it
        d = cust[cust.c_mktsegment == r.segment].copy()
        d["h"] = [_md5_long(f"ney:{int(k)}") for k in d.c_custkey]
        top = d.sort_values(["h", "c_custkey"]).head(take)
        assert r.sample_mean == pytest.approx(top.bal.mean(), rel=1e-6)


# ---------------------------------------------------------------------------
# q321 — Allen interval census
# ---------------------------------------------------------------------------
def _allen(a_s, a_e, b_s, b_e):
    if a_e < b_s:
        return "before"
    if a_e == b_s:
        return "meets"
    if a_s < b_s and a_e > b_s and a_e < b_e:
        return "overlaps"
    if a_s == b_s and a_e < b_e:
        return "starts"
    if a_s > b_s and a_e < b_e:
        return "during"
    if a_s > b_s and a_s < b_e and a_e == b_e:
        return "finishes"
    if a_s == b_s and a_e == b_e:
        return "equals"
    if a_s < b_s and a_e == b_e:
        return "finished_by"
    if a_s < b_s and a_e > b_e:
        return "contains"
    if a_s == b_s and a_e > b_e:
        return "started_by"
    if a_s < b_e and a_s > b_s and a_e > b_e:
        return "overlapped_by"
    if a_s == b_e:
        return "met_by"
    if a_s > b_e:
        return "after"
    return "other"


def test_q321_allen_third_impl(spark):
    from collections import Counter

    orders = _pd("orders")
    li = _pd("lineitem")
    fu = (
        li.groupby("l_orderkey").l_shipdate.max().rename("e").reset_index()
        .merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    )
    census = Counter()
    for _, grp in fu.groupby("o_custkey"):
        g = grp.sort_values(["o_orderdate", "o_orderkey"])
        ivs = list(zip(g.o_orderdate, g.e))
        for (a_s, a_e), (b_s, b_e) in zip(ivs, ivs[1:]):
            census[_allen(a_s, a_e, b_s, b_e)] += 1
    total = sum(census.values())
    rows = _run(spark, "q321_allen_interval_census")
    assert len(rows) == 13
    assert census.get("other", 0) == 0
    for r in rows:
        assert r.n_pairs == census.get(r.rel, 0)
        assert r.all_classified
        assert r.share == pytest.approx(census.get(r.rel, 0) / total, abs=1e-6)
    assert sum(r.n_pairs for r in rows) == total


# ---------------------------------------------------------------------------
# q322 — SAX motifs
# ---------------------------------------------------------------------------
def test_q322_sax_third_impl(spark):
    from collections import Counter

    orders = _pd("orders")
    d0 = orders.o_orderdate.min()
    idx = (orders.o_orderdate - d0).dt.days
    counts = idx[idx < 256].value_counts()
    x = np.zeros(256, dtype=np.int64)
    x[counts.index] = counts.values
    paa = x.reshape(32, 8).sum(axis=1).astype(float)
    z = (paa - paa.mean()) / paa.std(ddof=1)
    sym = np.select(
        [z < -0.6745, z < 0.0, z < 0.6745], ["a", "b", "c"], default="d"
    )
    words = Counter(
        "".join(sym[i : i + 3]) for i in range(30)
    )
    exp = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    rows = _run(spark, "q322_sax_motif_census")
    assert [(r.word, r.n) for r in rows] == exp
    for r in rows:
        assert r.share == pytest.approx(r.n / 30, abs=1e-6)


# ---------------------------------------------------------------------------
# q323 — Heaps' law
# ---------------------------------------------------------------------------
def test_q323_heaps_third_impl(spark):
    docs = _pd("documents")
    docs = docs.assign(h=[_md5_long(f"heaps:{int(d)}") for d in docs.doc_id])
    docs = docs.sort_values(["h", "doc_id"]).reset_index(drop=True)
    first_occ = {}
    cum_tokens = []
    tot = 0
    for rk, text in enumerate(docs.text, start=1):
        t = text.split(" ")
        tot += len(t) - 2
        cum_tokens.append(tot)
        for i in range(len(t) - 2):
            g = " ".join(t[i : i + 3])
            first_occ.setdefault(g, rk)
    n = len(docs)
    pts = []
    for k in range(3, 13):
        r = 2**k
        if r > n:
            break
        T = cum_tokens[r - 1]
        V = sum(1 for rk in first_occ.values() if rk <= r)
        pts.append((k, r, T, V))
    xs = [round(math.log(T), 6) for _, _, T, _ in pts]
    ys = [round(math.log(V), 6) for _, _, _, V in pts]
    m = len(pts)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    beta = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    rows = _run(spark, "q323_heaps_vocabulary_growth")
    assert [(r.k, r.r_docs, r.corpus_tokens, r.vocab) for r in rows] == pts
    for r in rows:
        assert r.heaps_beta == pytest.approx(beta, abs=1e-5)
        assert 0 < r.heaps_beta < 1  # sublinear growth, the Heaps regime
        assert r.ln_k0 == pytest.approx((sy - beta * sx) / m, abs=1e-5)


# ---------------------------------------------------------------------------
# q324 — KS exponential fit
# ---------------------------------------------------------------------------
def test_q324_ks_third_impl(spark):
    ev = _pd("events").sort_values(["ts", "event_id"])
    us = (ev.ts - pd.Timestamp(0)) // pd.Timedelta(microseconds=1)
    dt = np.diff(us.values)
    n = len(dt)
    lam = n / dt.sum()
    vals, cnts = np.unique(dt, return_counts=True)
    cle = np.cumsum(cnts)
    fexp = 1 - np.exp(-lam * vals)
    dplus = np.round(cle / n - fexp, 6).max()
    dminus = np.round(fexp - (cle - cnts) / n, 6).max()
    d = max(dplus, dminus)
    (r,) = _run(spark, "q324_ks_exponential_fit")
    assert r.n_gaps == n
    assert r.lambda_per_day == pytest.approx(86400e6 * lam, abs=1e-6)
    assert r.d_plus == pytest.approx(dplus, abs=2e-6)
    assert r.d_minus == pytest.approx(dminus, abs=2e-6)
    assert r.d_stat == pytest.approx(d, abs=2e-6)
    assert r.sqrt_n_d == pytest.approx(math.sqrt(n) * d, abs=1e-4)
    assert r.exp_rejected_05 == (math.sqrt(n) * d > 1.358)


# ---------------------------------------------------------------------------
# q325 — BFS hop histogram
# ---------------------------------------------------------------------------
def test_q325_bfs_third_impl(spark):
    """Textbook queue-based BFS in pure Python over the same support-2
    co-purchase graph must reproduce the histogram exactly."""
    from collections import defaultdict, deque, Counter

    li = _pd("lineitem")
    op = li[["l_orderkey", "l_partkey"]].drop_duplicates()
    sizes = op.groupby("l_orderkey").size()
    keep = sizes[sizes <= 32].index
    op = op[op.l_orderkey.isin(keep)]
    pair_sup = Counter()
    for _, grp in op.groupby("l_orderkey"):
        parts = sorted(grp.l_partkey)
        for i in range(len(parts)):
            for j in range(i + 1, len(parts)):
                pair_sup[(parts[i], parts[j])] += 1
    adj = defaultdict(set)
    for (a, b), sup in pair_sup.items():
        if sup >= 2:
            adj[a].add(b)
            adj[b].add(a)
    deg = {n: len(v) for n, v in adj.items()}
    src = max(deg, key=lambda n: (deg[n], -n))
    dist = {src: 0}
    dq = deque([src])
    while dq:
        u = dq.popleft()
        if dist[u] >= 8:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    hist = Counter(dist.values())
    rows = _run(spark, "q325_bfs_hop_histogram")
    assert len(rows) == 9
    for r in rows:
        assert r.n_nodes == hist.get(r.dist, 0)
        assert r.n_unreached == len(adj) - len(dist)
        assert r.max_dist == max(dist.values())


# ---------------------------------------------------------------------------
# q326 — reservoir merge law
# ---------------------------------------------------------------------------
def test_q326_reservoir_third_impl(spark):
    ev = _pd("events")
    R, G = 100, 16
    items = [
        (int(e), _md5_long(f"res:{int(e)}"), _md5_long(f"resg:{int(e)}") % G)
        for e in ev.event_id
    ]
    grp_res = {}
    for g in range(G):
        members = sorted(
            ((h, e) for e, h, gg in items if gg == g)
        )[:R]
        grp_res[g] = [e for _, e in members]
    sel = {x for v in grp_res.values() for x in v}
    union = sorted((h, e) for e, h, g in items if e in sel)
    merged = {e for _, e in union[:R]}
    glob = {e for _, e in sorted((h, e) for e, h, _ in items)[:R]}
    assert merged == glob  # the law itself, third-engine
    rows = _run(spark, "q326_reservoir_merge_law")
    assert len(rows) == G
    assert sum(r.n_in_global for r in rows) == R
    for r in rows:
        assert r.n_reservoir == len(grp_res[r.g])
        assert r.n_in_global == sum(1 for e in grp_res[r.g] if e in glob)
        assert r.merge_equals_global


# ---------------------------------------------------------------------------
# q327 — Little's-law conservation
# ---------------------------------------------------------------------------
def test_q327_little_third_impl(spark):
    li = _pd("lineitem")
    orders = _pd("orders")
    fu = (
        li.groupby("l_orderkey").l_shipdate.max().rename("ship").reset_index()
        .merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    )
    epoch = pd.Timestamp("1970-01-01")
    d0 = (fu.o_orderdate - epoch).dt.days.values
    d1 = (fu.ship - epoch).dt.days.values
    n = len(fu)
    order_days = int((d1 - d0).sum())
    horizon = int(d1.max() - d0.min())
    # sweep-line integral, independently
    from collections import Counter

    net = Counter()
    for a, b in zip(d0, d1):
        net[int(a)] += 1
        net[int(b)] -= 1
    days = sorted(net)
    wip = 0
    backlog = 0
    for a, b in zip(days, days[1:]):
        backlog += net[a]
        wip += backlog * (b - a)
    assert wip == order_days  # conservation, third-engine
    (r,) = _run(spark, "q327_little_law_conservation")
    assert (r.n_orders, r.horizon_days) == (n, horizon)
    assert (r.wip_days, r.order_days) == (wip, order_days)
    assert r.conservation_ok
    assert r.avg_wip_l == pytest.approx(wip / horizon, abs=1e-6)
    assert r.arrival_rate_lambda == pytest.approx(n / horizon, abs=1e-6)
    assert r.mean_wait_w == pytest.approx(order_days / n, abs=1e-6)
    # Little's identity on the published readouts: both factors are
    # quantized round-6, and W ~ O(1000) days amplifies lambda's
    # quantization by |W| — bound is W*5e-7 + lambda*5e-7
    tol = (abs(r.mean_wait_w) + abs(r.arrival_rate_lambda)) * 5e-7 + 1e-9
    assert r.avg_wip_l == pytest.approx(
        r.arrival_rate_lambda * r.mean_wait_w, abs=tol
    )


# ---------------------------------------------------------------------------
# q329 — Bellman-Ford weighted distances
# ---------------------------------------------------------------------------
def test_q329_bellman_ford_third_impl(spark):
    """Pure-Python 8-round Bellman-Ford over the same thresholded
    co-purchase graph with the same BIGINT nano-weights must reproduce
    the engine's histogram exactly — and the weighted distances must
    genuinely differ from q325's hop counts (the reason this query
    exists)."""
    from collections import Counter, defaultdict

    li = _pd("lineitem")[["l_orderkey", "l_partkey"]].drop_duplicates()
    sizes = li.groupby("l_orderkey").l_partkey.transform("size")
    li = li[sizes <= 32]
    g = defaultdict(list)
    sup = Counter()
    for _, grp in li.groupby("l_orderkey"):
        ps = sorted(grp.l_partkey)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                sup[(ps[i], ps[j])] += 1
    for (a, b), s in sup.items():
        if s >= 2:
            w = (2_000_000_000 + s) // (2 * s)
            g[a].append((b, w))
            g[b].append((a, w))
    deg = {n: len(v) for n, v in g.items()}
    src = sorted(g, key=lambda n: (-deg[n], n))[0]
    dist = {src: 0}
    for _ in range(8):
        relaxed = {}
        for u, d in dist.items():
            for v, w in g[u]:
                nd = d + w
                if nd < relaxed.get(v, nd + 1):
                    relaxed[v] = nd
        changed = False
        for v, nd in relaxed.items():
            if nd < dist.get(v, nd + 1):
                dist[v] = nd
                changed = True
        if not changed:
            break
    hist = Counter(dist.values())
    n_unreached = len(g) - len(dist)
    mx = max(dist.values())

    rows = _run(spark, "q329_bellman_ford_distances")
    got = [(r.dist_nano, r.n_nodes, r.n_unreached, r.max_dist_nano) for r in rows]
    exp = sorted((d, n, n_unreached, mx) for d, n in hist.items())
    assert got == exp

    # the honest gate: weighted != hops for almost every node
    hops = {src: 0}
    frontier = [src]
    k = 0
    while frontier:
        k += 1
        nxt = []
        for u in frontier:
            for v, _ in g[u]:
                if v not in hops and k <= 8:
                    hops[v] = k
                    nxt.append(v)
        frontier = nxt
    diff = sum(1 for n in dist if dist[n] != hops.get(n, -1) * 1_000_000_000)
    assert diff > 0.9 * len(dist)


# ---------------------------------------------------------------------------
# q330 — cluster-bootstrap ratio CI
# ---------------------------------------------------------------------------
def test_q330_cluster_ratio_third_impl(spark):
    """Recompute the cluster bootstrap row by row in pure Python
    (Decimal sums, md5 multiplicities keyed on l_orderkey) and pin the
    two properties the query exists for: lines of one order share a
    replica multiplicity (cluster resampling), and the percentile CI is
    measurably asymmetric around the plug-in ratio."""
    li = _pd("lineitem")[["l_orderkey", "l_extendedprice", "l_quantity"]]
    t0, t1, t2 = 3679, 7358, 9197
    ratios = []
    for b in range(32):
        mult = {
            ok: (
                0 if (h := _md5_long(f"boot:{b}:{int(ok)}") % 10000) < t0
                else 1 if h < t1 else 2 if h < t2 else 3
            )
            for ok in li.l_orderkey.unique()
        }
        num = den = Decimal(0)
        for r in li.itertuples():
            m = mult[r.l_orderkey]  # every line of the order shares m
            num += m * _dec2(r.l_extendedprice)
            den += m * _dec2(r.l_quantity)
        ratios.append(float(num) / float(den))
    ratios.sort()
    pn = sum((_dec2(v) for v in li.l_extendedprice), Decimal(0))
    pd_ = sum((_dec2(v) for v in li.l_quantity), Decimal(0))
    plug = float(pn) / float(pd_)

    rows = _run(spark, "q330_cluster_ratio_bootstrap")
    assert len(rows) == 1
    r = rows[0]
    assert r.n_replicas == 32
    assert abs(r.ratio_full - plug) < 1e-9 * abs(plug)
    assert abs(r.ci_lo - ratios[1]) < 1e-9 * abs(ratios[1])
    assert abs(r.ci_hi - ratios[30]) < 1e-9 * abs(ratios[30])
    assert r.ci_lo <= r.ratio_full <= r.ci_hi
    # the asymmetry gate: a ratio estimator skews; margins must differ
    # by more than float noise (measured hi/lo = 1.82 at sf0.001)
    assert r.hi_margin > 1.05 * r.lo_margin


# ---------------------------------------------------------------------------
# q332 — density-peak basins (native recursive CTE)
# ---------------------------------------------------------------------------
def test_q332_peak_basins_third_impl(spark):
    """Pure-Python hill-climb over the same thresholded graph: every
    node follows its strictly-greater (degree, -id) neighbor to a local
    peak; basin census must match the engine's recursive-CTE result
    exactly, and the strict-key rule must make every climb acyclic."""
    from collections import Counter, defaultdict

    li = _pd("lineitem")[["l_orderkey", "l_partkey"]].drop_duplicates()
    sizes = li.groupby("l_orderkey").l_partkey.transform("size")
    li = li[sizes <= 32]
    sup = Counter()
    for _, grp in li.groupby("l_orderkey"):
        ps = sorted(grp.l_partkey)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                sup[(ps[i], ps[j])] += 1
    adj = defaultdict(set)
    for (a, b), s in sup.items():
        if s >= 2:
            adj[a].add(b)
            adj[b].add(a)
    deg = {n: len(v) for n, v in adj.items()}

    def parent(u):
        cands = [v for v in adj[u] if deg[v] > deg[u] or (deg[v] == deg[u] and v < u)]
        return max(cands, key=lambda v: (deg[v], -v)) if cands else None

    basins, depths = Counter(), {}
    for n in adj:
        cur, d, seen = n, 0, {n}
        while (p := parent(cur)) is not None:
            assert p not in seen, "climb must be acyclic"
            seen.add(p)
            cur, d = p, d + 1
        basins[cur] += 1
        depths[cur] = max(depths.get(cur, 0), d)

    rows = _run(spark, "q332_peak_basin_clusters")
    got = sorted((r.peak, r.n_members, r.max_depth) for r in rows)
    exp = sorted((p, basins[p], depths[p]) for p in basins)
    assert got == exp
    assert sum(basins.values()) == len(adj)  # every node owns a basin
