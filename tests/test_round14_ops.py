"""Brute-force cross-checks for the round-14 operators (q290-q304).

Same methodology as tests/test_round10_ops.py / test_round12_ops.py:
each Spark operator is re-derived with pandas / pure Python from the raw
parquet, so a shared formulation bug between the query and its DuckDB
oracle can't hide. Integer outputs compare exactly; doubles that are a
single division of exact ints compare exactly too; decimal-summed
doubles go through Decimal quantization.

Also pins ``incremental_components`` against a full recompute on a
synthetic random graph whose delta genuinely merges communities — the
fixture graphs at support 3 are too small to exercise the contraction.
"""

from __future__ import annotations

import hashlib
import itertools
import math
from collections import Counter, defaultdict
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
# family A — live multi-stream unions
# ---------------------------------------------------------------------------
def test_q290_live_union_third_impl(spark):
    ev = _pd("events")
    ev["w"] = ev.ts.dt.floor("h")
    exp = {}
    for (w, t), g in ev.groupby(["w", "event_type"]):
        s = sum((_dec2(v) for v in g.value), Decimal(0))
        exp[(w.to_pydatetime(), t)] = (
            len(g),
            float(s),
            int(g.event_id.min()),
            int(g.event_id.max()),
        )
    rows = _run(spark, "q290_live_union_two_streams")
    assert len(rows) == len(exp)
    for r in rows:
        n, sv, mn, mx = exp[(r.w_start, r.event_type)]
        assert (r.n_events, r.min_event_id, r.max_event_id) == (n, mn, mx)
        assert r.sum_value == pytest.approx(sv, abs=1e-9)


def test_q291_cross_stream_dedup_third_impl(spark):
    ev = _pd("events")
    exp = ev.groupby("event_type").event_id.nunique().to_dict()
    rows = _run(spark, "q291_live_union_dedup_across_streams")
    assert {r.event_type: r.n_dedup for r in rows} == exp


def test_q292_heterogeneous_union_third_impl(spark):
    ev = _pd("events")
    even = ev[ev.event_id % 2 == 0]
    odd = ev[ev.event_id % 2 == 1]
    exp = {
        "props_stream": (len(odd), 0, int(odd.props.notna().sum())),
        "value_stream": (len(even), int(even.value.notna().sum()), 0),
    }
    rows = _run(spark, "q292_live_union_heterogeneous_schema")
    assert {r.src: (r.n_rows, r.n_value, r.n_props) for r in rows} == exp


def test_q293_two_producer_merge_third_impl(spark):
    ev = _pd("events")
    last = ev.loc[ev.groupby("user_id").event_id.idxmax()]
    exp = {
        int(r.user_id): (int(r.event_id), int(r.event_id) % 2, r.value)
        for r in last.itertuples()
    }
    rows = _run(spark, "q293_live_priority_merge_latest")
    assert len(rows) == len(exp)
    for r in rows:
        eid, src, val = exp[r.user_id]
        assert (r.last_event_id, r.last_src) == (eid, src)
        assert r.last_value == val


# ---------------------------------------------------------------------------
# family B — sketch-merge algebra
# ---------------------------------------------------------------------------
def test_q294_hll_laws_third_impl(spark):
    li = _pd("lineitem")
    exact = li.groupby("l_returnflag").l_orderkey.nunique().to_dict()
    rows = _run(spark, "q294_hll_merge_invariance")
    assert {r.flag: r.n_exact for r in rows} == exact
    assert all(r.layouts_agree_2pct and r.union_within_5pct for r in rows)


def test_q295_cms_third_impl(spark):
    li = _pd("lineitem")
    items = [str(int(s)) for s in li.l_suppkey]
    counts = Counter(items)
    depth, width = 3, 1024
    cells = [Counter() for _ in range(depth)]
    for it, c in counts.items():
        for j in range(depth):
            cells[j][_md5_long(f"{j}:{it}") % width] += c
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    rows = _run(spark, "q295_countmin_merge_skew")
    assert len(rows) == len(top)
    for r, (item, n) in zip(rows, top):
        est = min(cells[j][_md5_long(f"{j}:{item}") % width] for j in range(depth))
        assert (r.item, r.exact_n, r.cms_n) == (item, n, est)
        assert r.overcount == est - n >= 0
        assert r.merged_equals_global and r.overcount_nonneg


def test_q296_histogram_folds_third_impl(spark):
    cust = _pd("customer")
    nation = _pd("nation")
    region_of = dict(zip(nation.n_nationkey, nation.n_regionkey))
    mn, mx = cust.c_acctbal.min(), cust.c_acctbal.max()
    w = (mx - mn) / 16.0
    exp = defaultdict(lambda: [0, Decimal(0)])
    for r in cust.itertuples():
        b = 0 if w == 0 else min(int(math.floor((r.c_acctbal - mn) / w)), 15)
        key = (region_of[r.c_nationkey], b)
        exp[key][0] += 1
        exp[key][1] += _dec2(r.c_acctbal)
    rows = _run(spark, "q296_histogram_merge_commutativity")
    assert len(rows) == len(exp)
    for r in rows:
        n, amt = exp[(r.region, r.bin)]
        assert r.cnt_asc == r.cnt_desc == n
        assert r.amt_asc == r.amt_desc == pytest.approx(float(amt), abs=1e-9)
        assert r.merge_commutes


def test_q297_sample_stability_third_impl(spark):
    ev = _pd("events")
    exp = defaultdict(lambda: [0, 0])
    for eid in ev.event_id:
        src = "even" if eid % 2 == 0 else "odd"
        exp[src][0] += 1
        exp[src][1] += _md5_long(str(int(eid))) % 100 < 10
    rows = _run(spark, "q297_sample_union_stability")
    for r in rows:
        n, s = exp[r.src]
        assert (r.n_rows, r.n_sampled_union_first, r.n_sampled_split_first) == (
            n,
            s,
            s,
        )
        assert r.distributes_over_union


# ---------------------------------------------------------------------------
# family C — bipartite projections
# ---------------------------------------------------------------------------
def _ps_edges(sf=SF):
    li = _pd("lineitem", sf)
    return {(int(p), int(s)) for p, s in zip(li.l_partkey, li.l_suppkey)}


def test_q298_supplier_projection_third_impl(spark):
    edges = _ps_edges()
    by_part = defaultdict(set)
    for p, s in edges:
        by_part[p].add(s)
    bounded = {p: ss for p, ss in by_part.items() if len(ss) <= 64}
    deg = Counter()
    shared = Counter()
    for ss in bounded.values():
        for s in ss:
            deg[s] += 1
        for a, b in itertools.combinations(sorted(ss), 2):
            shared[(a, b)] += 1
    cands = [
        (a, b, c, c / (deg[a] + deg[b] - c))
        for (a, b), c in shared.items()
        if c >= 2
    ]
    cands.sort(key=lambda t: (-t[3], t[0], t[1]))
    rows = _run(spark, "q298_supplier_projection")
    assert [(r.supp_a, r.supp_b, r.shared_parts) for r in rows] == [
        (a, b, c) for a, b, c, _ in cands[:20]
    ]
    for r, (_, _, _, j) in zip(rows, cands):
        assert r.jaccard == j


def test_q299_part_density_third_impl(spark):
    edges = _ps_edges()
    part = _pd("part")
    brand_of = dict(zip(part.p_partkey, part.p_brand))
    by_supp = defaultdict(list)
    for p, s in edges:
        by_supp[s].append(p)
    capped = {s: sorted(ps)[:64] for s, ps in by_supp.items()}
    proj = set()
    for ps in capped.values():
        proj.update(itertools.combinations(sorted(ps), 2))
    nodes = defaultdict(set)
    for ps in capped.values():
        for p in ps:
            nodes[brand_of[p]].add(p)
    intra = Counter()
    for a, b in proj:
        if brand_of[a] == brand_of[b]:
            intra[brand_of[a]] += 1
    rows = _run(spark, "q299_part_projection_density")
    exp = {
        br: (len(ns), intra.get(br, 0), len(ns) * (len(ns) - 1) // 2)
        for br, ns in nodes.items()
        if len(ns) >= 2
    }
    assert len(rows) == len(exp)
    for r in rows:
        n, e, cb = exp[r.brand]
        assert (r.n_nodes, r.n_edges, r.clique_bound) == (n, e, cb)
        assert r.density == e / cb


def test_q300_degree_balance_third_impl(spark):
    edges = _ps_edges()
    pdeg = Counter(p for p, _ in edges)
    sdeg = Counter(s for _, s in edges)

    def bucket(d):
        return d.bit_length() - 1 if d >= 1 else 0

    exp = defaultdict(lambda: [0, 10**9, 0])
    for side, cnt in (("part", pdeg), ("supplier", sdeg)):
        for d in cnt.values():
            k = (side, bucket(d))
            exp[k][0] += 1
            exp[k][1] = min(exp[k][1], d)
            exp[k][2] = max(exp[k][2], d)
    rows = _run(spark, "q300_bipartite_degree_balance")
    assert {(r.side, r.bucket): (r.n_nodes, r.min_degree, r.max_degree) for r in rows} == {
        k: tuple(v) for k, v in exp.items()
    }


# ---------------------------------------------------------------------------
# family D — incremental components (+ q304 percolation)
# ---------------------------------------------------------------------------
def _copurchase_edges(sf=SF, min_support=1, ship_before=None):
    li = _pd("lineitem", sf)
    if ship_before is not None:
        li = li[li.l_shipdate < pd.Timestamp(ship_before)]
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


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_q301_incremental_cc_third_impl(spark):
    full = _copurchase_edges(min_support=3)
    lbl = _uf_components(full.keys())
    n_parts = Counter(lbl.values())
    n_edges = Counter(lbl[a] for a, _ in full)
    rows = _run(spark, "q301_incremental_components")
    assert {r.community: (r.n_parts, r.n_edges) for r in rows} == {
        c: (n_parts[c], n_edges[c]) for c in n_parts
    }


def test_q302_affected_delta_third_impl(spark):
    full = _copurchase_edges(min_support=3)
    old = _copurchase_edges(min_support=3, ship_before="1998-01-01")
    new_lbl = _uf_components(full.keys())
    old_lbl = _uf_components(old.keys())
    agg = defaultdict(lambda: [0, 0, set()])
    for n, c in new_lbl.items():
        o = old_lbl.get(n)
        if o is None:
            agg[c][1] += 1
        else:
            agg[c][2].add(o)
            if o != c:
                agg[c][0] += 1
    exp = {
        c: (m, nw, len(src))
        for c, (m, nw, src) in agg.items()
        if m > 0 or nw > 0
    }
    rows = _run(spark, "q302_affected_community_delta")
    assert {
        r.community: (r.n_nodes_moved, r.n_new_nodes, r.merged_from) for r in rows
    } == exp


def test_q304_percolation_third_impl(spark):
    sup = _copurchase_edges(min_support=3)
    universe = {n for e in sup for n in e}
    exp = {}
    for t in (3, 4, 5, 6):
        et = [e for e, c in sup.items() if c >= t]
        lbl = _uf_components(et)
        sizes = Counter(lbl.values())
        exp[t] = (
            len(sizes),
            max(sizes.values()) if sizes else 0,
            len(universe) - len(lbl),
        )
    rows = _run(spark, "q304_percolation_threshold_sweep")
    assert {
        r.support_t: (r.n_components, r.max_component_size, r.n_singletons)
        for r in rows
    } == exp


def test_incremental_components_synthetic_merge(spark):
    """The contraction path on a graph where the delta genuinely merges
    old communities and introduces brand-new nodes — exact label
    equality with the one-shot operator AND a union-find."""
    import random

    from kinesis_sample_spark.operators.components import (
        connected_components,
        incremental_components,
    )

    rng = random.Random(14)
    # old graph: 12 disjoint chains of 8 nodes
    old = []
    for c in range(12):
        base = c * 10
        old += [(base + i, base + i + 1) for i in range(7)]
    # delta: bridges between random chains + a few brand-new nodes
    delta = []
    for _ in range(8):
        a = rng.randrange(12) * 10 + rng.randrange(8)
        b = rng.randrange(12) * 10 + rng.randrange(8)
        if a != b:
            delta.append((min(a, b), max(a, b)))
    delta += [(5, 1000), (1000, 1001), (115, 1002)]  # 115 is new too
    old_set = set(old)
    delta = [e for e in set(delta) if e not in old_set]
    old_df = spark.createDataFrame(old, "a bigint, b bigint")
    delta_df = spark.createDataFrame(delta, "a bigint, b bigint")
    inc = {
        r.node: r.component
        for r in incremental_components(old_df, delta_df, "a", "b").collect()
    }
    full_df = old_df.unionByName(delta_df)
    ref = {
        r.node: r.component
        for r in connected_components(full_df, "a", "b").collect()
    }
    uf = _uf_components(old + delta)
    assert inc == ref == uf
    # sanity: the delta actually merged something
    assert len(set(inc.values())) < 12


def test_incremental_components_empty_delta(spark):
    from kinesis_sample_spark.operators.components import (
        connected_components,
        incremental_components,
    )

    old_df = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "a bigint, b bigint")
    empty = spark.createDataFrame([], "a bigint, b bigint")
    inc = {
        r.node: r.component
        for r in incremental_components(old_df, empty, "a", "b").collect()
    }
    ref = {
        r.node: r.component
        for r in connected_components(old_df, "a", "b").collect()
    }
    assert inc == ref


# ---------------------------------------------------------------------------
# family E — mutual kNN
# ---------------------------------------------------------------------------
def test_q303_mutual_topk_third_impl(spark):
    emb = _pd("embeddings")
    ids = emb.vec_id.to_numpy()
    mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    cos = (mat @ mat.T) / np.outer(norms, norms)
    np.fill_diagonal(cos, -np.inf)
    k = 5
    topk = {}
    for i, vid in enumerate(ids):
        order = sorted(range(len(ids)), key=lambda j: (-cos[i, j], ids[j]))[:k]
        topk[int(vid)] = {int(ids[j]): r + 1 for r, j in enumerate(order)}
    exp = {}
    for a in topk:
        for b, rab in topk[a].items():
            if a < b and a in topk.get(b, {}):
                exp[(a, b)] = (rab, topk[b][a])
    rows = _run(spark, "q303_mutual_topk_pairs")
    assert {(r.vec_a, r.vec_b): (r.rank_ab, r.rank_ba) for r in rows} == exp
    idx = {int(v): i for i, v in enumerate(ids)}
    for r in rows:
        assert r.cos_sim == pytest.approx(
            cos[idx[r.vec_a], idx[r.vec_b]], rel=1e-12
        )


# ---------------------------------------------------------------------------
# second batch — skylines, weighted sampling, phrase consistency
# ---------------------------------------------------------------------------
def test_q305_skyline_third_impl(spark):
    part = _pd("part")
    part["price_c"] = (
        part.p_retailprice.map(lambda v: int(_dec2(v) * 100))
    )
    exp = set()
    for brand, g in part.groupby("p_brand"):
        pts = list(zip(g.p_partkey, g.price_c, g.p_size))
        for k, p, s in pts:
            dominated = any(
                p2 <= p and s2 >= s and (p2 < p or s2 > s)
                for _, p2, s2 in pts
            )
            if not dominated:
                exp.add((brand, int(k), int(p), int(s)))
    rows = _run(spark, "q305_pareto_skyline_parts")
    assert {(r.brand, r.p_partkey, r.price_c, r.p_size) for r in rows} == exp


def test_q306_skyline3d_third_impl(spark):
    li = _pd("lineitem")
    epoch = pd.Timestamp("1970-01-01")
    metrics = {}
    for s, g in li.groupby("l_suppkey"):
        rev = sum(
            (_dec2(p) * (Decimal(1) - _dec2(d)) for p, d in zip(g.l_extendedprice, g.l_discount)),
            Decimal(0),
        )
        metrics[int(s)] = (
            int(rev * 10000),
            g.l_partkey.nunique(),
            (g.l_shipdate.min() - epoch).days,
        )
    exp = set()
    items = list(metrics.items())
    for k, (r, n, d) in items:
        dominated = any(
            r2 >= r and n2 >= n and d2 <= d and (r2 > r or n2 > n or d2 < d or k2 < k)
            for k2, (r2, n2, d2) in items
            if k2 != k
        )
        if not dominated:
            exp.add((k, r, n, d))
    rows = _run(spark, "q306_supplier_skyline_3d")
    assert {(r.l_suppkey, r.rev_u, r.n_parts, r.first_day) for r in rows} == exp


def test_q307_weighted_sample_third_impl(spark):
    docs = _pd("documents")
    keyed = []
    for r in docs.itertuples():
        h = _md5_long(f"ws:{int(r.doc_id)}") % 1_000_000
        u = (h + 1) / 1_000_001
        t = float(
            Decimal(repr(round(math.log(u), 6))).quantize(Decimal("1e-6"))
        )
        keyed.append((r.source, int(r.doc_id), int(r.n_chars), t / r.n_chars))
    exp = {}
    for src in {k[0] for k in keyed}:
        grp = sorted(
            (k for k in keyed if k[0] == src), key=lambda k: (-k[3], k[1])
        )[:20]
        exp[src] = [(k[1], k[2]) for k in grp]
    rows = _run(spark, "q307_weighted_sample_es")
    got = defaultdict(list)
    for r in rows:
        got[r.source].append((r.doc_id, r.n_chars))
        # inclusion leans to heavier docs by construction; the key itself
        # must match the quantized-ln recipe exactly
        h = _md5_long(f"ws:{r.doc_id}") % 1_000_000
        t = float(
            Decimal(repr(round(math.log((h + 1) / 1_000_001), 6))).quantize(
                Decimal("1e-6")
            )
        )
        assert r.sample_key == t / r.n_chars
    assert dict(got) == exp


def test_q307_weighted_inclusion_bias(spark):
    """Sanity on the semantics: the weighted sample must skew heavier
    than a uniform draw — its mean n_chars exceeds the corpus mean."""
    docs = _pd("documents")
    rows = _run(spark, "q307_weighted_sample_es")
    assert np.mean([r.n_chars for r in rows]) > docs.n_chars.mean()


def test_q308_phrase_consistency_third_impl(spark):
    import re

    docs = _pd("documents")
    pair_count = Counter()
    docs_with = defaultdict(set)
    for r in docs.itertuples():
        toks = r.text.split(" ")
        for a, b in zip(toks, toks[1:]):
            pair_count[(a, b)] += 1
            docs_with[(a, b)].add(int(r.doc_id))
    top = sorted(pair_count.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    rows = _run(spark, "q308_phrase_index_consistency")
    assert [(r.tok1, r.tok2, r.n_pairs) for r in rows] == [
        (a, b, n) for (a, b), n in top
    ]
    for r in rows:
        n_idx = len(docs_with[(r.tok1, r.tok2)])
        pat = re.compile(f"(^| ){re.escape(r.tok1)} {re.escape(r.tok2)}( |$)")
        n_scan = sum(bool(pat.search(t)) for t in docs.text)
        assert (r.n_docs_index, r.n_docs_scan) == (n_idx, n_scan)
        assert r.index_matches_scan == (n_idx == n_scan)


# ---------------------------------------------------------------------------
# third batch — z-order locality, grid-density clustering
# ---------------------------------------------------------------------------
def test_q309_zorder_third_impl(spark):
    orders = _pd("orders")
    epoch = pd.Timestamp("1970-01-01")
    days = (orders.o_orderdate - epoch).dt.days.to_numpy()
    cust = orders.o_custkey.to_numpy()
    mind, maxd, maxc = days.min(), days.max(), cust.max()
    d8 = (days - mind) * 256 // (maxd - mind + 1)
    c8 = cust * 256 // (maxc + 1)
    z = np.zeros(len(d8), dtype=np.int64)
    for b in range(8):
        z |= ((d8 >> b) & 1) << (2 * b + 1)
        z |= ((c8 >> b) & 1) << (2 * b)
    exp = {}
    for layout, bucket in (("zorder", z >> 10), ("date_range", d8 >> 2)):
        df = pd.DataFrame({"bucket": bucket, "d8": d8, "c8": c8})
        spans = df.groupby("bucket").agg(
            ds=("d8", lambda s: s.max() - s.min()),
            cs=("c8", lambda s: s.max() - s.min()),
        )
        exp[layout] = (
            len(spans),
            int(spans.ds.sum()) / len(spans),
            int(spans.cs.sum()) / len(spans),
        )
    rows = _run(spark, "q309_zorder_locality_audit")
    assert {r.layout: (r.n_buckets, r.avg_d_span, r.avg_c_span) for r in rows} == exp
    got = {r.layout: r for r in rows}
    # the story the audit exists to tell: z-order bounds BOTH spans,
    # the date sort leaves the customer span unbounded
    assert got["zorder"].avg_c_span < got["date_range"].avg_c_span / 2


def test_q310_grid_density_third_impl(spark):
    emb = _pd("embeddings")
    mat = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    x, y = mat[:, 0], mat[:, 1]
    wx, wy = (x.max() - x.min()) / 8.0, (y.max() - y.min()) / 8.0
    cx = np.minimum(np.floor((x - x.min()) / wx), 7).astype(int)
    cy = np.minimum(np.floor((y - y.min()) / wy), 7).astype(int)
    counts = Counter(zip(cx, cy))
    dense = {c: n for c, n in counts.items() if n >= 8}
    edges = [
        (a[0] * 8 + a[1], b[0] * 8 + b[1])
        for a in dense
        for b in dense
        if a < b and abs(a[0] - b[0]) <= 1 and abs(a[1] - b[1]) <= 1
    ]
    lbl = _uf_components(edges)
    clusters = defaultdict(list)
    for (ccx, ccy), n in dense.items():
        cid = ccx * 8 + ccy
        clusters[lbl.get(cid, cid)].append((ccx, ccy, n))
    exp = {
        cl: (
            len(cells),
            sum(n for _, _, n in cells),
            min(c[0] for c in cells),
            max(c[0] for c in cells),
            min(c[1] for c in cells),
            max(c[1] for c in cells),
        )
        for cl, cells in clusters.items()
    }
    rows = _run(spark, "q310_grid_density_clusters")
    assert {
        r.cluster: (r.n_cells, r.n_points, r.min_cx, r.max_cx, r.min_cy, r.max_cy)
        for r in rows
    } == exp


# ---------------------------------------------------------------------------
# fourth mini-batch — k-core peeling, Poisson bootstrap
# ---------------------------------------------------------------------------
def test_q311_kcore_third_impl(spark):
    sup = _copurchase_edges(min_support=2)
    exp = {}
    for k in (2, 3):
        es = set(sup.keys())
        while True:
            deg = Counter()
            for a, b in es:
                deg[a] += 1
                deg[b] += 1
            keep = {n for n, d in deg.items() if d >= k}
            es2 = {(a, b) for a, b in es if a in keep and b in keep}
            if es2 == es:
                break
            es = es2
        deg = Counter()
        for a, b in es:
            deg[a] += 1
            deg[b] += 1
        exp[k] = (len(deg), len(es), max(deg.values()) if deg else 0)
    rows = _run(spark, "q311_kcore_census")
    assert {
        r.k: (r.n_core_nodes, r.n_core_edges, r.max_core_degree) for r in rows
    } == exp
    # the census is only meaningful if cores nest: the 3-core is a
    # subgraph of the 2-core
    got = {r.k: r for r in rows}
    assert got[3].n_core_edges <= got[2].n_core_edges


def test_q312_bootstrap_third_impl(spark):
    orders = _pd("orders")
    t0, t1, t2 = 3679, 7358, 9197
    means = []
    for b in range(32):
        num = Decimal(0)
        den = 0
        for r in orders.itertuples():
            h = _md5_long(f"boot:{b}:{int(r.o_orderkey)}") % 10000
            m = 0 if h < t0 else 1 if h < t1 else 2 if h < t2 else 3
            num += m * _dec2(r.o_totalprice)
            den += m
        means.append(float(num) / den)
    means.sort()
    full = float(sum(_dec2(v) for v in orders.o_totalprice)) / len(orders)
    rows = _run(spark, "q312_bootstrap_mean_ci")
    assert len(rows) == 1
    r = rows[0]
    assert r.n_replicas == 32
    assert r.mean_full == pytest.approx(full, rel=1e-12)
    assert r.ci_lo == pytest.approx(means[1], rel=1e-12)
    assert r.ci_hi == pytest.approx(means[30], rel=1e-12)
    assert r.ci_lo <= r.mean_full <= r.ci_hi


def test_q313_dual_sink_third_impl(spark):
    ev = _pd("events")
    exp = {}
    for t, g in ev.groupby("event_type"):
        s = sum((_dec2(v) for v in g.value), Decimal(0))
        exp[t] = (len(g), float(s))
    rows = _run(spark, "q313_live_dual_sink_consistency")
    assert len(rows) == len(exp)
    for r in rows:
        n, sv = exp[r.event_type]
        assert r.n_events == n
        assert r.sum_value == pytest.approx(sv, abs=1e-9)
        assert r.sinks_agree
