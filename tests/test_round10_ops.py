"""Brute-force cross-checks for round-10 operator changes.

Same methodology as tests/test_round9_ops.py: each Spark operator is
re-derived with plain-Python itertools over a synthetic frame the Spark
path never sees, so a shared formulation bug between query and oracle
can't hide.
"""

from __future__ import annotations

import itertools
from collections import Counter

from kinesis_sample_spark.queries.graph import MAX_BASKET, copurchase_pairs


def _brute_pairs(edges, max_basket):
    baskets = {}
    for o, p in set(edges):
        baskets.setdefault(o, set()).add(p)
    counts = Counter()
    for items in baskets.values():
        if len(items) > max_basket:
            continue
        for a, b in itertools.combinations(sorted(items), 2):
            counts[(a, b)] += 1
    return counts


def test_copurchase_mega_basket_cap(spark):
    # 3 small baskets (sizes 2, 3, 4) + one mega-basket of MAX_BASKET + 8
    # items sharing parts with the small baskets — its pairs must vanish
    # without perturbing the counts the small baskets produce.
    edges = (
        [(1, p) for p in (10, 11)]
        + [(2, p) for p in (10, 11, 12)]
        + [(3, p) for p in (11, 12, 13, 14)]
        + [(4, p) for p in range(10, 10 + MAX_BASKET + 8)]
    )
    # duplicate lines in an order must not inflate support
    edges += [(2, 10), (3, 14)]
    df = spark.createDataFrame(edges, "l_orderkey int, l_partkey int").distinct()

    got = {
        (r.part_a, r.part_b): r.n_orders
        for r in copurchase_pairs(df, "l_orderkey", "l_partkey").collect()
    }
    expected = _brute_pairs(edges, MAX_BASKET)
    assert got == dict(expected)
    # the mega-basket really was at risk: uncapped brute force disagrees
    assert dict(_brute_pairs(edges, 10**9)) != dict(expected)
    # boundary: a basket of exactly MAX_BASKET items survives
    exact = [(7, p) for p in range(MAX_BASKET)]
    df2 = spark.createDataFrame(exact, "l_orderkey int, l_partkey int")
    n = copurchase_pairs(df2, "l_orderkey", "l_partkey").count()
    assert n == MAX_BASKET * (MAX_BASKET - 1) // 2


# ---------------------------------------------------------------------------
# Third implementations from raw parquet (pandas/pure Python), so a shared
# formulation bug between the Spark query and its DuckDB oracle can't hide.
# ---------------------------------------------------------------------------
SF = "/root/testdata/sf0.001"


def _pd(table):
    import pandas as pd

    return pd.read_parquet(f"{SF}/{table}.parquet")


def _run(spark, name):
    from kinesis_sample_spark.queries import load_registry

    return load_registry()[name].fn(spark, SF).collect()


def test_session_bounce_third_impl(spark):
    rows = {r.user_id: r for r in _run(spark, "q208_session_bounce")}
    ev = _pd("events")
    gap = 30 * 60 * 1_000_000
    for uid, g in ev.groupby("user_id"):
        ts = sorted(
            (int(t.value), int(e))  # pandas Timestamp.value = epoch ns
            for t, e in zip(g["ts"], g["event_id"])
        )
        us = [t // 1000 for t, _ in ts]
        sessions = []
        for i, u in enumerate(us):
            if i == 0 or u - us[i - 1] > gap:
                sessions.append([u])
            else:
                sessions[-1].append(u)
        r = rows[uid]
        assert r.n_sessions == len(sessions)
        assert r.n_bounces == sum(1 for s in sessions if len(s) == 1)
        assert r.total_dwell_us == sum(s[-1] - s[0] for s in sessions)
        assert r.n_events == len(us)


def test_survival_hazard_third_impl(spark):
    rows = _run(spark, "q209_survival_hazard")
    ev = _pd("events")
    lifetimes = []
    for _, g in ev.groupby("user_id"):
        days = (g["ts"].max().normalize() - g["ts"].min().normalize()).days
        lifetimes.append(int(days // 7))
    from collections import Counter

    ended = Counter(lifetimes)
    for r in rows:
        at_risk = sum(c for w, c in ended.items() if w >= r.week)
        assert r.n_ended == ended[r.week]
        assert r.n_at_risk == at_risk
        assert abs(r.hazard - ended[r.week] / at_risk) < 1e-15
    assert sum(r.n_ended for r in rows) == len(lifetimes)


def test_gini_third_impl(spark):
    rows = {r.c_mktsegment: r for r in _run(spark, "q213_gini_concentration")}
    orders, cust = _pd("orders"), _pd("customer")
    seg_of = dict(zip(cust["c_custkey"], cust["c_mktsegment"]))
    from collections import defaultdict

    rev = defaultdict(lambda: defaultdict(float))
    for _, o in orders.iterrows():
        rev[seg_of[o["o_custkey"]]][o["o_custkey"]] += round(o["o_totalprice"], 2)
    for seg, per_cust in rev.items():
        xs = sorted(per_cust.values())
        n = len(xs)
        s1 = sum((i + 1) * x for i, x in enumerate(xs))
        s0 = sum(xs)
        gini = (2 * s1 - (n + 1) * s0) / (n * s0)
        assert rows[seg].n == n
        assert abs(rows[seg].gini - gini) < 1e-9


def test_benford_third_impl(spark):
    rows = {r.digit: r for r in _run(spark, "q215_benford_audit")}
    import math
    from collections import Counter

    prices = _pd("orders")["o_totalprice"]
    digits = Counter(int(f"{round(p, 2):.2f}"[0]) for p in prices)
    total = len(prices)
    for d, n in digits.items():
        assert rows[d].n == n
        assert abs(rows[d].share - n / total) < 1e-15
        assert abs(rows[d].expected_share - math.log10(1 + 1 / d)) < 1e-6


def test_median_of_means_third_impl(spark):
    (r,) = _run(spark, "q217_median_of_means")
    import numpy as np

    docs = _pd("documents")
    means = [
        g["n_chars"].sum() / len(g) for _, g in docs.groupby(docs["doc_id"] % 32)
    ]
    assert r.n_buckets == len(means)
    assert abs(r.mom_mean - float(np.percentile(means, 50))) < 1e-9
    assert abs(r.plain_mean - docs["n_chars"].sum() / len(docs)) < 1e-9


def test_percentile_bridge_third_impl(spark):
    rows = {(r.l_returnflag, r.p): r for r in _run(spark, "q212_percentile_bridge")}
    import numpy as np

    li = _pd("lineitem")
    for flag, g in li.groupby("l_returnflag"):
        xs = np.sort(g["l_extendedprice"].to_numpy())
        mn, mx, n = xs[0], xs[-1], len(xs)
        w = (mx - mn) / 20.0
        bins = np.minimum(np.floor((xs - mn) / w), 19).astype(int)
        counts = np.bincount(bins, minlength=20)
        for p in (0.5, 0.9):
            target = p * n
            cum = 0
            for b in range(20):
                if cum + counts[b] >= target and cum < target:
                    est = mn + w * (b + (target - cum) / counts[b])
                    break
                cum += counts[b]
            r = rows[(flag, p)]
            assert abs(r.est - est) < 1e-9 * max(1.0, abs(est))
            exact = float(np.percentile(xs, p * 100))
            assert abs(r.exact - exact) < 1e-9 * max(1.0, abs(exact))
            assert abs(r.abs_err - abs(r.est - r.exact)) < 1e-9


def test_cusum_third_impl(spark):
    rows = {r.o_orderpriority: r for r in _run(spark, "q216_cusum_changepoint")}
    orders = _pd("orders")
    for prio, g in orders.groupby("o_orderpriority"):
        daily = {}
        for _, o in g.iterrows():
            d = o["o_orderdate"]
            daily[d] = daily.get(d, 0) + round(o["o_totalprice"] * 100)  # cents
        days = sorted(daily)
        total = sum(daily.values())
        n = len(days)
        prefix = 0
        best_day, best_cusum = None, None
        for k, d in enumerate(days, start=1):
            prefix += daily[d]
            cusum = prefix / 100.0 - k * (total / 100.0) / n
            if best_cusum is None or abs(cusum) > abs(best_cusum):
                best_day, best_cusum = d, cusum
        r = rows[prio]
        assert r.n_days == n
        assert r.changepoint_day == best_day.to_pydatetime()
        assert abs(r.cusum - best_cusum) < 1e-6 * max(1.0, abs(best_cusum))


def test_weighted_median_third_impl(spark):
    rows = {r.l_returnflag: r for r in _run(spark, "q221_weighted_median")}
    li = _pd("lineitem")
    for flag, g in li.groupby("l_returnflag"):
        pairs = sorted(zip(g["l_extendedprice"], g["l_quantity"].astype(int)))
        total = sum(w for _, w in pairs)
        cum = 0
        for price, w in pairs:
            cum += w
            if 2 * cum >= total:
                break
        assert rows[flag].weighted_median == price
        assert rows[flag].total_weight == total


def test_chi_square_third_impl(spark):
    (r,) = _run(spark, "q222_chi_square_independence")
    from collections import Counter

    import pandas as pd

    ev = _pd("events")
    epoch = (ev["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days
    cells = Counter(zip(ev["event_type"], epoch % 7))
    rows = Counter()
    cols = Counter()
    for (t, d), o in cells.items():
        rows[t] += o
        cols[d] += o
    n = sum(cells.values())
    chi2 = sum(
        round((o - rows[t] * cols[d] / n) ** 2 / (rows[t] * cols[d] / n), 6)
        for (t, d), o in cells.items()
    )
    assert r.n == n
    assert r.dof == (len(rows) - 1) * (len(cols) - 1)
    assert abs(r.chi2 - chi2) < 1e-6


def test_activity_streaks_third_impl(spark):
    rows = {r.user_id: r for r in _run(spark, "q223_activity_streaks")}
    import pandas as pd

    ev = _pd("events")
    days_of = ev.groupby("user_id")["ts"].apply(
        lambda s: sorted(set((s.dt.normalize() - pd.Timestamp("1970-01-01")).dt.days))
    )
    for uid, days in days_of.items():
        streaks, cur = [], 1
        for a, b in zip(days, days[1:]):
            if b == a + 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        r = rows[uid]
        assert r.n_active_days == len(days)
        assert r.longest_streak == max(streaks)
        assert r.n_streaks == len(streaks)


def test_itemset3_third_impl(spark):
    rows = [
        (r.part_a, r.part_b, r.part_c, r.support)
        for r in _run(spark, "q220_itemset3_support")
    ]
    li = _pd("lineitem")
    from collections import Counter

    baskets = {}
    for o, p in set(zip(li["l_orderkey"], li["l_partkey"])):
        baskets.setdefault(o, set()).add(p)
    support = Counter()
    for items in baskets.values():
        if len(items) > MAX_BASKET:
            continue
        for tri in itertools.combinations(sorted(items), 3):
            support[tri] += 1
    expected = sorted(
        ((a, b, c, n) for (a, b, c), n in support.items()),
        key=lambda t: (-t[3], t[0], t[1], t[2]),
    )[:100]
    assert rows == expected


def test_priority_canonical_third_impl(spark):
    rows = {r.prefix_hash: r for r in _run(spark, "q210_priority_canonical")}
    docs = _pd("documents")
    import hashlib
    from collections import defaultdict

    groups = defaultdict(list)
    for _, d in docs.iterrows():
        prefix = " ".join(d["text"].split(" ")[:3])
        h = hashlib.md5(prefix.encode()).hexdigest()
        prio = {"src0": 0, "src1": 1, "src2": 2}.get(d["source"], 9)
        groups[h].append((prio, -int(d["n_chars"]), int(d["doc_id"]), d["source"]))
    multi = {h: sorted(ms) for h, ms in groups.items() if len(ms) >= 2}
    assert set(rows) == set(multi)
    for h, ms in multi.items():
        r = rows[h]
        assert r.canonical_doc_id == ms[0][2]
        assert r.canonical_source == ms[0][3]
        assert r.n_members == len(ms)


def test_cooccurrence_pmi_third_impl(spark):
    rows = [
        (r.token_a, r.token_b, r.c_ab, r.pmi)
        for r in _run(spark, "q211_cooccurrence_pmi")
    ]
    docs = _pd("documents")
    import math
    from collections import Counter

    doc_toks = [set(t.split(" ")) for t in docs["text"]]
    df = Counter(tok for toks in doc_toks for tok in toks)
    vocab = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    vset = {t for t, _ in vocab}
    cnt = dict(vocab)
    n_docs = len(doc_toks)
    c_ab = Counter()
    for toks in doc_toks:
        present = sorted(toks & vset)
        for a, b in itertools.combinations(present, 2):
            c_ab[(a, b)] += 1
    expected = sorted(
        (
            (a, b, n, float(round(math.log(n_docs * n / (cnt[a] * cnt[b])), 6)))
            for (a, b), n in c_ab.items()
        ),
        key=lambda t: (-t[3], t[0], t[1]),
    )[:100]
    got = [(a, b, n, round(p, 6)) for a, b, n, p in rows]
    assert got == expected


def test_dimension_variance_third_impl(spark):
    rows = {r.dim: r for r in _run(spark, "q219_dimension_variance")}
    import numpy as np

    emb = _pd("embeddings")
    mat = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    n = mat.shape[0]
    s = np.round(mat, 9).sum(axis=0)
    ssq = np.round(mat * mat, 9).sum(axis=0)
    var = (ssq - s * s / n) / n
    top = sorted(range(mat.shape[1]), key=lambda i: (-var[i], i + 1))[:10]
    assert set(rows) == {i + 1 for i in top}
    for i in top:
        assert abs(rows[i + 1].variance - var[i]) < 1e-9
        assert rows[i + 1].n == n


def test_pareto_coverage_third_impl(spark):
    rows = {r.c_mktsegment: r for r in _run(spark, "q227_pareto_coverage")}
    orders, cust = _pd("orders"), _pd("customer")
    seg_of = dict(zip(cust["c_custkey"], cust["c_mktsegment"]))
    from collections import defaultdict

    rev = defaultdict(lambda: defaultdict(int))
    for _, o in orders.iterrows():
        rev[seg_of[o["o_custkey"]]][int(o["o_custkey"])] += round(
            o["o_totalprice"] * 100
        )  # cents
    for seg, per_cust in rev.items():
        xs = sorted(per_cust.items(), key=lambda kv: (-kv[1], kv[0]))
        total = sum(v for _, v in xs)
        cum = 0
        for k, (_, v) in enumerate(xs, start=1):
            cum += v
            if 5 * cum >= 4 * total:
                break
        r = rows[seg]
        assert r.n_customers == len(xs)
        assert r.k_for_80pct == k
        assert abs(r.top_share - k / len(xs)) < 1e-15


def test_association_lift_third_impl(spark):
    rows = [
        (r.part_a, r.part_b, r.c_ab, r.c_a, r.c_b)
        for r in _run(spark, "q230_association_lift")
    ]
    li = _pd("lineitem")
    from collections import Counter

    baskets = {}
    for o, p in set(zip(li["l_orderkey"], li["l_partkey"])):
        baskets.setdefault(o, set()).add(p)
    bounded = {o: it for o, it in baskets.items() if len(it) <= MAX_BASKET}
    item = Counter(p for it in bounded.values() for p in it)
    pair = Counter()
    for it in bounded.values():
        for a, b in itertools.combinations(sorted(it), 2):
            pair[(a, b)] += 1
    n = len(bounded)
    scored = [
        (a, b, c, item[a], item[b], n * c / (item[a] * item[b]))
        for (a, b), c in pair.items()
        if c >= 2
    ]
    expected = [
        t[:5] for t in sorted(scored, key=lambda t: (-t[5], t[0], t[1]))[:100]
    ]
    assert rows == expected


def test_semiadditive_eod_third_impl(spark):
    rows = {r.day_idx: r for r in _run(spark, "q234_semiadditive_eod")}
    import pandas as pd

    ev = _pd("events")
    ev = ev.assign(d=(ev["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days)
    from collections import defaultdict

    last = {}
    for _, e in ev.iterrows():
        key = (int(e["user_id"]), int(e["d"]))
        stamp = (e["ts"], int(e["event_id"]))
        if key not in last or stamp > last[key][0]:
            last[key] = (stamp, round(float(e["value"]), 6))
    per_day = defaultdict(list)
    for (_, d), (_, v) in last.items():
        per_day[d].append(v)
    for d, vals in per_day.items():
        r = rows[d]
        assert r.n_users == len(vals)
        # decimal(18,6) exact sum == sum of round(.,6) floats within fp eps
        assert abs(r.eod_total - sum(vals)) < 1e-6


def test_pair_counts_property(spark):
    """Derandomized hypothesis sweep: bounded_baskets + pair_counts must
    match the itertools reference for arbitrary basket shapes, including
    baskets exactly at, below, and above the cap."""
    import os

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from kinesis_sample_spark.queries.graph import bounded_baskets, pair_counts

    edges_strategy = st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 40)),
        min_size=1,
        max_size=120,
    )

    @settings(
        max_examples=int(os.environ.get("SPARK_GRAFT_PROPERTY_EXAMPLES", "8")),
        derandomize=True,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(edges=edges_strategy, cap=st.integers(1, 12))
    def prop(edges, cap):
        df = spark.createDataFrame(
            list(set(edges)), "l_orderkey int, l_partkey int"
        )
        got = {
            (r.part_a, r.part_b): r.n_orders
            for r in pair_counts(
                bounded_baskets(df, "l_orderkey", cap), "l_orderkey", "l_partkey"
            ).collect()
        }
        assert got == dict(_brute_pairs(edges, cap))

    prop()


def _ntile(keys, k=5):
    """Standard SQL ntile: first (n % k) buckets get one extra row.
    ``keys`` is the fully tie-broken sort order."""
    n = len(keys)
    base, extra = divmod(n, k)
    out, i = {}, 0
    for b in range(1, k + 1):
        size = base + (1 if b <= extra else 0)
        for key in keys[i : i + size]:
            out[key] = b
        i += size
    return out


def test_rfm_segmentation_third_impl(spark):
    rows = {(r.r_q, r.f_q, r.m_q): r for r in _run(spark, "q229_rfm_segmentation")}
    orders = _pd("orders")
    from collections import Counter, defaultdict

    last, freq, monet = {}, Counter(), defaultdict(int)
    for _, o in orders.iterrows():
        c = int(o["o_custkey"])
        freq[c] += 1
        monet[c] += round(o["o_totalprice"] * 100)  # cents
        if c not in last or o["o_orderdate"] > last[c]:
            last[c] = o["o_orderdate"]
    maxd = max(last.values())
    rec = {c: (maxd - d).days for c, d in last.items()}
    custs = list(freq)
    r_q = _ntile(sorted(custs, key=lambda c: (rec[c], c)))
    f_q = _ntile(sorted(custs, key=lambda c: (-freq[c], c)))
    m_q = _ntile(sorted(custs, key=lambda c: (-monet[c], c)))
    cells = defaultdict(lambda: [0, 0])
    for c in custs:
        cell = cells[(r_q[c], f_q[c], m_q[c])]
        cell[0] += 1
        cell[1] += monet[c]
    assert set(rows) == set(cells)
    for cell, (n, cents) in cells.items():
        assert rows[cell].n_customers == n
        assert abs(rows[cell].total_monetary - cents / 100.0) < 1e-6


def test_hhi_third_impl(spark):
    rows = {r.n_name: r for r in _run(spark, "q214_hhi_concentration")}
    li, supp, nation = _pd("lineitem"), _pd("supplier"), _pd("nation")
    nation_of = dict(zip(supp["s_suppkey"], supp["s_nationkey"]))
    name_of = dict(zip(nation["n_nationkey"], nation["n_name"]))
    from collections import defaultdict

    rev = defaultdict(lambda: defaultdict(int))
    for _, l in li.iterrows():
        nk = nation_of[l["l_suppkey"]]
        rev[nk][int(l["l_suppkey"])] += round(l["l_extendedprice"] * 100)  # cents
    for nk, per_supp in rev.items():
        total = sum(per_supp.values())
        hhi = sum(v * v for v in per_supp.values()) / (total * total)
        r = rows[name_of[nk]]
        assert r.n_suppliers == len(per_supp)
        assert abs(r.hhi - hhi) < 1e-12


def test_rank_fusion_third_impl(spark):
    rows = [(r.doc_id, r.rank_chars, r.rank_vocab) for r in _run(spark, "q226_rank_fusion")]
    docs = _pd("documents")
    recs = [
        (int(d["doc_id"]), int(d["n_chars"]), len(set(d["text"].split(" "))))
        for _, d in docs.iterrows()
    ]
    ra = {doc: i + 1 for i, (doc, _, _) in enumerate(sorted(recs, key=lambda t: (-t[1], t[0])))}
    rb = {doc: i + 1 for i, (doc, _, _) in enumerate(sorted(recs, key=lambda t: (-t[2], t[0])))}
    fused = sorted(
        (
            (round(1.0 / (60 + ra[doc]), 6) + round(1.0 / (60 + rb[doc]), 6), doc)
            for doc, _, _ in recs
        ),
        key=lambda t: (-t[0], t[1]),
    )[:50]
    assert rows == [(doc, ra[doc], rb[doc]) for _, doc in fused]


def test_percent_of_parent_third_impl(spark):
    rows = {(r.r_name, r.n_name): r for r in _run(spark, "q231_percent_of_parent")}
    li, supp = _pd("lineitem"), _pd("supplier")
    nation, region = _pd("nation"), _pd("region")
    nk_of = dict(zip(supp["s_suppkey"], supp["s_nationkey"]))
    nname = dict(zip(nation["n_nationkey"], nation["n_name"]))
    rkey = dict(zip(nation["n_nationkey"], nation["n_regionkey"]))
    rname = dict(zip(region["r_regionkey"], region["r_name"]))
    from collections import defaultdict

    # exact cents * (10000 - discount-bps) integer arithmetic mirrors the
    # DECIMAL(12,2)*(1-DECIMAL(6,4)) product: units of 1e-6 currency
    rev = defaultdict(int)
    for _, l in li.iterrows():
        nk = nk_of[l["l_suppkey"]]
        cents = round(l["l_extendedprice"] * 100)
        bps = round(l["l_discount"] * 10000)
        rev[(rname[rkey[nk]], nname[nk])] += cents * (10000 - bps)
    grand = sum(rev.values())
    region_tot = defaultdict(int)
    for (rn, _), v in rev.items():
        region_tot[rn] += v
    for key, v in rev.items():
        r = rows[key]
        assert abs(r.revenue - v / 1e6) < 1e-6 * max(1.0, v / 1e6)
        assert abs(r.share_of_region - v / region_tot[key[0]]) < 1e-12
        assert abs(r.share_of_total - v / grand) < 1e-12


def test_nested_semi_chain_third_impl(spark):
    rows = [(r.s_name, r.n_name) for r in _run(spark, "q207_nested_semi_chain")]
    li, part, supp = _pd("lineitem"), _pd("part"), _pd("supplier")
    nation = _pd("nation")
    red = set(part[part["p_name"].str.startswith("red ")]["p_partkey"])
    from collections import defaultdict

    qty = defaultdict(float)
    for _, l in li.iterrows():
        if l["l_partkey"] in red:
            qty[(int(l["l_suppkey"]), int(l["l_partkey"]))] += l["l_quantity"]
    movers = {s for (s, _), q in qty.items() if q > 90}
    nname = dict(zip(nation["n_nationkey"], nation["n_name"]))
    expected = sorted(
        (s["s_name"], nname[s["s_nationkey"]])
        for _, s in supp.iterrows()
        if s["s_suppkey"] in movers
    )
    assert rows == expected


def test_ohlc_third_impl(spark):
    rows = {r.day_idx: r for r in _run(spark, "q235_ohlc_bars")}
    import pandas as pd

    ev = _pd("events")
    ev = ev.assign(d=(ev["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days)
    for d, g in ev.groupby("d"):
        ordered = sorted(zip(g["ts"], g["event_id"], g["value"]))
        r = rows[d]
        assert r.n_events == len(ordered)
        assert r.open == round(ordered[0][2], 6)
        assert r.close == round(ordered[-1][2], 6)
        assert r.high == round(max(g["value"]), 6)
        assert r.low == round(min(g["value"]), 6)


def test_new_vs_returning_third_impl(spark):
    rows = {r.day_idx: r for r in _run(spark, "q236_new_vs_returning")}
    import pandas as pd
    from collections import defaultdict

    ev = _pd("events")
    ev = ev.assign(d=(ev["ts"].dt.normalize() - pd.Timestamp("1970-01-01")).dt.days)
    ud = set(zip(ev["user_id"], ev["d"]))
    first = {}
    for u, d in ud:
        if u not in first or d < first[u]:
            first[u] = d
    per_day = defaultdict(lambda: [0, 0])
    for u, d in ud:
        per_day[d][0 if d == first[u] else 1] += 1
    for d, (new, ret) in per_day.items():
        r = rows[d]
        assert r.new_users == new
        assert r.returning_users == ret
        assert r.active_users == new + ret
    assert sum(v[0] for v in per_day.values()) == len(first)


def test_join_cardinality_third_impl(spark):
    rows = {r.edge: r for r in _run(spark, "q238_join_cardinality_audit")}
    li, orders = _pd("lineitem"), _pd("orders")
    part, cust = _pd("part"), _pd("customer")
    cases = {
        "lineitem->orders": (li["l_orderkey"], orders["o_orderkey"]),
        "lineitem->part": (li["l_partkey"], part["p_partkey"]),
        "orders->customer": (orders["o_custkey"], cust["c_custkey"]),
    }
    from collections import Counter

    for edge, (ck, pk) in cases.items():
        cc, pc = Counter(ck), Counter(pk)
        actual = sum(cc[k] * pc[k] for k in cc)
        r = rows[edge]
        assert r.n_child == len(ck) and r.n_parent == len(pk)
        assert r.ndv_child == len(cc) and r.ndv_parent == len(pc)
        assert r.actual_rows == actual
        est = len(ck) * len(pk) / max(len(cc), len(pc))
        assert abs(r.est_rows - est) < 1e-9 * est


def test_session_conversion_third_impl(spark):
    rows = {r.entry_type: r for r in _run(spark, "q239_session_conversion")}
    ev = _pd("events")
    gap = 30 * 60 * 1_000_000
    from collections import defaultdict

    per_entry = defaultdict(lambda: [0, 0])
    for _, g in ev.groupby("user_id"):
        seq = sorted(zip(g["ts"], g["event_id"], g["event_type"]))
        us = [int(t.value) // 1000 for t, _, _ in seq]
        sessions = []
        for i, (u, row) in enumerate(zip(us, seq)):
            if i == 0 or u - us[i - 1] > gap:
                sessions.append([row])
            else:
                sessions[-1].append(row)
        for sess in sessions:
            entry = sess[0][2]
            per_entry[entry][0] += 1
            per_entry[entry][1] += int(any(t == "purchase" for _, _, t in sess))
    assert set(rows) == set(per_entry)
    for entry, (n, conv) in per_entry.items():
        r = rows[entry]
        assert r.n_sessions == n and r.n_converted == conv
        assert abs(r.conversion_rate - conv / n) < 1e-15


def test_mix_shift_third_impl(spark):
    rows = {r.year: r for r in _run(spark, "q240_mix_shift")}
    orders = _pd("orders")
    from collections import Counter, defaultdict

    grid = Counter(zip(orders["o_orderdate"].dt.year, orders["o_orderpriority"]))
    years = sorted({y for y, _ in grid})
    prios = sorted({p for _, p in grid})
    shares = {
        y: {p: grid[(y, p)] / sum(grid[(y, q)] for q in prios) for p in prios}
        for y in years
    }
    for prev, y in zip(years, years[1:]):
        l1 = sum(round(abs(shares[y][p] - shares[prev][p]), 6) for p in prios)
        r = rows[y]
        assert abs(r.l1_mix_shift - l1) < 1e-9
        assert r.n_orders == sum(grid[(y, p)] for p in prios)
