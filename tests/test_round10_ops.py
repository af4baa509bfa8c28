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
