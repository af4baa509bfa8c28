"""operators/pagerank.py vs a serial pure-Python replica.

The operator's whole claim is engine-portability: integer ranks must be
bit-identical whether summed by 32 Spark tasks or one Python loop. The
replica below is written independently of the SQL oracle (dict-based,
serial), so q125's three-way agreement (Spark ⇔ DuckDB ⇔ Python) pins
the recurrence itself, not a shared bug.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_sample_spark.operators.pagerank import (
    DAMP_DEN,
    DAMP_NUM,
    RANK_BASE,
    RANK_SCALE,
    pagerank_int,
)


def _serial_pagerank(edges: list[tuple[int, int]], iterations: int) -> dict[int, int]:
    und = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    adj: dict[int, list[int]] = {}
    for u, v in und:
        adj.setdefault(u, []).append(v)
    ranks = {u: RANK_SCALE for u in adj}
    for _ in range(iterations):
        sums = {u: 0 for u in adj}
        for u, nbrs in adj.items():
            c = ranks[u] // len(nbrs)
            for v in nbrs:
                sums[v] += c
        ranks = {u: RANK_BASE + (s * DAMP_NUM) // DAMP_DEN for u, s in sums.items()}
    return ranks


def test_pagerank_matches_serial_replica(spark):
    # path + triangle + a hub: mixed degrees, two components
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10), (1, 5), (1, 6), (1, 7)]
    df = spark.createDataFrame(edges, "a: long, b: long")
    got = {r["node"]: r["rank"] for r in pagerank_int(df, "a", "b", iterations=4).collect()}
    want = _serial_pagerank(edges, 4)
    assert got == want


def test_pagerank_total_mass_bounded(spark):
    # floor-division only loses mass, never creates it: total rank stays
    # within (base·n, scale·n].
    edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
    df = spark.createDataFrame(edges, "a: long, b: long")
    ranks = pagerank_int(df, "a", "b", iterations=3)
    total = ranks.agg(F.sum("rank")).collect()[0][0]
    n = ranks.count()
    assert RANK_BASE * n < total <= RANK_SCALE * n


def test_pagerank_random_graphs_match_replica(spark):
    """Property check on adversarial small graphs (self-contained random
    generator, fixed seeds): stars, chains, cliques and random mixtures
    must all match the serial integer replica exactly."""
    import random

    for seed in (7, 21, 99):
        rng = random.Random(seed)
        n = rng.randint(5, 18)
        edges = {(rng.randint(1, n), rng.randint(1, n)) for _ in range(n * 2)}
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        df = spark.createDataFrame(edges, "a: long, b: long")
        got = {
            r["node"]: r["rank"]
            for r in pagerank_int(df, "a", "b", iterations=3).collect()
        }
        assert got == _serial_pagerank(edges, 3), f"seed {seed}"
