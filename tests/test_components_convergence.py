"""connected_components adversarial guards: long chains (the silent
under-merge cliff the pre-r09 implementation had) and random graphs vs a
Python union-find third implementation.
"""

from __future__ import annotations

import random

import pytest

from kinesis_sample_spark.operators.components import connected_components


def _uf_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min node id per component, only for nodes that appear in edges
    touched = sorted({x for e in edges for x in e})
    comp_min = {}
    for x in touched:
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    return {x: comp_min[find(x)] for x in touched}


def test_long_path_converges_within_default_cap(spark):
    """A 200-node path has diameter 199 — far beyond 20 neighbor-
    propagation rounds. Pointer jumping must converge it to ONE
    component under the default cap (the old implementation returned
    under-merged clusters here, silently)."""
    edges = [(i, i + 1) for i in range(199)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r.node: r.component for r in connected_components(df, "a", "b").collect()
    }
    assert set(got.values()) == {0}
    assert len(got) == 200


def test_random_graphs_match_union_find(spark):
    """Sparse random graphs (mixed chains, stars, isolated pairs) must
    match a Python union-find exactly — labels are the component-min
    node ids."""
    rng = random.Random(29)
    for trial in range(3):
        n = 120
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randint(30, 90))
        ]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "a long, b long")
        got = {
            r.node: r.component
            for r in connected_components(df, "a", "b").collect()
        }
        assert got == _uf_components(n, edges), f"trial {trial}"


def test_nonconvergence_raises_instead_of_undermerging(spark):
    """Exhausting the round cap must raise, never return a partial
    clustering."""
    edges = [(i, i + 1) for i in range(60)]
    df = spark.createDataFrame(edges, "a long, b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, "a", "b", max_iter=2)
