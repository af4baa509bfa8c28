"""Edge-input tests for the round-14 second/third wave — inputs the SF
fixtures cannot produce (the q212/q240 lesson: beyond-envelope bugs hide
from oracle parity because both engines share the formulation; these pin
the edges with independent math)."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------
# q314 — the Gram chunking must be exact across chunk boundaries.
# ---------------------------------------------------------------------------
def test_q314_gram_partials_chunking_exact():
    """Feed the partial generator one batch LARGER than _PC1_CHUNK: the
    merged partials must equal the single-shot numpy Gram exactly (the
    chunk split exists only to bound int64 sums — it must not change a
    single cell), and column sums / row count must ride along."""
    from kinesis_sample_spark.queries.robuststats import (
        _PC1_CHUNK,
        _pc1_gram_partials,
    )

    rng = np.random.RandomState(7)
    n = _PC1_CHUNK + 1234  # forces two chunks in one Arrow batch
    d = 8
    x = rng.randint(-10_000_000, 10_000_000, size=(n, d)).astype(np.int64)
    pdf = pd.DataFrame({"xl": [row.tolist() for row in x]})
    merged = {}
    count = 0
    colsums = np.zeros(d, dtype=np.int64)
    for out in _pc1_gram_partials(iter([pdf])):
        for i, j, s in out.itertuples(index=False):
            if i == 0 and j == 0:
                count += s
            elif i == 0:
                colsums[j - 1] += s
            else:
                merged[(i, j)] = merged.get((i, j), 0) + int(s)
    want = x.T.astype(object) @ x.astype(object)  # exact bigint matmul
    assert count == n
    assert colsums.tolist() == x.sum(axis=0).tolist()
    for i in range(d):
        for j in range(d):
            assert merged[(i + 1, j + 1)] == int(want[i, j])


# ---------------------------------------------------------------------------
# q321 — the Allen CASE must be exhaustive and match the independent
# Python mirror on EVERY ordering of 4 endpoints, degenerate points
# included (the fixture only exercises 7 of 13 relations).
# ---------------------------------------------------------------------------
def test_q321_allen_case_exhaustive(spark):
    from tests.test_round14b_ops import _allen

    from kinesis_sample_spark.queries.temporal import _ALLEN_CASE

    cases = [
        (a_s, a_e, b_s, b_e)
        for a_s, a_e, b_s, b_e in itertools.product(range(4), repeat=4)
        if a_s <= a_e and b_s <= b_e
    ]
    df = spark.createDataFrame(cases, ["a_start", "a_end", "b_start", "b_end"])
    from pyspark.sql import functions as F

    rows = df.select(
        "a_start", "a_end", "b_start", "b_end", F.expr(_ALLEN_CASE).alias("rel")
    ).collect()
    seen = set()
    for r in rows:
        want = _allen(r.a_start, r.a_end, r.b_start, r.b_end)
        assert r.rel == want, (r, want)
        assert r.rel != "other"
        seen.add(r.rel)
    # all 13 relations are reachable in the enumeration
    assert len(seen) == 13
