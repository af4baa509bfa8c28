"""kmeans_fit vs a NumPy reference implementation of the identical
algorithm (same init, same tie-break) on the real embeddings fixture."""

from __future__ import annotations

import numpy as np
import pytest

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.operators.kmeans import kmeans_fit

SF = "/root/testdata/sf0.001"
K = 4
N_ITER = 3


def _numpy_kmeans(vecs: np.ndarray, k: int, n_iter: int) -> tuple[np.ndarray, np.ndarray]:
    centroids = vecs[:k].astype(np.float64).copy()
    for _ in range(n_iter):
        d = ((vecs[:, None, :].astype(np.float64) - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)  # argmin takes the lowest index on ties
        for c in range(k):
            members = vecs[assign == c]
            if len(members):
                centroids[c] = members.astype(np.float64).mean(axis=0)
    d = ((vecs[:, None, :].astype(np.float64) - centroids[None, :, :]) ** 2).sum(axis=2)
    return centroids, d.argmin(axis=1)


@pytest.mark.slow
def test_kmeans_matches_numpy_reference(spark):
    emb = load_table(spark, SF, "embeddings")
    rows = emb.orderBy("vec_id").collect()
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float32)

    centroids, assigned = kmeans_fit(emb, k=K, n_iter=N_ITER)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}

    ref_centroids, ref_assign = _numpy_kmeans(vecs, K, N_ITER)

    np.testing.assert_allclose(np.array(centroids), ref_centroids, rtol=1e-9, atol=1e-9)
    ids = [r["vec_id"] for r in rows]
    mismatches = sum(got[i] != ref_assign[idx] for idx, i in enumerate(ids))
    assert mismatches == 0
    # sanity: clusters are non-trivial
    assert len(set(got.values())) > 1


def _md5_60bit(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@pytest.mark.slow
def test_kmeans_spread_init_matches_numpy_reference(spark):
    """init="spread" seeds = the k vectors with the smallest md5(id) —
    replicate the hash ordering in Python (same md5-60bit convention as
    functions/hashing.py) and re-run the NumPy reference from those
    seeds; the distributed fit must agree exactly."""
    emb = load_table(spark, SF, "embeddings")
    rows = emb.orderBy("vec_id").collect()
    ids = [r["vec_id"] for r in rows]
    vecs = np.array([r["embedding"] for r in rows], dtype=np.float32)

    seed_idx = sorted(range(len(ids)), key=lambda i: (_md5_60bit(str(ids[i])), ids[i]))[:K]
    reordered = np.concatenate(
        [vecs[seed_idx], np.delete(vecs, seed_idx, axis=0)], axis=0
    )
    ref_centroids, _ = _numpy_kmeans(reordered, K, N_ITER)

    centroids, assigned = kmeans_fit(emb, k=K, n_iter=N_ITER, init="spread")
    np.testing.assert_allclose(np.array(centroids), ref_centroids, rtol=1e-9, atol=1e-9)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    assert len(set(got.values())) > 1
    # seeds from a hash-uniform draw, not the first file: seed ids spread
    assert sorted(ids[i] for i in seed_idx) != sorted(ids[:K])
