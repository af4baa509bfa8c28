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
