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


def test_dyadic_quantization_agrees_with_duckdb(spark):
    """The round-3 advisor's trap, pinned as a regression test: a dyadic
    double like 1/1024 = 0.0009765625 ends exactly in '5' at the 10th
    decimal, where an engine-internal double→DECIMAL(18,9) cast could
    round half-up vs half-even and silently flip a centroid bit. The
    operators now round(.., 9) explicitly BEFORE the decimal cast on both
    sides — this test runs the exact mean pipeline both engines use over
    adversarial dyadic values and requires bit-identical doubles."""
    import duckdb

    from pyspark.sql import functions as F

    # dyadic values whose 10th decimal digit is exactly 5, both signs,
    # plus a couple of non-boundary controls
    vals = [
        1 / 1024,          # 0.0009765625
        -1 / 1024,
        3 / 2048,          # 0.00146484375
        5 / 4096,          # 0.001220703125
        -7 / 8192,
        0.123456789,
        -0.5,
    ]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, val double")
    spark_means = (
        df.groupBy((F.col("i") % 2).alias("g"))
        .agg(
            (
                F.sum(F.round(F.col("val").cast("double"), 9).cast("decimal(18,9)"))
                .cast("double")
                / F.count("val")
            ).alias("mean")
        )
        .orderBy("g")
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INTEGER, val DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(i, v) for i, v in enumerate(vals)])
    duck_means = con.execute(
        """
        SELECT i % 2 AS g,
               CAST(CAST(SUM(CAST(round(val, 9) AS DECIMAL(18,9))) AS VARCHAR) AS DOUBLE)
                 / COUNT(val) AS mean
        FROM t GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    assert [(r["g"], r["mean"]) for r in spark_means] == duck_means
    # and the single-value quantization itself is identical per input
    per_spark = [
        r["q"]
        for r in df.select(
            F.round(F.col("val"), 9).cast("decimal(18,9)").cast("string").alias("q")
        )
        .orderBy("i")
        .collect()
    ]
    per_duck = [
        r[0]
        for r in con.execute(
            "SELECT CAST(CAST(round(val, 9) AS DECIMAL(18,9)) AS VARCHAR) FROM t ORDER BY i"
        ).fetchall()
    ]
    assert [float(a) for a in per_spark] == [float(b) for b in per_duck]
