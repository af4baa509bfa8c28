"""Distributed Lloyd's k-means over an embedding column.

The iterative-algorithm pattern on Spark: per iteration, (1) broadcast the
k×d centroid literals, (2) assign each vector to its nearest centroid —
map-only, (3) recompute per-(cluster, dim) means with one keyed shuffle,
(4) collect only the k×d centroid matrix back to the driver. Data never
collects; driver state is O(k·d) regardless of corpus size. This is the
index-build step q37 stubs with label means when no labels exist
(SURVEY.md §2 LLM-pipeline extensions: similarity-search scale path).

Determinism: init = the k lowest-id vectors (``init="first"``) or the k
vectors with the smallest md5-derived id hash (``init="spread"`` — a
deterministic uniform sample; see below); assignment tie-break = lowest
cluster id; means accumulate in DECIMAL(18,9) (exact, associative) and
surface as doubles — so the fitted centroids are bit-identical under ANY
partitioning (32 threads, 1000 executors, or a serial SQL engine), which
is what lets q38 carry a full value-hash oracle (the 3-iteration fit
unrolled in DuckDB SQL) instead of a rows-only check. The 1e-9
quantization is far below float32 input precision; the unit test still
checks against a float64 NumPy reference within tolerance.

Why ``spread`` matters at 100 TB: row ids are almost always correlated
with ingest order, so the k lowest ids typically live in one file /
one time range / one tenant — seeding all centroids inside a single
dense region and wasting early iterations. Ordering by a hash of the id
instead draws the k seeds uniformly from the whole corpus, and costs the
same as ``first``: both are a TakeOrdered (per-partition heap of size k,
merged on the driver) — never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_sample_spark.functions.hashing import md5_long


def _sq_dist(vec_col, centroid_lit):
    """squared L2 via the fold: |v|² - 2 v·c + |c|² without materializing
    the difference vector (the |v|² term is rank-invariant but kept so the
    value is a real distance for callers that read it)."""
    diff = F.zip_with(
        vec_col, centroid_lit, lambda x, y: x.cast("double") - y.cast("double")
    )
    return F.aggregate(diff, F.lit(0.0), lambda acc, d: acc + d * d)


def kmeans_fit(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    n_iter: int = 5,
    init: str = "first",
) -> tuple[list[list[float]], DataFrame]:
    """Run ``n_iter`` Lloyd iterations; returns (centroids, assignments).

    ``centroids``: k lists of doubles (driver-side, tiny).
    ``assignments``: DataFrame (id_col, cluster) — lazily recomputable.
    ``init``: ``"first"`` = k lowest ids; ``"spread"`` = k smallest
    md5(id) — a deterministic uniform sample of seed points.
    """
    if init == "spread":
        seed_order = [md5_long(F.col(id_col).cast("string")), F.col(id_col)]
    elif init == "first":
        seed_order = [F.col(id_col)]
    else:
        raise ValueError(f"unknown init {init!r}; use 'first' or 'spread'")
    init_rows = (
        emb.select(id_col, vec_col).orderBy(*seed_order).limit(k).collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in init_rows]

    for _ in range(n_iter):
        assigned = _assign(emb, id_col, vec_col, centroids)
        # recompute means: explode to (cluster, dim) — one keyed shuffle
        new_rows = (
            assigned.join(emb, id_col)
            .select("cluster", F.posexplode(vec_col).alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(
                (
                    # round(.., 9) BEFORE the decimal cast: the bare
                    # double→decimal cast's rounding mode is
                    # engine-internal — a dyadic value ending exactly in
                    # '5' at the 10th decimal (e.g. 1/1024) could
                    # otherwise quantize differently per engine. The
                    # explicit round removes that cast ambiguity; Spark
                    # (BigDecimal.valueOf, HALF_UP on the shortest repr)
                    # and DuckDB (double-arithmetic round) still differ
                    # internally, so cross-engine agreement is empirical —
                    # verified by test_dyadic_quantization_agrees_with_duckdb
                    # — not provable for all doubles.
                    F.sum(F.round(F.col("val").cast("double"), 9).cast("decimal(18,9)"))
                    .cast("double")
                    / F.count("val")
                ).alias("mean")
            )
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mean"))),
                    lambda s: s.getField("mean"),
                ).alias("cvec")
            )
            .collect()
        )
        by_cluster = {r["cluster"]: [float(x) for x in r["cvec"]] for r in new_rows}
        # empty clusters keep their previous centroid
        centroids = [by_cluster.get(c, centroids[c]) for c in range(k)]

    return centroids, _assign(emb, id_col, vec_col, centroids)


def _assign(emb: DataFrame, id_col: str, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    dists = [
        _sq_dist(F.col(vec_col), F.array(*[F.lit(x) for x in c])).alias(f"d{i}")
        for i, c in enumerate(centroids)
    ]
    with_d = emb.select(id_col, vec_col, *dists)
    cluster = F.lit(0)
    best = F.col("d0")
    for i in range(1, len(centroids)):
        is_better = F.col(f"d{i}") < best
        cluster = F.when(is_better, F.lit(i)).otherwise(cluster)
        best = F.when(is_better, F.col(f"d{i}")).otherwise(best)
    return with_d.select(id_col, cluster.alias("cluster"))
