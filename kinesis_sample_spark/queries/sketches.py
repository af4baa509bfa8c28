"""Mergeable histogram quantile sketch over lineitem prices.

The scale story for quantiles at 100 TB is a *mergeable sketch*: each task
summarizes its partition into O(bins) counters, the counters merge
associatively (map-side partial aggregation — Catalyst's partial/final
hash aggregate IS the merge), and quantiles interpolate from the merged
histogram. Spark's built-in ``approx_percentile`` (already gated by q48)
hides the sketch; this operator exposes one whose every intermediate is
ENGINE-EXACT — integer bin counts plus deterministic double interpolation
— so the whole partial→merge→finalize pipeline sits under the value-hash
gate rather than behind an error bound.

Fixed-width histograms trade adaptivity for exact mergeability (KLL/TDigest
trade the opposite way); two passes (exact min/max, then binning) buy a
deterministic bin function at any cluster size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.queries import query

_BINS = 128
_PS = (0.25, 0.5, 0.9, 0.99)


@query(
    "q159_histogram_quantiles",
    oracle=f"""
WITH mm AS (
  SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx,
         count(*) AS n,
         (max(l_extendedprice) - min(l_extendedprice)) / {_BINS} AS width
  FROM lineitem
),
binned AS (
  SELECT least({_BINS - 1},
               CAST(FLOOR((l_extendedprice - mm.mn) / mm.width) AS BIGINT)) AS bin,
         count(*) AS cnt
  FROM lineitem, mm GROUP BY 1
),
cum AS (
  SELECT bin, cnt,
         SUM(cnt) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - cnt AS cum_before
  FROM binned
),
ps AS (SELECT CAST(unnest([{", ".join(str(p) for p in _PS)}]) AS DOUBLE) AS p),
tgt AS (
  SELECT ps.p, CAST(CEIL(ps.p * mm.n) AS BIGINT) AS rank_target FROM ps, mm
),
hit AS (
  SELECT t.p, t.rank_target, min(c.bin) AS bin_idx
  FROM tgt t JOIN cum c
    ON CAST(c.cum_before + c.cnt AS BIGINT) >= t.rank_target
  GROUP BY t.p, t.rank_target
)
SELECT h.p, h.rank_target, h.bin_idx,
       round(mm.mn + mm.width *
             (h.bin_idx + (h.rank_target - c.cum_before) * 1.0 / c.cnt), 6)
         AS approx_q
FROM hit h
JOIN cum c ON c.bin = h.bin_idx, mm
ORDER BY h.p
""",
)
def q159_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass histogram quantiles: (1) exact min/max/count (one tiny
    scalar aggregate, broadcast back); (2) integer bin counts — the
    mergeable sketch, built by partial+final hash aggregation so every
    executor contributes O(bins) rows to the shuffle regardless of data
    size; (3) driver-free finalize: cumulative counts over the ≤128-row
    histogram relation and linear interpolation inside the hit bin. Every
    count is an exact integer and the interpolation arithmetic is a fixed
    expression over identical doubles, so the sketch is bit-reproducible
    on 32 threads, 1000 executors, or DuckDB's serial scan."""
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    mm = li.agg(
        F.min("l_extendedprice").alias("mn"),
        F.max("l_extendedprice").alias("mx"),
        F.count("*").alias("n"),
        ((F.max("l_extendedprice") - F.min("l_extendedprice")) / _BINS).alias(
            "width"
        ),
    )
    binned = (
        li.crossJoin(F.broadcast(mm))
        .select(
            F.least(
                F.lit(_BINS - 1),
                F.floor((F.col("l_extendedprice") - F.col("mn")) / F.col("width")),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count("*").alias("cnt"))
    )
    w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = binned.withColumn("cum_before", F.sum("cnt").over(w) - F.col("cnt"))
    ps = spark.createDataFrame([(p,) for p in _PS], "p double")
    tgt = ps.crossJoin(F.broadcast(mm)).select(
        "p", F.ceil(F.col("p") * F.col("n")).cast("bigint").alias("rank_target")
    )
    hit = (
        tgt.join(
            cum, (F.col("cum_before") + F.col("cnt")).cast("bigint") >= F.col("rank_target")
        )
        .groupBy("p", "rank_target")
        .agg(F.min("bin").alias("bin_idx"))
    )
    return (
        hit.join(cum, F.col("bin") == F.col("bin_idx"))
        .crossJoin(F.broadcast(mm))
        .select(
            "p",
            "rank_target",
            "bin_idx",
            F.round(
                F.col("mn")
                + F.col("width")
                * (
                    F.col("bin_idx")
                    + (F.col("rank_target") - F.col("cum_before")) * 1.0 / F.col("cnt")
                ),
                6,
            ).alias("approx_q"),
        )
        .orderBy("p")
    )


# ---------------------------------------------------------------------------
# q177 — HLL sketch build / merge / estimate (DataSketches surface).
# ---------------------------------------------------------------------------
@query(
    "q177_hll_sketch_merge",
    oracle="""
SELECT event_type,
       count(DISTINCT user_id) AS n_exact,
       TRUE AS merged8_within_5pct,
       TRUE AS merged3_within_5pct,
       TRUE AS direct_within_5pct,
       TRUE AS merge_paths_agree_5pct
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def q177_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-sketch laws of the DataSketches HLL surface
    (hll_sketch_agg / hll_union_agg / hll_sketch_estimate), gated as
    error-bound booleans — the guarantees the sketch actually makes:

    - bounded error on EVERY merge path: the direct sketch, an 8-way
      bucketed union, and a 3-way bucketed union must each estimate
      within 5% of the exact distinct count (lgConfigK=12 default ⇒
      ~1.6% rse; 5% ≈ 3σ), and the two union paths must agree with each
      other to the same tolerance — the property that makes
      pre-aggregated sketch columns in a 100 TB rollup table sound.

    Estimate EQUALITY across paths is deliberately not gated: it is not
    a law. Spark's sketch aggregate merges per-partition partial
    sketches through the HLL_4/HLL_8 gadget, whose dense-mode estimate
    depends on the merge structure — at sf0.1 the same 1500-distinct id
    set yields 1480-1500 depending on which rows shared a partition
    (sparse mode masked this at sf0.01, where insertion is exact; found
    by the round-6 sf0.1 parity sweep). Hashing an estimate, or an
    equality between two estimates, would make the result depend on
    file layout and shuffle partitioning. The bounds hold at ~3 sigma
    regardless of layout.

    The oracle computes the exact side and pins the four law-booleans
    to TRUE — same pattern as q61's error-bound gate: the approximation
    itself is checked, not reproduced. Shape: aggregation passes that
    shuffle only sketch bytes (fixed KB per group), never rows."""
    from kinesis_sample_spark.catalog import register_views

    register_views(spark, sf_dir, "events")
    return spark.sql(
        """
WITH per_b8 AS (
  SELECT event_type, user_id % 8 AS b, hll_sketch_agg(user_id) AS sk
  FROM events GROUP BY 1, 2
),
per_b3 AS (
  SELECT event_type, user_id % 3 AS b, hll_sketch_agg(user_id) AS sk
  FROM events GROUP BY 1, 2
),
m8 AS (
  SELECT event_type, hll_sketch_estimate(hll_union_agg(sk)) AS est8
  FROM per_b8 GROUP BY 1
),
m3 AS (
  SELECT event_type, hll_sketch_estimate(hll_union_agg(sk)) AS est3
  FROM per_b3 GROUP BY 1
),
direct AS (
  SELECT event_type, hll_sketch_estimate(hll_sketch_agg(user_id)) AS est_direct,
         count(DISTINCT user_id) AS n_exact
  FROM events GROUP BY 1
)
SELECT d.event_type, d.n_exact,
       abs(m8.est8 - d.n_exact) <= 0.05 * d.n_exact AS merged8_within_5pct,
       abs(m3.est3 - d.n_exact) <= 0.05 * d.n_exact AS merged3_within_5pct,
       abs(d.est_direct - d.n_exact) <= 0.05 * d.n_exact AS direct_within_5pct,
       abs(m8.est8 - m3.est3) <= 0.05 * d.n_exact AS merge_paths_agree_5pct
FROM direct d JOIN m8 USING (event_type) JOIN m3 USING (event_type)
ORDER BY d.event_type
"""
    )


# ---------------------------------------------------------------------------
# q183 — bitmap-aggregate exact distinct counting.
# ---------------------------------------------------------------------------
@query(
    "q183_bitmap_distinct",
    oracle="""
SELECT event_type,
       count(DISTINCT user_id) AS n_distinct_bitmap,
       count(DISTINCT user_id) AS n_exact
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def q183_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct counting via Spark's bitmap aggregates
    (bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg /
    bitmap_count): ids bucket into fixed-width bitmaps, per-bucket bitmaps
    OR-merge associatively, and the summed popcount is EXACT — the
    pre-aggregable distinct-count structure warehouses materialize in
    rollup tables where approx sketches (q177) aren't acceptable and
    COUNT(DISTINCT) can't pre-aggregate. The oracle's exact distinct must
    equal the bitmap path bit-for-bit, emitted twice so the hash compares
    the two columns independently. Shuffle volume: one bitmap (≤4KB) per
    (group, bucket), never the id stream."""
    from kinesis_sample_spark.catalog import register_views

    register_views(spark, sf_dir, "events")
    return spark.sql(
        """
WITH per_bucket AS (
  SELECT event_type, bitmap_bucket_number(user_id) AS bucket,
         bitmap_construct_agg(bitmap_bit_position(user_id)) AS bm
  FROM events GROUP BY 1, 2
),
via_bitmap AS (
  SELECT event_type, CAST(SUM(bitmap_count(bm)) AS BIGINT) AS n_distinct_bitmap
  FROM per_bucket GROUP BY 1
),
exact AS (
  SELECT event_type, count(DISTINCT user_id) AS n_exact
  FROM events GROUP BY 1
)
SELECT b.event_type, b.n_distinct_bitmap, e.n_exact
FROM via_bitmap b JOIN exact e USING (event_type)
ORDER BY b.event_type
"""
    )
