"""Window-frame and higher-order-function galleries.

Two surface-completeness queries: q155 exercises every window function and
frame clause not already load-bearing elsewhere in the registry
(nth_value, percent_rank, cume_dist, ntile, lead-with-default, lag offset,
IGNORE NULLS first_value, a CURRENT ROW → UNBOUNDED FOLLOWING frame);
q156 exercises the array higher-order functions (transform / exists /
forall / aggregate / zip_with / slice) as *outputs* rather than internal
plumbing. Both are map-only plus one window exchange — nothing here
shuffles more than the window partitioning itself, at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.queries import query

# ---------------------------------------------------------------------------
# q155 — window-function frame gallery over orders.
# ---------------------------------------------------------------------------


@query(
    "q155_window_frame_gallery",
    oracle="""
WITH o AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS closed_price
  FROM orders
)
SELECT o_custkey, o_orderkey,
       lead(o_totalprice, 1, -1.0) OVER w AS next_price,
       lag(o_totalprice, 2) OVER w AS prev2_price,
       nth_value(o_totalprice, 2) OVER w AS second_price,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       ntile(4) OVER w AS quartile,
       first_value(closed_price IGNORE NULLS) OVER w AS first_closed,
       last_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
         AS final_price
FROM o
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
ORDER BY o_custkey, o_orderkey
""",
)
def q155_window_frame_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions that no other registry query gates: offset
    functions with explicit defaults, nth_value (default frame: RANGE
    UNBOUNDED PRECEDING → CURRENT ROW, identical in DuckDB; o_orderkey is
    unique so RANGE ≡ ROWS), the rank-family ratios percent_rank /
    cume_dist (exact rationals of identical integers), ntile buckets, an
    IGNORE NULLS first_value, and a forward-looking frame. One exchange on
    o_custkey serves every function — Catalyst collapses all nine into a
    single Window operator over one sort."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.when(F.col("o_orderstatus") == "O", None)
        .otherwise(F.col("o_totalprice"))
        .alias("closed_price"),
    )
    w = W.partitionBy("o_custkey").orderBy("o_orderkey")
    w_range = w.rangeBetween(W.unboundedPreceding, W.currentRow)
    w_fwd = w.rowsBetween(W.currentRow, W.unboundedFollowing)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.lead("o_totalprice", 1, -1.0).over(w).alias("next_price"),
            F.lag("o_totalprice", 2).over(w).alias("prev2_price"),
            F.nth_value("o_totalprice", 2).over(w_range).alias("second_price"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.ntile(4).over(w).alias("quartile"),
            F.first("closed_price", ignorenulls=True).over(w_range).alias(
                "first_closed"
            ),
            F.last("o_totalprice").over(w_fwd).alias("final_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# q156 — higher-order-function gallery over documents.
# ---------------------------------------------------------------------------


@query(
    "q156_hof_gallery",
    oracle="""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
)
SELECT doc_id,
       coalesce(array_to_string(list_transform(list_slice(toks, 1, 5),
                                               tk -> upper(tk)), ' '), '')
         AS head5_upper,
       len(list_filter(toks, tk -> tk = 'join')) > 0 AS has_join,
       len(list_filter(toks, tk -> NOT len(tk) > 2)) = 0 AS all_longer2,
       CAST(list_aggregate(list_transform(toks, tk -> len(tk)), 'sum') AS BIGINT)
         AS tok_len_sum,
       coalesce(array_to_string(
           list_transform(range(1, len(toks) + 1),
                          i -> toks[i] || '_' || list_reverse(toks)[i]), ' '), '')
         AS zipped,
       coalesce(array_to_string(list_slice(toks, 2, 4), ' '), '') AS mid3
FROM t
ORDER BY doc_id
""",
)
def q156_hof_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions as gated outputs: transform (+ slice),
    exists, forall, aggregate (integer fold — exact), zip_with against the
    reversed array (equal lengths, so Spark's null-extension never fires),
    and slice. All JVM-side codegen'd lambdas — the 100 TB story is
    'per-row, no shuffle, no Python'. Collections ship as joined strings
    (driver canonicalizer contract)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return (
        docs.select(
            "doc_id",
            F.array_join(
                F.transform(F.slice(toks, 1, 5), lambda t: F.upper(t)), " "
            ).alias("head5_upper"),
            F.exists(toks, lambda t: t == F.lit("join")).alias("has_join"),
            F.forall(toks, lambda t: F.length(t) > 2).alias("all_longer2"),
            F.aggregate(
                toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
            ).alias("tok_len_sum"),
            F.array_join(
                F.zip_with(
                    toks,
                    F.reverse(toks),
                    lambda x, y: F.concat(x, F.lit("_"), y),
                ),
                " ",
            ).alias("zipped"),
            F.array_join(F.slice(toks, 2, 3), " ").alias("mid3"),
        )
        .orderBy("doc_id")
    )
