"""Pareto-frontier (skyline) operators — round-14 second batch.

The skyline of a relation under a dominance order (no other row is at
least as good on every dimension and strictly better on one) is the
multi-objective answer a single ORDER BY cannot give: "show me every
part that is not strictly worse than another" has no scoring function.
Two genuinely different distributed strategies, each checked against a
DuckDB NOT-EXISTS dominance oracle:

- q305 (2-D): a pure window-algebra formulation — per price level, a row
  survives iff no cheaper level reaches its size and no same-price row
  exceeds it. One shuffle, no self-join, no Python.
- q306 (3-D): the classic partial-skyline merge — each partition prunes
  to its local skyline (mapInPandas), the tiny survivors re-skyline in a
  final single-partition pass. This is the shape that scales: local
  pruning is embarrassingly parallel and the merge input is bounded by
  the skyline size, not the relation.

All dominance comparisons run on exact integers (prices in cents,
revenue in 10^-4 currency units, dates in epoch days), so the frontier
is bit-deterministic in both engines.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.queries import query


# ---------------------------------------------------------------------------
# q305 — 2-D skyline per brand via window algebra (min price, max size).
# ---------------------------------------------------------------------------
@query(
    "q305_pareto_skyline_parts",
    oracle="""
WITH p AS (
    SELECT p_brand, p_partkey, p_size,
           CAST(CAST(p_retailprice AS DECIMAL(12,2)) * 100 AS BIGINT)
             AS price_c
    FROM part
)
SELECT b.p_brand AS brand, b.p_partkey, b.price_c, b.p_size
FROM p b
WHERE NOT EXISTS (
    SELECT 1 FROM p a
    WHERE a.p_brand = b.p_brand
      AND a.price_c <= b.price_c AND a.p_size >= b.p_size
      AND (a.price_c < b.price_c OR a.p_size > b.p_size)
)
ORDER BY brand, price_c, p_partkey
""",
)
def q305_pareto_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pareto frontier of parts under (minimize retail price,
    maximize size) — the assortment a buyer actually chooses from, since
    every off-frontier part has a same-brand alternative that is cheaper
    AND at least as large (or equal-priced and strictly larger).

    The Spark side never self-joins: group to per-(brand, price) max
    size, take the running max over ascending price (``cum_le``) and its
    lag (``cum_lt`` = best size strictly cheaper), join the two scalars
    back, and a row is dominated iff a same-or-cheaper level strictly
    beats its size or a strictly-cheaper level ties it. The oracle is
    the textbook NOT-EXISTS dominance query — a completely different
    algorithm that must select the identical row set.

    Prices compare as exact cents (decimal → ×100 → BIGINT), so the
    frontier has no float-comparison ambiguity.

    Scale: one shuffle on (brand, price-level); the window state is one
    running max per brand. The NOT-EXISTS form the oracle runs is the
    quadratic trap this operator exists to avoid at 100 TB."""
    p = load_table(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        "p_size",
        (F.col("p_retailprice").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("price_c"),
    )
    level = p.groupBy("p_brand", "price_c").agg(F.max("p_size").alias("gmax"))
    w_cum = (
        W.partitionBy("p_brand")
        .orderBy("price_c")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_lag = W.partitionBy("p_brand").orderBy("price_c")
    levels = level.select(
        "p_brand",
        "price_c",
        F.max("gmax").over(w_cum).alias("cum_le"),
        F.lag(F.max("gmax").over(w_cum)).over(w_lag).alias("cum_lt"),
    )
    dominated = (F.col("cum_le") > F.col("p_size")) | (
        F.coalesce(F.col("cum_lt"), F.lit(-1)) >= F.col("p_size")
    )
    return (
        p.join(levels, ["p_brand", "price_c"])
        .filter(~dominated)
        .select(
            F.col("p_brand").alias("brand"), "p_partkey", "price_c", "p_size"
        )
        .orderBy("brand", "price_c", "p_partkey")
    )


# ---------------------------------------------------------------------------
# q306 — 3-D supplier skyline via partial-skyline merge (mapInPandas).
# ---------------------------------------------------------------------------
_SKY_SCHEMA = "l_suppkey bigint, rev_u bigint, n_parts bigint, first_day int"


def _skyline_pd(pdf: pd.DataFrame) -> pd.DataFrame:
    """Exact O(n²) skyline of one in-memory block: keep rows no other
    row dominates (rev_u and n_parts maximized, first_day minimized).
    Runs only on partition-local blocks and on the bounded merge of
    partial skylines — never on the full relation at once."""
    rows = pdf.to_dict("records")
    keep = []
    for i, b in enumerate(rows):
        dominated = False
        for j, a in enumerate(rows):
            if i == j:
                continue
            if (
                a["rev_u"] >= b["rev_u"]
                and a["n_parts"] >= b["n_parts"]
                and a["first_day"] <= b["first_day"]
                and (
                    a["rev_u"] > b["rev_u"]
                    or a["n_parts"] > b["n_parts"]
                    or a["first_day"] < b["first_day"]
                    # exact duplicates: deterministic survivor = min key
                    or a["l_suppkey"] < b["l_suppkey"]
                )
            ):
                dominated = True
                break
        if not dominated:
            keep.append(b)
    return pd.DataFrame(keep, columns=pdf.columns)


def _local_skyline(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    block = pd.concat(list(batches), ignore_index=True)
    if len(block):
        yield _skyline_pd(block)


@query(
    "q306_supplier_skyline_3d",
    oracle="""
WITH m AS (
    SELECT l_suppkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (1 - CAST(l_discount AS DECIMAL(4,2)))) * 10000 AS BIGINT)
             AS rev_u,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(datediff('day', DATE '1970-01-01', MIN(l_shipdate)) AS INTEGER)
             AS first_day
    FROM lineitem GROUP BY 1
)
SELECT b.l_suppkey, b.rev_u, b.n_parts, b.first_day
FROM m b
WHERE NOT EXISTS (
    SELECT 1 FROM m a
    WHERE a.rev_u >= b.rev_u AND a.n_parts >= b.n_parts
      AND a.first_day <= b.first_day
      AND (a.rev_u > b.rev_u OR a.n_parts > b.n_parts
           OR a.first_day < b.first_day OR a.l_suppkey < b.l_suppkey)
)
ORDER BY l_suppkey
""",
)
def q306_supplier_skyline_3d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-D supplier skyline: maximize lifetime revenue, maximize distinct
    parts carried, minimize first-shipment day (earliest track record) —
    the non-dominated sourcing candidates under three incomparable
    objectives. Exact duplicates on all three metrics keep only the
    min-key supplier, so the frontier is a deterministic set.

    2-D skylines have a window formulation (q305); at 3+ dimensions no
    single sort order works, so this runs the distributed algorithm: each
    partition prunes its block to a LOCAL skyline (``mapInPandas`` —
    dominance is not expressible as a bounded window at 3-D), then the
    surviving candidates (bounded by the global skyline size, typically
    ≪ n) merge in one final single-partition pass. Local pruning is
    sound because global dominance implies block-local dominance —
    a row dominated anywhere is dominated in the merge too.

    Every metric is an exact integer (revenue in 10⁻⁴ currency units via
    decimal arithmetic, epoch-day BIGINTs), so dominance is
    bit-deterministic and the oracle's NOT-EXISTS selects the identical
    set.

    Scale: the metric build is one partial-aggregated groupBy; local
    skylines are embarrassingly parallel; only skyline survivors (not
    the relation) reach the merge. The O(n²) loop runs per block, never
    globally."""
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy("l_suppkey").agg(
        (
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
            )
            * 10000
        )
        .cast("bigint")
        .alias("rev_u"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.datediff(F.min("l_shipdate"), F.lit("1970-01-01").cast("date"))
        .cast("int")
        .alias("first_day"),
    )
    partial = m.mapInPandas(_local_skyline, _SKY_SCHEMA)
    merged = partial.repartition(1).mapInPandas(_local_skyline, _SKY_SCHEMA)
    return merged.select("l_suppkey", "rev_u", "n_parts", "first_day").orderBy(
        "l_suppkey"
    )
