"""PageRank with integer arithmetic — iterative graph analytics that can
still be oracle-gated.

Iterative algorithms normally get only a rows-only check because float
accumulation order differs between a 1000-task Spark sum and the oracle's
serial sum. This operator sidesteps that entirely: ranks are scaled
BIGINTs, per-edge contributions use floor division (Spark ``div`` ≡
DuckDB ``//`` on positive integers), and damping is ``(sum·85) div 100``
— every operation is exact and order-independent, so N iterations produce
bit-identical ranks on any cluster size and in a serial SQL unroll.

Scale (100 TB): each iteration is the standard Pregel-as-join shape — one
shuffle join of the rank relation against the edge relation on ``src``
plus one aggregation on ``dst``. The edge relation (with out-degree
attached) is computed once and persisted; iteration count is a fixed
small constant, so total cost is ``iters × (join + agg)`` with no
driver-side data movement at all. High-degree hubs (a supplier touching
thousands of parts) are plain aggregation skew — AQE skew handling
applies; nothing here collects to the driver.

Reference parity note: the reference (AmazonKinesisApplicationSample*.java)
has no graph surface; this comes from the SURVEY §2 engine-category
mandate (iterative/graph analytics for corpus- and catalog-shaped data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Initial rank per node. 1e12 leaves ~6 decimal digits of precision
#: after the worst-case floor-division by a node degree in the fixtures.
RANK_SCALE = 10**12
DAMP_NUM, DAMP_DEN = 85, 100
#: (1 − d) · scale, the per-node teleport term, exact in integers.
RANK_BASE = RANK_SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN


def pagerank_int(
    edges: DataFrame, src: str, dst: str, iterations: int = 3
) -> DataFrame:
    """Undirected integer PageRank over ``edges``; returns
    ``(node, rank)`` for every node after ``iterations`` rounds.

    Contribution of node u to each neighbor is ``rank(u) div deg(u)``
    (floor); the new rank is ``RANK_BASE + (Σ contrib · 85) div 100``.
    Both floor-divisions are on non-negative integers, so Spark's ``div``
    and DuckDB's ``//`` agree and the result is engine-portable.
    """
    und = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    deg = und.groupBy("u").agg(F.count("*").alias("d"))
    # (u, v, d) computed once; every iteration re-reads this relation.
    adjacency = und.join(deg, "u").persist()

    ranks = deg.select(F.col("u").alias("node"), F.lit(RANK_SCALE).cast("bigint").alias("rank"))
    for _ in range(iterations):
        contrib = (
            adjacency.join(ranks, adjacency.u == ranks.node)
            .select(F.col("v").alias("node2"), F.expr("rank div d").alias("c"))
        )
        ranks = (
            contrib.groupBy(F.col("node2").alias("node"))
            .agg(F.sum("c").alias("s"))
            .select(
                "node",
                (F.lit(RANK_BASE) + F.expr(f"(s * {DAMP_NUM}) div {DAMP_DEN}"))
                .cast("bigint")
                .alias("rank"),
            )
        )
    return ranks
