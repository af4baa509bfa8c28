"""Connected components by iterative min-label propagation.

The last step of any near-dup pipeline: candidate *pairs* must become
duplicate *clusters* (a~b, b~c ⇒ {a,b,c}) with one survivor each.
Algorithm: every node starts labeled with itself; each round, a node takes
the min of its own and its neighbors' labels; converged when no label
changes. Rounds needed = graph diameter (near-dup clusters are tiny, so
2-4 in practice; the cap is a safety bound).

Scale: each round is one join + one aggregation keyed on node — the
standard large-graph CC shape (GraphX/GraphFrames do the same with
smarter star-contraction rounds). The only driver-side value is the
per-round changed-count scalar used for early exit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 20
) -> DataFrame:
    """Returns (node, component) for every node appearing in ``edges``;
    component = min node id of its connected component."""
    undirected = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct().persist()

    labels = undirected.select(F.col("a").alias("node")).distinct().withColumn(
        "label", F.col("node")
    ).persist()

    for _ in range(max_iter):
        neighbor_min = (
            undirected.join(labels, undirected.b == labels.node)
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        updated = (
            labels.join(neighbor_min, labels.node == F.col("node2"), "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias(
                    "new_label"
                ),
                "label",
            )
        ).persist()
        changed = updated.filter(F.col("new_label") != F.col("label")).count()
        new_labels = updated.select("node", F.col("new_label").alias("label")).persist()
        labels.unpersist()
        updated.unpersist()
        labels = new_labels
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))
