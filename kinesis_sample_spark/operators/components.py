"""Connected components by min-label propagation with pointer jumping.

The last step of any near-dup pipeline: candidate *pairs* must become
duplicate *clusters* (a~b, b~c ⇒ {a,b,c}) with one survivor each.
Algorithm: every node starts labeled with itself; each round, a node
takes the min of its own and its neighbors' labels, then labels are
path-compressed one hop (label := label's label — "pointer jumping").
Neighbor propagation alone needs rounds = graph diameter, which is a
silent-wrong-answer cliff on chained near-dups (a 40-node path under a
20-round cap returns two components and no error); with the jump step
the frontier reach roughly doubles per round, so convergence is
O(log diameter) — 20 rounds covers diameters beyond 10^5. Convergence
is still detected exactly (changed == 0); exhausting the cap without
converging now raises instead of returning under-merged clusters.

Scale: each round is two joins + one aggregation keyed on node — the
standard large-graph CC shape (GraphX/GraphFrames use the same idea as
large-star/small-star contraction). The only driver-side value is the
per-round changed-count scalar used for exact convergence detection.
Each round's labels are ``localCheckpoint``ed *lazily* (``eager=False``,
round 13): the per-round changed-count aggregation materializes the
checkpoint anyway, so an eager checkpoint would cost one extra Spark
job per round for nothing. The truncation contract is unchanged —
iterative joins otherwise grow the logical plan exponentially and
Catalyst analysis time — not the data — becomes the bottleneck after
~10 rounds (measured here: a 200-node path hung the old
persist-only loop). The truncation mechanism is parameterized
(session.checkpoint_df, round 17): local mode uses ``localCheckpoint``;
a cluster deploy sets ``SPARK_GRAFT_RELIABLE_CHECKPOINT=1`` (+ optional
``SPARK_GRAFT_CHECKPOINT_DIR``) to get reliable ``checkpoint`` instead,
because a lost executor makes non-replicated localCheckpoint blocks
unrecoverable mid-iteration. tests/test_components_convergence.py pins
long paths and random graphs against a Python union-find; the reliable
path is exercised by tests/test_r17_optimizations.py.

Session hygiene: localCheckpoint blocks persist for the session (and
``spark.catalog.clearCache()`` does NOT free them) — long-lived sessions
should call :func:`kinesis_sample_spark.session.release_checkpoints`
between jobs, as the evidence sweep tools do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_sample_spark.session import checkpoint_df


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 20
) -> DataFrame:
    """Returns (node, component) for every node appearing in ``edges``;
    component = min node id of its connected component. Raises
    ``RuntimeError`` if ``max_iter`` rounds don't reach the fixpoint —
    an under-merged clustering must never be returned silently."""
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    undirected = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    ).distinct()
    undirected = checkpoint_df(undirected, eager=True)

    # Lazy: round 1's changed-count materializes this together with its
    # own checkpoint; rounds >= 2 read their labels from the previous
    # round's checkpoint, so the initial frame is scanned once either way.
    labels = checkpoint_df(
        undirected.select(F.col("a").alias("node")).distinct().withColumn(
            "label", F.col("node")
        ),
        eager=False,
    )

    for _ in range(max_iter):
        neighbor_min = (
            undirected.join(labels, undirected.b == labels.node)
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("label").alias("nbr_label"))
        )
        propagated = (
            labels.join(neighbor_min, labels.node == F.col("node2"), "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias(
                    "plabel"
                ),
                "label",
            )
        )
        # pointer jumping: follow the label one hop (labels are node ids,
        # so every label row exists in `labels`) — this is what turns
        # diameter-linear convergence into logarithmic
        jump = labels.select(
            F.col("node").alias("jnode"), F.col("label").alias("jlabel")
        )
        updated = (
            propagated.join(jump, propagated.plabel == F.col("jnode"), "left")
            .select(
                "node",
                F.least(
                    F.col("plabel"), F.coalesce("jlabel", F.col("plabel"))
                ).alias("new_label"),
                "label",
            )
        )
        updated = checkpoint_df(updated, eager=False)  # truncate lineage: plan growth, not
        # data, dominates iterative joins after ~10 rounds. LAZY: the
        # changed-count below is the round's first action and materializes
        # the checkpoint as a side effect — one Spark job per round
        # instead of two (the fixed job overhead, not data, dominates
        # each round once thresholding has shrunk the graph).
        changed = updated.filter(F.col("new_label") != F.col("label")).count()
        labels = updated.select("node", F.col("new_label").alias("label"))
        if changed == 0:
            return labels.select("node", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge within {max_iter} rounds "
        f"(last round still changed {changed} labels) — refusing to return "
        f"an under-merged clustering; raise max_iter"
    )


def incremental_components(
    old_edges: DataFrame,
    delta_edges: DataFrame,
    src: str,
    dst: str,
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) over the graph ``old_edges ∪ delta_edges``,
    computed INCREMENTALLY: connected components of the old graph are
    contracted to their labels, only the (tiny) contracted-plus-delta
    graph is re-solved, and labels expand back through the contraction.

    Exactness (not just partition-equivalence): component labels are min
    member ids, so a contracted id IS the min of its old component;
    min-label CC over {old labels} ∪ {delta-only node ids} therefore
    yields the global min of every merged component — identical output
    to ``connected_components`` on the full edge union (pinned against a
    full recompute in tests/test_round14_ops.py).

    Scale story: this is the streaming-graph maintenance pattern — the
    re-solved graph has |old communities| + |delta| nodes instead of
    |V|, so a day's delta against a 10^9-node accumulated graph costs
    CC on a few thousand contracted nodes plus three hash joins, never
    a full-graph iteration. Caller contract: ``delta_edges`` must be
    disjoint from ``old_edges`` (an anti-join upstream); overlapping
    edges are harmless for correctness (the contraction collapses them)
    but waste delta width."""
    cc_old = connected_components(old_edges, src, dst, max_iter=max_iter)
    lbl_a = cc_old.select(
        F.col("node").alias("__na"), F.col("component").alias("__ca")
    )
    lbl_b = cc_old.select(
        F.col("node").alias("__nb"), F.col("component").alias("__cb")
    )
    contracted = (
        delta_edges.join(lbl_a, delta_edges[src] == F.col("__na"), "left")
        .join(lbl_b, delta_edges[dst] == F.col("__nb"), "left")
        .select(
            F.coalesce("__ca", F.col(src)).alias("ca"),
            F.coalesce("__cb", F.col(dst)).alias("cb"),
        )
        .filter(F.col("ca") != F.col("cb"))
    )
    cc_delta = connected_components(contracted, "ca", "cb", max_iter=max_iter)
    # expand: node -> contracted id (its old label, or itself if new) ->
    # re-solved label (or the contracted id if its community was untouched)
    all_nodes = (
        old_edges.select(F.col(src).alias("node"))
        .unionByName(old_edges.select(F.col(dst).alias("node")))
        .unionByName(delta_edges.select(F.col(src).alias("node")))
        .unionByName(delta_edges.select(F.col(dst).alias("node")))
        .distinct()
    )
    step1 = all_nodes.join(cc_old, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("cid")
    )
    relabel = cc_delta.select(
        F.col("node").alias("cid"), F.col("component").alias("__final")
    )
    return step1.join(relabel, "cid", "left").select(
        "node", F.coalesce("__final", F.col("cid")).alias("component")
    )
