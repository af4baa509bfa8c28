"""As-of (nearest-predecessor) join — SURVEY.md §2 Table B "as-of/range".

Spark has no native ASOF JOIN (DuckDB and pandas ``merge_asof`` do). The
scalable composition: tag both sides, union, and take a running
``last(..., ignoreNulls)`` over a window sorted by (key, time, side) —
i.e. one shuffle + one sort per side, identical cost shape to a sort-merge
join, with no row explosion. This beats the per-key
``applyInPandas(merge_asof)`` fallback because it stays JVM-side and
handles any per-key cardinality without materializing a group in memory.

Scale: partitions by join key; skewed keys are handled by AQE the same way
a regular SMJ would be. State per task is O(1) (the running last struct).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    *,
    inclusive: bool = True,
    direction: str = "backward",
    right_prefix: str = "r_",
) -> DataFrame:
    """For each left row, attach the nearest right row, matching on the
    equi key(s) ``on``:

    - ``direction="backward"`` (default): latest right with
      ``right.ts <= left.ts`` (``<`` when ``inclusive=False``),
    - ``direction="forward"``: earliest right with
      ``right.ts >= left.ts`` (``>`` when ``inclusive=False``) — the
      mirror image, implemented with ``first()`` over the following
      frame instead of ``last()`` over the preceding one; same single
      shuffle + sort cost shape.

    Right columns come back prefixed. Right-side ties on (key, ts) are
    resolved deterministically by keeping the lexicographically-last
    right payload struct.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)

    r_payload_cols = [c for c in right.columns if c not in keys]
    # deterministic: collapse right-side ties on (key, ts) to one payload
    r = (
        right.select(
            *keys,
            F.col(right_ts).alias("__t"),
            F.struct(*[F.col(c) for c in r_payload_cols]).alias("__rp"),
        )
        .groupBy(*keys, "__t")
        .agg(F.max("__rp").alias("__rp"))
        .withColumn("__side", F.lit(0))
    )
    l_payload_cols = [c for c in left.columns if c not in keys]
    l = left.select(
        *keys,
        F.col(left_ts).alias("__t"),
        F.struct(*[F.col(c) for c in l_payload_cols]).alias("__lp"),
    ).withColumn("__side", F.lit(1))

    unioned = l.withColumn("__rp", F.lit(None).cast(r.schema["__rp"].dataType)).select(
        *keys, "__t", "__side", "__lp", "__rp"
    ).unionByName(
        r.withColumn("__lp", F.lit(None).cast(l.schema["__lp"].dataType)).select(
            *keys, "__t", "__side", "__lp", "__rp"
        )
    )

    if direction == "backward":
        # inclusive: right sorts before left at equal ts (side 0 < 1), so
        # the running last() sees it; exclusive: flip the side order.
        side_order = F.col("__side").asc() if inclusive else F.col("__side").desc()
        w = (
            W.partitionBy(*keys)
            .orderBy(F.col("__t").asc(), side_order)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        matched = unioned.withColumn(
            "__match", F.last("__rp", ignorenulls=True).over(w)
        )
    else:
        # forward mirror: inclusive means a right row AT the left ts must
        # be inside the [current, following] frame, so left sorts first
        # at equal ts (side 1 before 0 → desc); exclusive flips it.
        side_order = F.col("__side").desc() if inclusive else F.col("__side").asc()
        w = (
            W.partitionBy(*keys)
            .orderBy(F.col("__t").asc(), side_order)
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        matched = unioned.withColumn(
            "__match", F.first("__rp", ignorenulls=True).over(w)
        )

    out_cols: list[Column] = [F.col(k) for k in keys]
    out_cols += [F.col("__lp").getField(c).alias(c) for c in l_payload_cols]
    out_cols += [
        F.col("__match").getField(c).alias(f"{right_prefix}{c}") for c in r_payload_cols
    ]
    return matched.filter(F.col("__side") == 1).select(*out_cols)
