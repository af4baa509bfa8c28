"""MERGE/upsert emulation — CDC into parquet without a table format.

Delta/Iceberg provide MERGE INTO natively; their jars are not in this
image (engine rule: stub behind capability checks). The portable
emulation: keep the latest version per key from (current ∪ updates) —
an anti-join-free formulation using a window over the union, which also
handles multiple updates for the same key in one batch (last-writer-wins
by a version column).

Scale: one shuffle on the key. For partitioned tables, restrict the
rewrite to the partitions present in ``updates`` (dynamic partition
overwrite) — full-table rewrites are the naive trap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def merge_upsert(
    current: DataFrame,
    updates: DataFrame,
    key: str | list[str],
    version_col: str,
) -> DataFrame:
    """Last-writer-wins merge of ``updates`` into ``current`` by ``key``,
    ordered by ``version_col`` (ties prefer the update side)."""
    keys = [key] if isinstance(key, str) else list(key)
    tagged = current.withColumn("__src", F.lit(0)).unionByName(
        updates.withColumn("__src", F.lit(1))
    )
    w = W.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), F.col("__src").desc()
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def foreach_batch_upsert(table_path: str, key: str, version_col: str):
    """foreachBatch sink: stream CDC micro-batches into a parquet table via
    read-merge-overwrite. Idempotent per batch (same input ⇒ same output),
    so micro-batch replay after failure converges — the Spark replacement
    for the reference's checkpoint+retry bookkeeping applied to a
    mutable-table sink."""

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            current = spark.read.parquet(table_path)
        except Exception:
            current = batch_df.limit(0)
        merged = merge_upsert(current, batch_df, key, version_col)
        # materialize before overwrite: lazily reading the path being
        # overwritten would truncate-then-read
        merged.cache()
        merged.count()
        merged.write.mode("overwrite").parquet(table_path)
        merged.unpersist()

    return _apply
