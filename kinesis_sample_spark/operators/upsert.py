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


def _hadoop_fs(spark, path: str):
    """Hadoop FileSystem + Path for ``path`` — works on any Hadoop-backed
    store (local, HDFS, s3a), which is what makes the tmp/backup rename
    dance below portable to a real cluster."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def foreach_batch_upsert(table_path: str, key: str, version_col: str):
    """foreachBatch sink: stream CDC micro-batches into a parquet table via
    read-merge-publish. Idempotent per batch (same input ⇒ same output),
    so micro-batch replay after failure converges — the Spark replacement
    for the reference's checkpoint+retry bookkeeping applied to a
    mutable-table sink.

    Durability: the merged result is written to a ``__tmp`` directory
    while the live table stays intact (so the merge's lineage can read it
    lazily — no cache/collect needed), then published by rename:
    live → ``__bak``, tmp → live, drop ``__bak``. A crash at any point
    leaves a complete copy of the data on disk — mid-write keeps the old
    live table; between the renames leaves ``__bak``, which the next
    batch's read path recovers from. Contrast with in-place overwrite,
    where a crash (or cache eviction forcing a recompute against the
    truncated path) silently discards the whole table history."""

    tmp_path = table_path + "__tmp"
    bak_path = table_path + "__bak"

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        fs, live = _hadoop_fs(spark, table_path)
        _, tmp = _hadoop_fs(spark, tmp_path)
        _, bak = _hadoop_fs(spark, bak_path)
        if fs.exists(live):
            current = spark.read.parquet(table_path)
        elif fs.exists(bak):
            # crashed between the publish renames — the backup IS the table
            current = spark.read.parquet(bak_path)
        else:
            current = batch_df.limit(0)
        merged = merge_upsert(current, batch_df, key, version_col)
        merged.write.mode("overwrite").parquet(tmp_path)
        if fs.exists(bak):
            fs.delete(bak, True)
        if fs.exists(live):
            if not fs.rename(live, bak):
                raise OSError(f"rename {table_path} -> {bak_path} failed")
        if not fs.rename(tmp, live):
            raise OSError(f"rename {tmp_path} -> {table_path} failed")
        fs.delete(bak, True)

    return _apply
