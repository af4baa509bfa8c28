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


def _publish(spark, df: DataFrame, table_path: str) -> None:
    """Write ``df`` to ``table_path`` with the same crash-safe
    tmp → (live → bak) → live rename dance ``foreach_batch_upsert``
    uses; reads of ``table_path`` must go through :func:`_read_live`."""
    tmp_path = table_path + "__tmp"
    bak_path = table_path + "__bak"
    fs, live = _hadoop_fs(spark, table_path)
    _, tmp = _hadoop_fs(spark, tmp_path)
    _, bak = _hadoop_fs(spark, bak_path)
    df.write.mode("overwrite").parquet(tmp_path)
    if fs.exists(bak):
        fs.delete(bak, True)
    if fs.exists(live):
        if not fs.rename(live, bak):
            raise OSError(f"rename {table_path} -> {bak_path} failed")
    if not fs.rename(tmp, live):
        raise OSError(f"rename {tmp_path} -> {table_path} failed")
    fs.delete(bak, True)


def _read_live(spark, table_path: str) -> DataFrame | None:
    fs, live = _hadoop_fs(spark, table_path)
    _, bak = _hadoop_fs(spark, table_path + "__bak")
    if fs.exists(live):
        return spark.read.parquet(table_path)
    if fs.exists(bak):
        return spark.read.parquet(table_path + "__bak")
    return None


def foreach_batch_dual_sink(raw_dir: str, agg_path: str):
    """foreachBatch sink feeding TWO tables from one micro-batch — the
    fan-OUT dual of a stream union: (1) raw rows land in one
    epoch-addressed directory per batch (``epoch=<id>`` overwritten
    whole, so a replayed epoch converges instead of duplicating), and
    (2) a running per-event-type aggregate is additively merged and
    published with the crash-safe rename dance. Because both sinks ride
    the SAME epoch, they cannot drift under retry/replay: re-running an
    epoch rewrites its raw partition and re-derives the aggregate from
    scratch state plus the batch — the multi-sink exactly-once contract
    q313 hash-gates end to end.

    The merged sum is re-narrowed to DECIMAL(22,2) before every publish:
    Spark widens SUM(decimal) by 10 digits per aggregation, so an
    un-narrowed running table would hit the 38-digit precision cap after
    three epochs (the SCALING.md decimal-width trap, streaming edition).
    """
    import os

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_df.write.mode("overwrite").parquet(
            os.path.join(raw_dir, f"epoch={epoch_id}")
        )
        batch_agg = batch_df.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("decimal(22,2)")
            .alias("sum_value"),
        )
        current = _read_live(spark, agg_path)
        both = batch_agg if current is None else current.unionByName(batch_agg)
        merged = both.groupBy("event_type").agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").cast("decimal(22,2)").alias("sum_value"),
        )
        # localCheckpoint: the publish rename would otherwise invalidate
        # the lazy lineage that still reads the live table being renamed
        _publish(spark, merged.localCheckpoint(eager=True), agg_path)

    return _apply
