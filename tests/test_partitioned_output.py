"""Partitioned write path + partition pruning — the other half of the
100 TB layout story (bucketing covers join keys; date partitioning covers
time-range scans).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.plans.inspect import formatted_plan

SF = "/root/testdata/sf0.001"


def test_partitioned_write_and_prune(spark, tmp_path):
    out = str(tmp_path / "events_by_day")
    ev = load_table(spark, SF, "events").withColumn(
        "dt", F.date_format("ts", "yyyy-MM-dd")
    )
    ev.write.mode("overwrite").partitionBy("dt").parquet(out)

    back = spark.read.parquet(out)
    one_day = back.filter(F.col("dt") == "2024-01-05")
    plan = formatted_plan(one_day)
    # the dt predicate must be a PartitionFilter (directory pruning),
    # not a post-scan filter over all partitions
    assert "PartitionFilters" in plan and "dt" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0], plan

    expected = ev.filter(F.col("dt") == "2024-01-05").count()
    assert one_day.count() == expected and expected > 0


def test_partitioned_write_roundtrip_complete(spark, tmp_path):
    out = str(tmp_path / "events_by_day2")
    ev = load_table(spark, SF, "events").withColumn(
        "dt", F.date_format("ts", "yyyy-MM-dd")
    )
    ev.write.mode("overwrite").partitionBy("dt").parquet(out)
    assert spark.read.parquet(out).count() == ev.count()


def test_dynamic_partition_overwrite(spark, tmp_path):
    """INSERT OVERWRITE a single day without clobbering the table: with
    partitionOverwriteMode=dynamic, an overwrite write that contains only
    one partition's rows must replace ONLY that partition's directory —
    static mode (the default) would truncate the whole table first. The
    backfill primitive for date-partitioned 100 TB tables."""
    out = str(tmp_path / "events_dyn")
    ev = load_table(spark, SF, "events").withColumn(
        "dt", F.date_format("ts", "yyyy-MM-dd")
    )
    ev.write.mode("overwrite").partitionBy("dt").parquet(out)
    total_before = spark.read.parquet(out).count()
    day = "2024-01-05"
    day_rows = ev.filter(F.col("dt") == day)
    n_day = day_rows.count()
    assert 0 < n_day < total_before

    # backfill the day with doubled rows under dynamic overwrite
    patched = day_rows.unionByName(day_rows)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        patched.write.mode("overwrite").partitionBy("dt").parquet(out)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    back = spark.read.parquet(out)
    assert back.filter(F.col("dt") == day).count() == 2 * n_day
    # every OTHER partition untouched
    assert back.filter(F.col("dt") != day).count() == total_before - n_day
