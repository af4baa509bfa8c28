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
