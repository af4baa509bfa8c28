"""File sources: batch readers live in catalog.py; this module provides the
streaming file-source replay used as the Kinesis stand-in in tests
(SURVEY.md §5.2: run the streaming query on a bounded source, compare the
final table to batch SQL).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from kinesis_sample_spark.catalog import load_table

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def write_stream_fixture(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 4
) -> str:
    """Materialize the events fixture as an n-file parquet directory —
    the streaming file source needs a directory it can discover files in
    (each file ≈ a batch of shard records). The nanos→micros lift happens
    here (catalog.load_table) so the stream carries plain TimestampType."""
    events_dir = os.path.join(out_dir, "events_stream")
    load_table(spark, sf_dir, "events").repartition(n_files).write.mode(
        "overwrite"
    ).parquet(events_dir)
    return events_dir


def replay_events_stream(
    spark: SparkSession, events_dir: str, files_per_trigger: int = 1
) -> DataFrame:
    """readStream over the materialized events directory. With
    ``maxFilesPerTrigger=1`` each micro-batch consumes one file — the
    closest local analog to per-shard batch delivery (Proc:162-168)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(events_dir)
    )
