"""Queries over the custom Python DataSource (sources/producer_source.py).

q160 drives the full reference pipeline shape — producer record stream →
envelope decode (A12) → per-shard accounting — through Spark's Python
DataSource API, with the record generation deterministic enough that the
DuckDB oracle can re-derive every record from ``generate_series``. The
value hash therefore gates the DataSource partition planning (one per
shard), the per-task row generation, the payload format, and the decode
path in one go.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_sample_spark.queries import query
from kinesis_sample_spark.sources.producer_source import (
    DEFAULT_INTERVAL_MS,
    DEFAULT_START_MS,
    SOURCE_NAME,
    register,
)

_ROWS = 2000
_SHARDS = 2


@query(
    "q160_producer_source_scan",
    oracle=f"""
WITH gen AS (
  SELECT seq AS sequence_number,
         seq % {_SHARDS} AS shard,
         make_timestamp(({DEFAULT_START_MS} + seq * {DEFAULT_INTERVAL_MS}) * 1000)
           AS event_ts
  FROM generate_series(0, {_ROWS - 1}) t(seq)
)
SELECT 'shardId-' || lpad(CAST(shard AS VARCHAR), 12, '0') AS shard_id,
       count(*) AS n_records,
       CAST(min(sequence_number) AS BIGINT) AS min_seq,
       CAST(max(sequence_number) AS BIGINT) AS max_seq,
       min(event_ts) AS first_ts,
       max(event_ts) AS last_ts,
       count(DISTINCT sequence_number) AS n_distinct_keys
FROM gen
GROUP BY 1 ORDER BY shard_id
""",
)
def q160_producer_source_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the custom producer DataSource and reduce it to per-shard
    accounting: record counts, sequence ranges, decoded event-time ranges
    (the A12 lift: parse the ``testData-<ISO>`` payload back into a
    timestamp), and partition-key cardinality (== records: the reference's
    millisecond partition keys are unique at 500 ms spacing). sf_dir is
    unused — the source generates its records. Scale: one task per shard;
    adding shards via the option scales the scan linearly, the same lever
    as the reference's shard count."""
    register(spark)
    raw = (
        spark.read.format(SOURCE_NAME)
        .option("rows", str(_ROWS))
        .option("shards", str(_SHARDS))
        .load()
    )
    # Default-pattern try_to_timestamp, not a fixed "…ss.SSS" format: the
    # reference's LocalDateTime.toString() drops the fraction entirely at
    # nanos == 0 and otherwise emits 1-9 digits, so a fixed 3-digit
    # pattern would NULL out real reference payloads. Spark's default
    # parser accepts the optional fraction at any width — one decode path
    # covers both the deterministic replay and the reference's output.
    decoded = raw.withColumn(
        "event_ts",
        F.try_to_timestamp(F.regexp_extract("data", r"^testData-(.+)$", 1)),
    )
    return (
        decoded.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_records"),
            F.min("sequence_number").alias("min_seq"),
            F.max("sequence_number").alias("max_seq"),
            F.min("event_ts").alias("first_ts"),
            F.max("event_ts").alias("last_ts"),
            F.countDistinct("partition_key").alias("n_distinct_keys"),
        )
        .orderBy("shard_id")
    )
