"""The record envelope — the reference's one data abstraction.

Mirrors the Kinesis record fields the reference touches (SURVEY.md §1.1):
``data`` (opaque bytes), ``partitionKey`` (Prod:130), ``sequenceNumber`` /
``shardId`` (server-assigned, logged at Prod:134-135), and the approximate
arrival timestamp KCL exposes. This is also the output schema shape of the
public awslabs spark-sql-kinesis connector, so swapping the simulated
source for real Kinesis is a one-line ``format()`` change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("data", T.BinaryType(), False),
        T.StructField("partitionKey", T.StringType(), False),
        T.StructField("sequenceNumber", T.StringType(), False),
        T.StructField("shardId", T.StringType(), False),
        T.StructField("approximateArrivalTimestamp", T.TimestampType(), False),
    ]
)

#: producer payload format — "testData-" + LocalDateTime.now()
#: (Prod:128-129; documented at reference README.md:14)
PAYLOAD_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSS"

N_SHARDS = 2  # the reference's provisioned parallelism (Prod:66, :94-95)


def _to_envelope(df: DataFrame, ts_col: str, key_col: str, seq_col: str) -> DataFrame:
    """Wrap arbitrary rows into the envelope: payload bytes, partition key,
    sequence number, and a shard id derived from the key hash (Kinesis
    routes partition-key → shard by hash; pmod(hash) is our stand-in)."""
    payload = F.concat(F.lit("testData-"), F.date_format(F.col(ts_col), PAYLOAD_TS_FMT))
    return df.select(
        F.encode(payload, "UTF-8").alias("data"),
        F.concat(F.lit("partitionKey-"), F.col(key_col).cast("string")).alias("partitionKey"),
        F.col(seq_col).cast("string").alias("sequenceNumber"),
        F.concat(
            F.lit("shardId-"),
            F.lpad(F.pmod(F.hash(F.col(key_col)), F.lit(N_SHARDS)).cast("string"), 12, "0"),
        ).alias("shardId"),
        F.col(ts_col).alias("approximateArrivalTimestamp"),
    )


def envelope_from_events(events: DataFrame) -> DataFrame:
    """events fixture → envelope stream (works on both batch and streaming
    DataFrames; the events table is the driver's stand-in for the
    reference's stream, FIXTURES.md)."""
    return _to_envelope(events, ts_col="ts", key_col="user_id", seq_col="event_id")


def rate_producer(spark, rows_per_second: int = 2) -> DataFrame:
    """A1 producer simulation: the reference emits ~2 records/s (500 ms
    sleep, Prod:136). ``rate`` source generates (timestamp, value) at the
    configured rate; we wrap it into the envelope exactly as the producer
    builds its PutRecordRequest (Prod:126-132)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return _to_envelope(rate, ts_col="timestamp", key_col="value", seq_col="value")


def decode_envelope(env: DataFrame) -> DataFrame:
    """A12, typed: UTF-8-decode the opaque bytes (Proc:102-103) and lift the
    embedded ISO timestamp into a real event-time column — the step the
    reference logs but never parses (Proc:104). Malformed payloads yield
    null ``event_ts`` (to_timestamp's try semantics) and are split out by
    streaming.dlq rather than silently dropped (A11)."""
    payload = F.decode(F.col("data"), "UTF-8")
    # try_to_timestamp, not to_timestamp: under ANSI mode a malformed
    # payload would kill the whole micro-batch (the exact failure mode the
    # reference's Runtime.halt fail-stop has, Proc:176-178); null-on-fail
    # feeds the DLQ split instead.
    return env.select(
        "*",
        payload.alias("payload"),
        F.try_to_timestamp(
            F.expr("substring(decode(data, 'UTF-8'), 10)"), F.lit(PAYLOAD_TS_FMT)
        ).alias("event_ts"),
    )
