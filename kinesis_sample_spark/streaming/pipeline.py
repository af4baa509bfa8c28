"""Streaming pipelines mirroring the reference consumer (SURVEY.md §2/§3).

Each builder takes a *streaming* DataFrame (envelope schema) and returns a
transformed streaming DataFrame; callers attach ``writeStream`` with a
``checkpointLocation`` (A13 — Spark checkpoints offsets per micro-batch,
strictly stronger than the reference's 60 s DynamoDB cadence, Proc:52).

Watermarks bound the state stores so these run indefinitely at any input
rate: state is per (key × open-window), not per record.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kinesis_sample_spark.streaming.dlq import split_dlq
from kinesis_sample_spark.streaming.envelope import decode_envelope


def streaming_window_counts(
    env: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Decode (A12) → watermark → tumbling event-time window counts.
    The watermark drops data later than its bound and lets Spark purge
    window state — the piece the reference (processing-time only) lacks."""
    decoded = decode_envelope(env)
    good, _ = split_dlq(decoded, "event_ts")
    return (
        good.withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window).alias("w"), F.col("partitionKey"))
        .agg(F.count("*").alias("n_records"))
        .select(F.col("w.start").alias("w_start"), "partitionKey", "n_records")
    )


def streaming_dedup(env: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming dedup on (partitionKey, sequenceNumber) —
    at-least-once replay (A14: reprocessing after lease loss) collapses to
    effectively-once output. State is bounded by the watermark."""
    decoded = decode_envelope(env)
    good, _ = split_dlq(decoded, "event_ts")
    return good.withWatermark("event_ts", watermark).dropDuplicatesWithinWatermark(
        ["partitionKey", "sequenceNumber"]
    )


def consume_with_dlq(
    env: DataFrame,
    good_path: str,
    dlq_path: str,
    checkpoint: str,
) -> StreamingQuery:
    """The full consumer loop (A10-A13) as ``foreachBatch``: decode, split
    poison records to a durable DLQ sink, write good records — both sinks
    written per micro-batch, offsets committed after (at-least-once into
    idempotent parquet ⇒ exactly-once end-to-end). This is the engine's
    replacement for processRecordsWithRetries (Proc:63-91)."""

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        decoded = decode_envelope(batch_df)
        good, dlq = split_dlq(decoded, "event_ts")
        good.drop("data").write.mode("append").parquet(good_path)
        dlq.drop("data").write.mode("append").parquet(dlq_path)

    return (
        env.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb_state(spark, enabled: bool = True) -> None:
    """Switch stateful queries to the RocksDB state store (SURVEY.md §7:
    the scale choice). The default in-memory HDFS-backed provider keeps all
    state on the executor heap — fine for tests, fatal for a week-long
    streaming job with millions of keys; RocksDB spills to local disk with
    incremental checkpointing. Takes effect for queries started after the
    call."""
    if enabled:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def stop_query(query: StreamingQuery, timeout_s: float = 20.0, drain: bool = False) -> bool:
    """A16 graceful shutdown: the reference blocks on stdin then waits 20 s
    for the scheduler's graceful-shutdown future (Cons:86-105).

    ``drain=True`` waits for all *currently available* input first — only
    meaningful on bounded sources (file replay); on an unbounded source
    (rate/Kinesis) ``processAllAvailable`` never returns, so the default
    stops after the in-flight micro-batch, which is exactly the
    reference's graceful-shutdown semantics."""
    try:
        if drain:
            query.processAllAvailable()
    finally:
        query.stop()
    return query.awaitTermination(timeout_s) or not query.isActive
