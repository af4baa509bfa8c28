"""Custom Python DataSource replaying the reference producer.

The reference's producer (AmazonKinesisRecordProducerSample.java:125-137)
emits one record every 500 ms: payload ``"testData-" + LocalDateTime.now()``
(:128-129, format documented in README.md:12-16), partition key
``"partitionKey-" + currentTimeMillis`` (:130), onto a 2-shard stream
(:94-96); the service assigns (shardId, sequenceNumber) (:134-135).

This DataSource (Spark 4 Python DataSource API) reproduces that record
stream *deterministically*: a fixed start instant replaces wall-clock now,
sequence numbers are explicit, and shard assignment round-robins the way a
2-shard random-partition-key spray averages out. One InputPartition per
shard — the source parallelism IS the shard count, exactly the reference's
model (SURVEY §1.1: "shard count = provisioned parallelism").

Registered under the short name ``kinesis_sample_producer``; options:
``rows`` (total records), ``shards``, ``start_ms`` (epoch millis of the
first record), ``interval_ms`` (inter-record delay, default the
reference's 500).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SOURCE_NAME = "kinesis_sample_producer"
PRODUCER_SCHEMA = (
    "sequence_number bigint, shard_id string, partition_key string, data string"
)

DEFAULT_START_MS = 1704067200000  # 2024-01-01T00:00:00Z — fixed "now"
DEFAULT_INTERVAL_MS = 500  # Prod:136 sleep
DEFAULT_SHARDS = 2  # Prod:94-96 createStream(..., 2)


def _payload(epoch_ms: int) -> str:
    """``testData-<ISO datetime with millis>`` (README.md:14).

    Known divergence from the reference, on purpose: Java's
    ``LocalDateTime.now().toString()`` (Prod:128-129) emits *local* time
    and **omits the fractional seconds entirely when nanos == 0** (and
    otherwise prints 3/6/9 digits, never zero-padded to exactly three).
    This deterministic replay always emits UTC with exactly 3-digit
    millis so the record stream is reproducible byte-for-byte; consumers
    must therefore decode with optional-fraction tolerance (as
    queries/pysource.py does via default-pattern ``try_to_timestamp``) so
    the same decode path would also accept real reference payloads like
    ``testData-2018-05-30T19:40:48`` or ``...T19:40:48.1``."""
    import datetime

    dt = datetime.datetime.fromtimestamp(epoch_ms / 1000.0, tz=datetime.timezone.utc)
    return "testData-" + dt.strftime("%Y-%m-%dT%H:%M:%S.") + f"{epoch_ms % 1000:03d}"


class _ShardPartition(InputPartition):
    def __init__(self, shard: int):
        self.shard = shard


class ProducerReader(DataSourceReader):
    def __init__(self, options):
        self.rows = int(options.get("rows", "1000"))
        self.shards = int(options.get("shards", str(DEFAULT_SHARDS)))
        self.start_ms = int(options.get("start_ms", str(DEFAULT_START_MS)))
        self.interval_ms = int(options.get("interval_ms", str(DEFAULT_INTERVAL_MS)))

    def partitions(self):
        return [_ShardPartition(s) for s in range(self.shards)]

    def read(self, partition: _ShardPartition):
        # Each task generates only its own shard's records — no driver
        # materialization, memory O(1) per row; at scale `rows` becomes a
        # per-shard cursor range exactly like a real shard iterator.
        for seq in range(partition.shard, self.rows, self.shards):
            epoch_ms = self.start_ms + seq * self.interval_ms
            yield (
                seq,
                f"shardId-{partition.shard:012d}",
                f"partitionKey-{epoch_ms}",
                _payload(epoch_ms),
            )


class KinesisSampleProducerSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return SOURCE_NAME

    def schema(self) -> str:
        return PRODUCER_SCHEMA

    def reader(self, schema) -> ProducerReader:
        return ProducerReader(self.options)


def register(spark) -> None:
    """Idempotently register the source on this session."""
    spark.dataSource.register(KinesisSampleProducerSource)


# ---------------------------------------------------------------------------
# Streaming variant: the same deterministic record stream through Spark 4's
# Python STREAMING DataSource API (round 16).
# ---------------------------------------------------------------------------
STREAM_SOURCE_NAME = "kinesis_sample_producer_stream"


class _ShardRange(InputPartition):
    """One shard's slice of a micro-batch's [start, end) sequence range."""

    def __init__(self, shard: int, start_seq: int, end_seq: int):
        self.shard = shard
        self.start_seq = start_seq
        self.end_seq = end_seq


class ProducerStreamReader(DataSourceStreamReader):
    """``DataSourceStreamReader`` (the real ABC — the engine routes a
    reader to the streaming read path by isinstance, so duck-typing
    lands on the batch planner): offsets live on the DRIVER and are
    checkpointed by the engine; row generation happens in TASKS, one per shard per
    micro-batch — the KCL model (shard = unit of parallelism, shard
    cursor = resume position) re-expressed through the Python streaming
    source API.

    Offset = ``{"seq": n}`` — the next sequence number to emit, exactly a
    shard-iterator position (A9). ``latestOffset`` jumps straight to the
    configured ``rows`` bound, so a drain processes everything available
    in one batch and a RESTARTED query resumes from the checkpointed
    offset (never re-emitting committed records — q347 gates that).
    ``partitions(start, end)`` regenerates any range deterministically,
    which is also the A14 story: a replayed/uncommitted batch re-reads
    the same rows bit-for-bit."""

    def __init__(self, options):
        self.rows = int(options.get("rows", "1000"))
        self.shards = int(options.get("shards", str(DEFAULT_SHARDS)))
        self.start_ms = int(options.get("start_ms", str(DEFAULT_START_MS)))
        self.interval_ms = int(options.get("interval_ms", str(DEFAULT_INTERVAL_MS)))

    def initialOffset(self):
        return {"seq": 0}

    def latestOffset(self):
        return {"seq": self.rows}

    def partitions(self, start, end):
        return [
            _ShardRange(s, int(start["seq"]), int(end["seq"]))
            for s in range(self.shards)
        ]

    def read(self, partition: _ShardRange):
        # task-side generation of one shard's slice; seq -> shard is the
        # same round-robin as the batch reader, so the two sources emit
        # identical records for identical ranges
        first = partition.start_seq + (
            (partition.shard - partition.start_seq) % self.shards
        )
        for seq in range(first, partition.end_seq, self.shards):
            epoch_ms = self.start_ms + seq * self.interval_ms
            yield (
                seq,
                f"shardId-{partition.shard:012d}",
                f"partitionKey-{epoch_ms}",
                _payload(epoch_ms),
            )

    def commit(self, end):
        pass

    def stop(self):
        pass


class KinesisSampleProducerStreamSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return STREAM_SOURCE_NAME

    def schema(self) -> str:
        return PRODUCER_SCHEMA

    def streamReader(self, schema) -> ProducerStreamReader:
        return ProducerStreamReader(self.options)


def register_stream(spark) -> None:
    """Idempotently register the streaming source on this session."""
    spark.dataSource.register(KinesisSampleProducerStreamSource)
