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


def _decode_ts():
    """q160's payload decode, shared by every query that lifts the event
    time back out of the ``testData-<ISO>`` envelope (see q160's
    docstring for why the default-pattern parser, not a fixed format).
    A function, not a module constant: building a Column needs an active
    session in classic mode."""
    return F.try_to_timestamp(F.regexp_extract("data", r"^testData-(.+)$", 1))


def _drain_available_now(writer, timeout_s: int = 300) -> None:
    """Start an availableNow streaming writer, await termination, raise
    with the query stopped on timeout — the drain protocol shared by
    q347/q349/q350."""
    from kinesis_sample_spark.streaming.pipeline import stop_query

    q = writer.trigger(availableNow=True).start()
    if not q.awaitTermination(timeout_s):
        stop_query(q)
        raise RuntimeError(f"drain did not finish within {timeout_s} s")


def _read_piped_lines(spark: SparkSession, glob: str, *casts: str) -> DataFrame:
    """Read the line sink's committed files and split the ``|`` codec
    back into typed columns (the read-back half of q348/q349/q350)."""
    exprs = [
        f"CAST(split(value, '\\\\|')[{i}] AS {typ}) AS {name}"
        if typ != "string"
        else f"split(value, '\\\\|')[{i}] AS {name}"
        for i, (name, typ) in enumerate(c.split(":") for c in casts)
    ]
    return spark.read.text(glob).selectExpr(*exprs)


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
    decoded = raw.withColumn("event_ts", _decode_ts())
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


# ---------------------------------------------------------------------------
# q347 — the STREAMING Python DataSource, gated on checkpoint RESUME.
# ---------------------------------------------------------------------------
_S_ROWS_1 = 1000  # first incarnation's bound
_S_ROWS_2 = 2000  # second incarnation's bound (same checkpoint)


@query(
    "q347_live_python_stream_source",
    oracle=f"""
WITH gen AS (
  SELECT seq AS sequence_number,
         seq % {_SHARDS} AS shard,
         make_timestamp(({DEFAULT_START_MS} + seq * {DEFAULT_INTERVAL_MS}) * 1000)
           AS event_ts
  FROM generate_series(0, {_S_ROWS_2 - 1}) t(seq)
)
SELECT 'shardId-' || lpad(CAST(shard AS VARCHAR), 12, '0') AS shard_id,
       count(*) AS n_records,
       count(DISTINCT sequence_number) AS n_distinct_seq,
       CAST(min(sequence_number) AS BIGINT) AS min_seq,
       CAST(max(sequence_number) AS BIGINT) AS max_seq,
       min(event_ts) AS first_ts,
       max(event_ts) AS last_ts,
       CAST({_S_ROWS_1} AS BIGINT) AS first_incarnation_rows
FROM gen
GROUP BY 1 ORDER BY shard_id
""",
)
def q347_live_python_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE Python STREAMING DataSource (Spark 4 ``streamReader`` API —
    q160 is the batch sibling): driver-side offset management
    (``initialOffset``/``latestOffset``/``commit``) checkpointed by the
    engine, per-shard task-side row generation (``partitions(start,
    end)`` → one InputPartition per shard). The gate is the A9 resume
    law through this API: incarnation 1 drains records 0..999 into a
    parquet sink against a fresh checkpoint and stops; incarnation 2 —
    SAME checkpoint and sink, source bound raised to 2000 — must append
    EXACTLY the delta 1000..1999. The committed table is gated as a
    whole: per shard n_records == n_distinct_seq == 1000 over seq
    0..1999, so a source that re-emitted committed records (offset lost
    on deserialize), or an engine that dropped the WAL, duplicates the
    first thousand and fails the hash; the in-query check additionally
    pins incarnation 1's count BEFORE the resume so "the delta was
    exactly the second half" is part of the claim, not an inference.
    (A memory sink cannot do this — it refuses checkpoint recovery; the
    durable-sink requirement IS part of the resume law.) sf_dir is
    unused — the source generates its records.

    Scale: offsets are O(1) driver state (a shard cursor, the KCL
    model); generation is one task per shard per batch, and
    ``partitions`` regenerates any uncommitted range deterministically
    (the A14 replay contract). At real scale this source shape is a
    Kinesis/Kafka connector: same offset algebra, same resume law."""
    import os

    from kinesis_sample_spark.scratch import scratch_dir
    from kinesis_sample_spark.sources.producer_source import (
        STREAM_SOURCE_NAME,
        register_stream,
    )

    register_stream(spark)
    work = scratch_dir(prefix="kss_pystream_")
    ck = os.path.join(work, "ck")
    out = os.path.join(work, "out")

    def _drain(rows: int) -> None:
        _drain_available_now(
            spark.readStream.format(STREAM_SOURCE_NAME)
            .option("rows", str(rows))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
        )

    _drain(_S_ROWS_1)
    n1 = spark.read.parquet(out).count()
    if n1 != _S_ROWS_1:
        raise RuntimeError(
            f"q347: first incarnation committed {n1} rows, expected {_S_ROWS_1}"
        )
    _drain(_S_ROWS_2)  # same checkpoint + sink: must append only the delta

    decoded = spark.read.parquet(out).withColumn("event_ts", _decode_ts())
    return (
        decoded.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_records"),
            F.countDistinct("sequence_number").alias("n_distinct_seq"),
            F.min("sequence_number").alias("min_seq"),
            F.max("sequence_number").alias("max_seq"),
            F.min("event_ts").alias("first_ts"),
            F.max("event_ts").alias("last_ts"),
            F.lit(n1).cast("bigint").alias("first_incarnation_rows"),
        )
        .orderBy("shard_id")
    )


# ---------------------------------------------------------------------------
# q348 — custom Python BATCH sink: the task-write / driver-commit protocol.
# ---------------------------------------------------------------------------
@query(
    "q348_python_sink_roundtrip",
    oracle="""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
       CAST(min(o_orderkey) AS BIGINT) AS min_key,
       CAST(max(o_orderkey) AS BIGINT) AS max_key
FROM orders
""",
)
def q348_python_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource WRITER (Spark 4 ``writer`` API — the
    write half of the surface q160/q347 read with): every task
    serializes its partition to a staged ``_tmp`` file and returns a
    ``WriterCommitMessage``; the driver's ``commit`` renames the staged
    files into place atomically (readers ignoring ``_tmp_*`` see none or
    all — the two-phase-commit contract every production sink
    implements; the abort path is unit-tested with an injected task
    failure). The gate is a full round trip: orders flow THROUGH the
    custom sink as pipe-joined lines, are read back and re-parsed, and
    the grand totals must hash-match the oracle computed straight from
    the parquet — a lost partition, duplicated commit, or mangled
    serialization shifts count/sum/distinct.

    Scale: task-side writes are embarrassingly parallel; the commit is
    O(partitions) driver work on paths, not data — the same asymmetry
    as a manifest commit on an object store. The line codec is
    integer/string only, so the round trip is byte-deterministic."""
    import os

    from kinesis_sample_spark.catalog import load_table
    from kinesis_sample_spark.scratch import scratch_dir
    from kinesis_sample_spark.sources.python_sink import SINK_NAME, register_sinks

    register_sinks(spark)
    out = scratch_dir(prefix="kss_pysink_")
    (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "o_orderkey",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS cents",
        )
        .write.format(SINK_NAME)
        .option("path", out)
        .mode("append")
        .save()
    )
    # staged _tmp files from retried task ATTEMPTS may legitimately
    # survive a successful job (only committed messages are renamed or
    # abort-cleaned) — atomicity is that readers see committed names
    # only, which the part-* glob below enforces
    parsed = _read_piped_lines(
        spark, os.path.join(out, "part-*.lines"),
        "o_orderkey:BIGINT", "cents:BIGINT",
    )
    return parsed.selectExpr(
        "CAST(count(*) AS BIGINT) AS n_rows",
        "CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys",
        "CAST(sum(cents) AS BIGINT) AS cents",
        "CAST(min(o_orderkey) AS BIGINT) AS min_key",
        "CAST(max(o_orderkey) AS BIGINT) AS max_key",
    )


# ---------------------------------------------------------------------------
# q349 — fully custom Python pipeline: streaming source -> streaming sink.
# ---------------------------------------------------------------------------
_S349_ROWS = 1500


@query(
    "q349_live_python_stream_pipeline",
    oracle=f"""
WITH gen AS (
  SELECT seq, seq % {_SHARDS} AS shard
  FROM generate_series(0, {_S349_ROWS - 1}) t(seq)
)
SELECT 'shardId-' || lpad(CAST(shard AS VARCHAR), 12, '0') AS shard_id,
       count(*) AS n_records,
       count(DISTINCT seq) AS n_distinct_seq,
       CAST(min(seq) AS BIGINT) AS min_seq,
       CAST(max(seq) AS BIGINT) AS max_seq
FROM gen
GROUP BY 1 ORDER BY shard_id
""",
)
def q349_live_python_stream_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fully custom Python micro-batch pipeline: the q347 STREAMING
    source feeds the Python STREAMING sink (``streamWriter`` — the last
    unexercised half of the Python DataSource API). Per micro-batch,
    tasks stage their partitions and the driver's ``commit(messages,
    batchId)`` renames them under batchId-prefixed names — which makes a
    REPLAYED batch idempotent by construction (same batchId, same names,
    rename overwrites; the at-least-once engine + idempotent sink =
    exactly-once, the A13/A14 composition, and precisely what the
    foreachBatch+DLQ path does with parquet elsewhere in this repo).
    The gate reads the committed files back and per-shard counts,
    distinct sequence numbers and ranges must match the closed-form
    oracle — a dropped message, double commit, or non-idempotent replay
    shifts n_records vs n_distinct_seq.

    Scale: both halves are shard-parallel; driver work is offset algebra
    plus O(partitions) renames per batch. sf_dir is unused — the source
    generates its records."""
    import os

    from kinesis_sample_spark.scratch import scratch_dir
    from kinesis_sample_spark.sources.producer_source import (
        STREAM_SOURCE_NAME,
        register_stream,
    )
    from kinesis_sample_spark.sources.python_sink import (
        STREAM_SINK_NAME,
        register_sinks,
    )

    register_stream(spark)
    register_sinks(spark)
    work = scratch_dir(prefix="kss_pypipe_")
    out = os.path.join(work, "out")
    os.makedirs(out, exist_ok=True)
    _drain_available_now(
        spark.readStream.format(STREAM_SOURCE_NAME)
        .option("rows", str(_S349_ROWS))
        .load()
        .writeStream.format(STREAM_SINK_NAME)
        .option("path", out)
        .option("checkpointLocation", os.path.join(work, "ck"))
    )
    # retried task attempts may leave _tmp debris; the committed-name
    # glob is the atomicity boundary (see q348)
    parsed = _read_piped_lines(
        spark, os.path.join(out, "b*.lines"), "seq:BIGINT", "shard_id:string"
    )
    return (
        parsed.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_records"),
            F.countDistinct("seq").alias("n_distinct_seq"),
            F.min("seq").alias("min_seq"),
            F.max("seq").alias("max_seq"),
        )
        .orderBy("shard_id")
    )


# ---------------------------------------------------------------------------
# q350 — row-level ForeachWriter sink (open/process/close lifecycle).
# ---------------------------------------------------------------------------
_S350_ROWS = 800


class _LineForeachWriter:
    """Row-level streaming sink with the ForeachWriter lifecycle —
    ``open(partitionId, epochId) -> process(row)* -> close(error)`` per
    partition per epoch. This is the reference's per-record processor
    hook (Consumer processSingleRecord, SURVEY A8/A11) as Spark exposes
    it: the engine is at-least-once, so the writer makes itself
    idempotent by DETERMINISTIC NAMING — output file
    ``e<epochId>-p<partitionId>`` means a replayed epoch overwrites its
    own previous attempt instead of duplicating. Picklable by
    construction (stdlib only, state opened lazily in ``open``)."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self._f = None

    def open(self, partition_id: int, epoch_id: int) -> bool:
        import os

        path = os.path.join(self.out_dir, f"e{epoch_id}-p{partition_id}.lines")
        self._f = open(path, "w", encoding="utf-8")
        return True

    def process(self, row) -> None:
        self._f.write(f"{row.sequence_number}|{row.shard_id}\n")

    def close(self, error) -> None:
        if self._f is not None:
            self._f.close()
            self._f = None


@query(
    "q350_live_foreach_row_sink",
    oracle=f"""
WITH gen AS (
  SELECT seq, seq % {_SHARDS} AS shard
  FROM generate_series(0, {_S350_ROWS - 1}) t(seq)
)
SELECT 'shardId-' || lpad(CAST(shard AS VARCHAR), 12, '0') AS shard_id,
       count(*) AS n_records,
       count(DISTINCT seq) AS n_distinct_seq,
       CAST(min(seq) AS BIGINT) AS min_seq,
       CAST(max(seq) AS BIGINT) AS max_seq
FROM gen
GROUP BY 1 ORDER BY shard_id
""",
)
def q350_live_foreach_row_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE row-level ``foreach`` sink — the last streaming-sink surface
    (foreachBatch is A10/A11's home; this is its per-ROW sibling, the
    shape of the reference's processSingleRecord hook): the engine calls
    ``open(partitionId, epochId)`` once per partition per micro-batch,
    ``process`` per record, ``close`` at partition end — all executor-
    side, no driver coordination beyond the epoch. Idempotence under
    at-least-once comes from deterministic epoch-partition file naming
    (a replayed epoch overwrites itself), the same law q349's batchId
    commit pins at the sink level. The gate drains the q347 producer
    source through the writer and hash-checks the read-back per-shard
    counts, distinct sequence numbers and ranges against the
    closed-form oracle — duplicates from a non-idempotent replay, or a
    lost partition file, shift n_records vs n_distinct_seq.

    Scale: pure task-side row writes; the trade vs foreachBatch is no
    batch-level transaction — exactly why the naming carries the
    idempotence. sf_dir is unused — the source generates its records."""
    import os

    from kinesis_sample_spark.scratch import scratch_dir
    from kinesis_sample_spark.sources.producer_source import (
        STREAM_SOURCE_NAME,
        register_stream,
    )

    register_stream(spark)
    work = scratch_dir(prefix="kss_foreach_")
    out = os.path.join(work, "out")
    os.makedirs(out, exist_ok=True)
    _drain_available_now(
        spark.readStream.format(STREAM_SOURCE_NAME)
        .option("rows", str(_S350_ROWS))
        .load()
        .writeStream.foreach(_LineForeachWriter(out))
        .option("checkpointLocation", os.path.join(work, "ck"))
    )
    parsed = _read_piped_lines(
        spark, os.path.join(out, "e*-p*.lines"), "seq:BIGINT", "shard_id:string"
    )
    return (
        parsed.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_records"),
            F.countDistinct("seq").alias("n_distinct_seq"),
            F.min("seq").alias("min_seq"),
            F.max("seq").alias("max_seq"),
        )
        .orderBy("shard_id")
    )
