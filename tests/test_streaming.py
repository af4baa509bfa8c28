"""Streaming semantics tests (SURVEY.md §5.2): run each streaming query on
a bounded file source and compare the final output against the equivalent
batch computation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.sources.files import replay_events_stream, write_stream_fixture
from kinesis_sample_spark.streaming.envelope import (
    decode_envelope,
    envelope_from_events,
    rate_producer,
)
from kinesis_sample_spark.streaming.observe import CollectingListener
from kinesis_sample_spark.streaming.pipeline import (
    consume_with_dlq,
    stop_query,
    streaming_dedup,
    streaming_window_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("stream"))
    return write_stream_fixture(spark, SF, out, n_files=4)


def _run_to_memory(stream_df, name: str, output_mode: str = "append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_envelope_roundtrip_streaming(spark, events_dir):
    """Envelope build + decode survives the streaming path; payload parses
    back to the original second-truncated event time."""
    env = envelope_from_events(replay_events_stream(spark, events_dir))
    decoded = decode_envelope(env)
    _run_to_memory(decoded.select("partitionKey", "payload", "event_ts"), "t_env")
    out = spark.sql("SELECT * FROM t_env")
    n_events = load_table(spark, SF, "events").count()
    assert out.count() == n_events
    assert out.filter(F.col("event_ts").isNull()).count() == 0
    assert out.filter(~F.col("payload").startswith("testData-")).count() == 0


def test_windowed_counts_match_batch(spark, events_dir):
    """Streaming tumbling-window counts == batch groupBy once the bounded
    stream is fully consumed. The replay files are unordered in event time,
    so the equivalence run uses a watermark wider than the fixture's span
    (no late-drops) and complete mode (every window in the final snapshot);
    production uses append + a tight watermark and accepts late-drops —
    that trade is the point of watermarks."""
    env = envelope_from_events(replay_events_stream(spark, events_dir))
    agg = streaming_window_counts(env, window="1 hour", watermark="40 days")
    _run_to_memory(agg, "t_win", output_mode="complete")
    streamed = spark.sql("SELECT w_start, partitionKey, n_records FROM t_win")

    batch_env = decode_envelope(envelope_from_events(load_table(spark, SF, "events")))
    expected = (
        batch_env.groupBy(F.window("event_ts", "1 hour").alias("w"), "partitionKey")
        .agg(F.count("*").alias("n_records"))
        .select(F.col("w.start").alias("w_start"), "partitionKey", "n_records")
    )
    assert streamed.exceptAll(expected).count() == 0
    assert expected.exceptAll(streamed).count() == 0


def test_streaming_dedup_collapses_replay(spark, events_dir):
    """A14 semantics: replaying the same records (union of the stream with
    itself via two passes) still yields each (partitionKey, sequenceNumber)
    once."""
    stream = replay_events_stream(spark, events_dir)
    # simulate at-least-once replay: duplicate every record in the batch
    doubled = stream.unionByName(stream)
    env = envelope_from_events(doubled)
    # watermark wider than the fixture's event-time span: the replay files
    # are time-unordered, and dropDuplicatesWithinWatermark would discard
    # genuinely-late rows (correct in production, wrong for equivalence).
    dedup = streaming_dedup(env, watermark="40 days")
    _run_to_memory(dedup.select("partitionKey", "sequenceNumber"), "t_dedup")
    out = spark.sql("SELECT * FROM t_dedup")
    n_events = load_table(spark, SF, "events").count()
    assert out.count() == n_events
    assert out.distinct().count() == n_events


def test_dlq_splits_poison_records(spark, events_dir, tmp_path):
    """A11 semantics, explicit: corrupt payloads land in the DLQ sink with a
    reason; good records flow through; nothing is silently dropped."""
    stream = replay_events_stream(spark, events_dir)
    env = envelope_from_events(stream)
    # poison every 10th record by truncating its payload bytes
    poisoned = env.withColumn(
        "data",
        F.when(
            F.col("sequenceNumber").cast("long") % 10 == 0,
            F.encode(F.lit("testData-NOT_A_TIMESTAMP"), "UTF-8"),
        ).otherwise(F.col("data")),
    )
    good_path = str(tmp_path / "good")
    dlq_path = str(tmp_path / "dlq")
    q = consume_with_dlq(
        poisoned, good_path, dlq_path, checkpoint=str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    n_events = load_table(spark, SF, "events").count()
    good = spark.read.parquet(good_path)
    dlq = spark.read.parquet(dlq_path)
    n_poison = n_events // 10  # sequenceNumbers 0,10,...
    assert dlq.count() == n_poison
    assert good.count() == n_events - n_poison
    assert dlq.filter(F.col("dlq_reason") != "null:event_ts").count() == 0


def test_graceful_stop_and_listener(spark, events_dir):
    """A16 graceful shutdown + A17 observability: listener sees progress;
    stop_query terminates within the 20 s budget; offsets are checkpointed
    so a restart would resume, not reprocess."""
    listener = CollectingListener()
    spark.streams.addListener(listener)
    try:
        env = envelope_from_events(replay_events_stream(spark, events_dir))
        q = (
            decode_envelope(env)
            .writeStream.format("memory")
            .queryName("t_stop")
            .trigger(availableNow=True)
            .start()
        )
        assert stop_query(q, timeout_s=20.0, drain=True)  # bounded source → drain first
        assert not q.isActive
        n_events = load_table(spark, SF, "events").count()
        # listener delivery is async — poll briefly for the tail batches
        import time

        total = 0
        for _ in range(240):  # up to 60 s — listener bus delivery is async
            total = sum(p.num_input_rows for p in listener.progress)
            if total >= n_events:
                break
            time.sleep(0.25)
        assert total == n_events
    finally:
        spark.streams.removeListener(listener)


def test_observed_metrics_accumulate_to_batch_aggregate(spark, events_dir):
    """A17 as a *checkable* metric surface: ``df.observe`` counts/sums
    accumulated across micro-batches must equal the same aggregate over
    the bounded input — the additivity law the round-6 A17 live-gate
    candidate rests on (see ObservedMetricsListener.totals)."""
    import time

    from kinesis_sample_spark.streaming.observe import ObservedMetricsListener

    listener = ObservedMetricsListener("a17")
    spark.streams.addListener(listener)
    try:
        st = replay_events_stream(spark, events_dir)
        obs = st.observe(
            "a17",
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
        )
        q = (
            obs.writeStream.format("noop")
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)
        events = load_table(spark, SF, "events")
        expected_n = events.count()
        expected_cents = events.select(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
        ).collect()[0][0]
        # listener delivery is async — poll briefly for the tail batches
        totals: dict = {}
        for _ in range(240):  # up to 60 s — listener bus delivery is async
            totals = listener.totals()
            if totals.get("n_rows", 0) >= expected_n:
                break
            time.sleep(0.25)
        assert totals["n_rows"] == expected_n
        assert totals["cents"] == expected_cents
    finally:
        spark.streams.removeListener(listener)


def test_rate_producer_envelope(spark):
    """A1/A2: the producer simulation emits schema-correct envelopes."""
    env = rate_producer(spark, rows_per_second=50)
    q = _run_to_memory(env, "t_rate")
    # rate+availableNow produces whatever was due; schema is the contract
    out = spark.sql("SELECT * FROM t_rate")
    assert set(out.columns) == {
        "data",
        "partitionKey",
        "sequenceNumber",
        "shardId",
        "approximateArrivalTimestamp",
    }


def test_streaming_session_windows_match_batch(spark, events_dir):
    """Live session_window aggregation on the replay == q25's batch result
    (complete mode + wide watermark for the bounded-equivalence run)."""
    stream = replay_events_stream(spark, events_dir)
    agg = (
        stream.withWatermark("ts", "40 days")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_sess")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("SELECT * FROM t_sess")

    batch = (
        load_table(spark, SF, "events")
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )
    assert streamed.exceptAll(batch).count() == 0
    assert batch.exceptAll(streamed).count() == 0


def test_checkpoint_resume_no_reprocessing(spark, tmp_path):
    """A9/A13/A14: restarting a drained query against the same checkpoint
    must not re-emit — offsets resume, the idempotent sink stays stable."""
    out = str(tmp_path / "resume")
    events_dir = write_stream_fixture(spark, SF, str(tmp_path), n_files=4)

    def run():
        env = envelope_from_events(replay_events_stream(spark, events_dir))
        q = consume_with_dlq(
            env, f"{out}/good", f"{out}/dlq", checkpoint=f"{out}/ckpt"
        )
        q.awaitTermination(120)

    run()
    first = spark.read.parquet(f"{out}/good").count()
    run()  # second run: same checkpoint, no new input
    assert spark.read.parquet(f"{out}/good").count() == first


def test_stream_static_join_enrichment(spark, events_dir):
    """Stream-static join: enrich the event stream with the (static)
    customer dimension — the dimension is re-read per micro-batch, no
    watermark needed on the static side. Core pattern for
    stream-time feature lookup."""
    static_users = load_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    stream = replay_events_stream(spark, events_dir)
    enriched = stream.join(static_users, "user_id", "left")
    _run_to_memory(
        enriched.select("event_id", "user_id", "c_mktsegment"), "t_enrich"
    )
    out = spark.sql("SELECT * FROM t_enrich")
    n_events = load_table(spark, SF, "events").count()
    assert out.count() == n_events
    # users 0..149 exist in customer (c_custkey range) — all should enrich
    assert out.filter(F.col("c_mktsegment").isNull()).count() == 0


def test_watermark_drops_late_rows(spark, tmp_path):
    """Late-data semantics pinned as Spark actually implements them:
    the late-record filter of a streaming aggregation uses the watermark
    as of the PREVIOUS batch (one-batch lag vs the progress-reported
    eviction watermark), and numRowsDroppedByWatermark counts dropped
    post-partial-aggregation groups, not raw rows. Three mtime-ordered
    files: fresh (advances the watermark), late#1 (arrives in the very
    next batch — still accepted under the lagged filter), late#2
    (arrives after the watermark has been in force for a full batch —
    dropped, absent from results)."""
    import datetime
    import os
    import time

    d = str(tmp_path / "late_stream")
    os.makedirs(d)
    base = datetime.datetime(2024, 6, 1, 12, 0, 0)
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    batches = [
        [(i, base + datetime.timedelta(minutes=i), 1, "click", 1.0, "{}") for i in range(10)],
        [(100 + i, base - datetime.timedelta(days=2), 2, "click", 1.0, "{}") for i in range(5)],
        [(200 + i, base - datetime.timedelta(days=3), 3, "click", 1.0, "{}") for i in range(4)],
    ]

    def _parts():
        return {f for f in os.listdir(d) if f.endswith(".parquet")}

    now = int(time.time()) - 3600
    seen = set()
    for j, rows in enumerate(batches):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(d)
        new = _parts() - seen
        for f in new:
            os.utime(os.path.join(d, f), (now + j, now + j))
        seen |= new

    st = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    agg = (
        st.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_late_drop")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    dropped = sum(
        s.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for s in p["stateOperators"]
    )
    assert dropped >= 1, "late batch was not filtered by the watermark"
    out = spark.sql("SELECT * FROM t_late_drop")
    # late#2 dropped entirely; late#1 accepted (lagged filter); fresh intact
    assert out.filter(F.col("user_id") == 3).count() == 0, "late rows leaked into results"
    assert out.filter(F.col("user_id") == 2).agg(F.sum("n")).collect()[0][0] == 5
    assert out.filter(F.col("user_id") == 1).agg(F.sum("n")).collect()[0][0] == 10


def test_stateful_checkpoint_resume(spark, tmp_path):
    """A9/A13 for STATE, not just offsets: a running per-user count whose
    state store must survive a query restart. Phase 1 drains half the
    events and stops; more files arrive; phase 2 reuses the checkpoint.
    The last emission per user across both phases must equal the full
    batch count — if state had restarted from zero, users spanning both
    halves would undercount."""
    import os

    d = str(tmp_path / "ev")
    ck = str(tmp_path / "ck")
    os.makedirs(d)
    events = load_table(spark, SF, "events")
    h1 = events.filter(F.col("event_id") % 2 == 0)
    h2 = events.filter(F.col("event_id") % 2 == 1)

    emissions_dir = str(tmp_path / "emissions")

    def run():
        st = replay_events_stream(spark, d, files_per_trigger=1)
        agg = (
            st.withWatermark("ts", "3650 days")
            .groupBy("user_id")
            .agg(F.count("*").alias("n"))
        )

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(emissions_dir)

        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    h1.coalesce(2).write.mode("append").parquet(d)
    run()
    h2.coalesce(2).write.mode("append").parquet(d)
    run()

    merged = spark.read.parquet(emissions_dir)
    final = merged.groupBy("user_id").agg(F.max("n").alias("n"))
    expected = events.groupBy("user_id").agg(F.count("*").alias("n"))
    assert final.exceptAll(expected).count() == 0
    assert expected.exceptAll(final).count() == 0
