"""Source formats (Table B "Scans/sources"): JSON and CSV roundtrips with
explicit schemas (never inferSchema in production — it is an extra full
read), plus the RocksDB state store provider for stateful streaming.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.sources.files import EVENTS_SCHEMA, replay_events_stream, write_stream_fixture
from kinesis_sample_spark.streaming.envelope import envelope_from_events
from kinesis_sample_spark.streaming.pipeline import use_rocksdb_state
from kinesis_sample_spark.streaming.stateful import stateful_key_counts

SF = "/root/testdata/sf0.001"


def _events(spark):
    return load_table(spark, SF, "events")


def test_json_roundtrip_with_schema(spark, tmp_path):
    src = _events(spark)
    path = str(tmp_path / "events_json")
    src.write.mode("overwrite").json(path)
    back = spark.read.schema(EVENTS_SCHEMA).json(path)
    assert back.count() == src.count()
    assert back.schema == EVENTS_SCHEMA
    # value fidelity on a sample column (timestamps survive ISO round trip)
    assert (
        back.select(F.sum(F.col("event_id")).alias("s")).collect()[0].s
        == src.select(F.sum(F.col("event_id")).alias("s")).collect()[0].s
    )


def test_csv_roundtrip_with_schema(spark, tmp_path):
    src = _events(spark).drop("props")  # props contains commas/quotes — csv needs quoting anyway
    path = str(tmp_path / "events_csv")
    # default csv timestampFormat truncates to millis — pin a micros format
    ts_fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    src.write.mode("overwrite").option("header", True).option("timestampFormat", ts_fmt).csv(path)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    back = (
        spark.read.schema(schema)
        .option("header", True)
        .option("timestampFormat", ts_fmt)
        .csv(path)
    )
    assert back.count() == src.count()
    diff = back.exceptAll(src).count() + src.exceptAll(back).count()
    assert diff == 0


def test_malformed_json_goes_to_corrupt_column(spark, tmp_path):
    """PERMISSIVE mode + _corrupt_record — the batch-source analog of the
    streaming DLQ (SURVEY.md §2 A11 mapping)."""
    p = tmp_path / "bad.json"
    p.write_text('{"event_id": 1, "user_id": 2}\n{not json at all}\n')
    schema = "event_id long, user_id long, _corrupt_record string"
    df = spark.read.schema(schema).json(str(p)).cache()
    try:
        assert df.filter(F.col("_corrupt_record").isNotNull()).count() == 1
        assert df.filter(F.col("event_id") == 1).count() == 1
    finally:
        df.unpersist()


def test_stateful_query_on_rocksdb_state_store(spark, tmp_path):
    """The RocksDB provider must run the same stateful pipeline unchanged
    (state off-heap, incremental checkpoints — the 100 TB configuration)."""
    use_rocksdb_state(spark, True)
    try:
        events_dir = write_stream_fixture(spark, SF, str(tmp_path), n_files=3)
        env = envelope_from_events(
            replay_events_stream(spark, events_dir, files_per_trigger=1)
        )
        q = (
            stateful_key_counts(env)
            .writeStream.format("memory")
            .queryName("t_rocks")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        total_keys = spark.sql(
            "SELECT count(DISTINCT partitionKey) AS n FROM t_rocks"
        ).collect()[0].n
        expected = _events(spark).select("user_id").distinct().count()
        assert total_keys == expected
    finally:
        use_rocksdb_state(spark, False)


def test_table_format_stub_reports_fallback(spark):
    from kinesis_sample_spark.sources.table_formats import format_available, read_table
    import pytest as _pytest

    assert format_available(spark, "delta") is False  # no jars in this image
    with _pytest.raises(RuntimeError, match="fallback"):
        read_table(spark, "delta", "/tmp/nope")
    with _pytest.raises(KeyError):
        format_available(spark, "paimon")


def test_schema_evolution_merge_schema(spark, tmp_path):
    """Long-lived 100 TB tables evolve: later ingest batches add columns.
    mergeSchema must union the schemas, null-fill history, and keep
    column pruning working against the merged relation."""
    import os

    from pyspark.sql import functions as F

    path = os.path.join(str(tmp_path), "evolving")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    orders.select("o_orderkey", "o_totalprice").write.parquet(
        os.path.join(path, "batch=1")
    )
    orders.select(
        "o_orderkey", "o_totalprice", F.lit("v2").alias("ingest_tag")
    ).write.parquet(os.path.join(path, "batch=2"))

    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(path, "batch=1"), os.path.join(path, "batch=2")
    )
    assert set(merged.columns) == {"o_orderkey", "o_totalprice", "ingest_tag"}
    n = orders.count()
    assert merged.count() == 2 * n
    # history rows are null-filled for the new column, new rows carry it
    assert merged.filter(F.col("ingest_tag").isNull()).count() == n
    assert merged.filter(F.col("ingest_tag") == "v2").count() == n


def test_kinesis_integration_smoke(spark):
    """Real-AWS integration smoke for sources/kinesis.py (A3-A7) — gated
    behind KINESIS_SMOKE_STREAM/KINESIS_SMOKE_REGION env vars because CI
    has no AWS credentials or network. When set, the admin surface must
    round-trip (describe/create-if-missing/wait/list) and the connector
    source must either load (jar present) or raise the documented
    guidance error (jar absent) — never fail silently."""
    import os

    import pytest

    stream = os.environ.get("KINESIS_SMOKE_STREAM")
    region = os.environ.get("KINESIS_SMOKE_REGION")
    if not stream or not region:
        pytest.skip("set KINESIS_SMOKE_STREAM + KINESIS_SMOKE_REGION to run")

    from kinesis_sample_spark.sources.kinesis import (
        ensure_stream,
        kinesis_source,
        list_streams,
        wait_for_active,
    )

    ensure_stream(stream, region)
    wait_for_active(stream, region)
    assert stream in list_streams(region)
    try:
        df = kinesis_source(spark, stream, region)
        assert "data" in df.columns
    except RuntimeError as e:
        assert "connector" in str(e)


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC is Spark's other built-in columnar format: round-trip the events
    table and confirm both value fidelity and that predicate pushdown
    reaches the ORC scan (search-argument pushdown appears in the plan)."""
    src = _events(spark)
    path = str(tmp_path / "events_orc")
    src.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.count() == src.count()
    assert back.schema == src.schema
    assert (
        back.agg(F.sum("event_id").alias("s")).collect()[0].s
        == src.agg(F.sum("event_id").alias("s")).collect()[0].s
    )
    plan = (
        back.filter(F.col("user_id") == 7)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "user_id" in plan.split("PushedFilters")[1][:120]


def test_producer_datasource_shards_and_payload(spark):
    """The custom Python DataSource must honor shard/row options: one
    partition per shard, disjoint round-robin sequence ranges, and the
    reference's payload format (testData-<ISO millis>)."""
    from kinesis_sample_spark.sources.producer_source import SOURCE_NAME, register

    register(spark)
    df = (
        spark.read.format(SOURCE_NAME)
        .option("rows", "40")
        .option("shards", "4")
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    rows = df.collect()
    assert len(rows) == 40
    assert sorted(r.sequence_number for r in rows) == list(range(40))
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard_id, []).append(r.sequence_number)
        assert r.data.startswith("testData-")
        assert r.partition_key.startswith("partitionKey-")
    assert len(by_shard) == 4
    for sid, seqs in by_shard.items():
        shard = int(sid.replace("shardId-", ""))
        assert sorted(seqs) == list(range(shard, 40, 4))
