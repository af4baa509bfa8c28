"""applyInPandasWithState + stream-stream join behavior tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.sources.files import replay_events_stream, write_stream_fixture
from kinesis_sample_spark.streaming.envelope import envelope_from_events
from kinesis_sample_spark.streaming.stateful import stateful_key_counts

SF = "/root/testdata/sf0.001"


def test_stateful_counts_accumulate_across_batches(spark, tmp_path):
    """State survives micro-batch boundaries: with one file per trigger,
    the final running count per key equals the batch groupBy count."""
    events_dir = write_stream_fixture(spark, SF, str(tmp_path), n_files=4)
    env = envelope_from_events(replay_events_stream(spark, events_dir, files_per_trigger=1))
    q = (
        stateful_key_counts(env)
        .writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # update mode appends one row per (key, batch) — the last row per key
    # is the running total; compare against batch ground truth
    final = spark.sql(
        """
        SELECT partitionKey, n_records, total_batches FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY partitionKey
                                         ORDER BY n_records DESC) rn
            FROM t_state
        ) WHERE rn = 1
        """
    )
    expected = (
        envelope_from_events(load_table(spark, SF, "events"))
        .groupBy("partitionKey")
        .agg(F.count("*").alias("n_records"))
    )
    diff = (
        final.select("partitionKey", "n_records")
        .exceptAll(expected)
        .unionByName(expected.exceptAll(final.select("partitionKey", "n_records")))
    )
    assert diff.count() == 0
    # and at least one key must have been seen in >1 batch (state carried)
    assert final.filter(F.col("total_batches") > 1).count() > 0


def test_stream_stream_join_with_watermarks(spark, tmp_path):
    """Stream-stream inner join (purchases ⋈ views within ±1 h per user) —
    watermarks on both sides bound the join state. Result checked against
    the identical batch join."""
    events_dir = write_stream_fixture(spark, SF, str(tmp_path), n_files=4)

    def _split(df):
        purchases = (
            df.filter(F.col("event_type") == "purchase")
            .select("user_id", F.col("event_id").alias("p_id"), F.col("ts").alias("p_ts"))
            .withWatermark("p_ts", "40 days")
        )
        views = (
            df.filter(F.col("event_type") == "view")
            .select(F.col("user_id").alias("v_user"), F.col("event_id").alias("v_id"),
                    F.col("ts").alias("v_ts"))
            .withWatermark("v_ts", "40 days")
        )
        return purchases, views

    sp, sv = _split(replay_events_stream(spark, events_dir))
    cond = (
        (F.col("user_id") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("v_ts") <= F.col("p_ts"))
    )
    q = (
        sp.join(sv, cond)
        .select("user_id", "p_id", "v_id")
        .writeStream.format("memory")
        .queryName("t_ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("SELECT * FROM t_ssj")

    bp, bv = _split(load_table(spark, SF, "events"))
    expected = bp.join(bv, cond).select("user_id", "p_id", "v_id")
    assert streamed.exceptAll(expected).count() == 0
    assert expected.exceptAll(streamed).count() == 0
    assert streamed.count() > 0


def test_retry_process_bounded_attempts_then_dlq(spark, tmp_path):
    """A11 fidelity (Proc:63-91): a poison record is attempted exactly
    max_attempts times then surfaced with ok=false and its attempt count
    (not silently skipped); a transiently-failing record succeeds on the
    attempt where the failure clears; healthy records pass first try."""
    from kinesis_sample_spark.streaming.stateful import retry_process

    events_dir = write_stream_fixture(spark, SF, str(tmp_path), n_files=2)
    env = envelope_from_events(replay_events_stream(spark, events_dir, files_per_trigger=1))

    def process(payload: str, attempt: int) -> str:
        if payload.endswith("0"):          # permanent poison
            raise ValueError(payload)
        if payload.endswith("1") and attempt < 2:  # transient: clears on attempt 2
            raise ValueError(payload)
        return payload

    q = (
        retry_process(env, process, max_attempts=3)
        .writeStream.format("memory")
        .queryName("t_retry")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM t_retry").collect()
    assert rows
    poison = [r for r in rows if not r["ok"]]
    assert poison, "fixture should contain payloads ending in '0'"
    for r in poison:
        assert r["attempts"] == 3
        assert r["result"] is None
        assert "ValueError" in r["dlq_reason"]
        assert r["dlq_reason"].endswith("0")
    for r in rows:
        if not r["ok"]:
            continue
        assert r["attempts"] == (2 if r["result"].endswith("1") else 1)


def test_retry_process_redelivery_short_circuits(spark, tmp_path):
    """The state-store half of A11 (q184 covers single delivery): after a
    poison record exhausts its attempts, a REDELIVERY in a later
    micro-batch (the A14 lease-lost replay) must short-circuit straight
    to a DLQ row — ``exhausted:redelivered`` with the prior attempt
    count — instead of burning another max_attempts executions."""
    import glob
    import os
    import shutil
    import time as _t

    from kinesis_sample_spark.streaming.stateful import retry_process

    events_dir = write_stream_fixture(spark, SF, str(tmp_path), n_files=2)
    # duplicate every file with a LATER mtime: the file source orders by
    # modification time, so the copies arrive as later micro-batches —
    # a replayed delivery of every record after state already exists
    parts = sorted(glob.glob(os.path.join(events_dir, "*.parquet")))
    now = _t.time()
    for i, p in enumerate(parts):
        dup = os.path.join(events_dir, f"redelivered_{i}.parquet")
        shutil.copy(p, dup)
        os.utime(p, (now - 3600 + i, now - 3600 + i))
        os.utime(dup, (now - 1800 + i, now - 1800 + i))

    env = envelope_from_events(
        replay_events_stream(spark, events_dir, files_per_trigger=1)
    )

    def process(payload: str, attempt: int) -> str:
        if payload.endswith("0"):  # permanent poison
            raise ValueError(payload)
        return payload

    q = (
        retry_process(env, process, max_attempts=3)
        .writeStream.format("memory")
        .queryName("t_retry_redeliver")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM t_retry_redeliver").collect()

    by_seq: dict[str, list] = {}
    for r in rows:
        by_seq.setdefault(r["sequenceNumber"], []).append(r)
    poison_seqs = {s for s, rs in by_seq.items() if any(not r["ok"] for r in rs)}
    assert poison_seqs, "fixture should contain payloads ending in '0'"
    redelivered_total = 0
    for s in poison_seqs:
        reasons = sorted(r["dlq_reason"] for r in by_seq[s])
        # first delivery exhausts (ValueError recorded), replay short-circuits
        assert any(x.startswith("ValueError") for x in reasons), reasons
        short = [r for r in by_seq[s] if r["dlq_reason"] == "exhausted:redelivered"]
        redelivered_total += len(short)
        for r in short:
            assert not r["ok"]
            assert r["attempts"] == 3  # prior count surfaced, NOT re-executed
    assert redelivered_total > 0, "no redelivery ever hit the short-circuit path"
    # healthy records simply process again on redelivery (at-least-once)
    healthy = [s for s, rs in by_seq.items() if all(r["ok"] for r in rs)]
    assert healthy and all(len(by_seq[s]) == 2 for s in healthy)


def test_q328_timeout_sessions_third_impl(spark):
    """q328 re-derived in pure pandas: gaps-and-islands sessions (exact
    microsecond arithmetic) filtered by the emittability rule — a later
    same-key event exists, OR the ms-floored deadline is STRICTLY below
    the final watermark (ms-floored max ts - 1 h). Spark evicts only
    when timeoutTimestamp < eviction watermark — verified by a synthetic
    deadline == watermark fixture that did NOT fire — and the code,
    the oracle, and the _SESSION_CLOSED_SQL comment all use the same
    strict-< rule. The per-user LAST islands that
    pass the rule can only surface via state.hasTimedOut (no later event
    ever arrives for the key), so their presence proves the timeout path
    fired; the last islands that fail it prove the watermark gate
    withholds still-open state."""
    import pandas as pd

    from kinesis_sample_spark.queries import load_registry

    ev = pd.read_parquet(f"{SF}/events.parquet")[["user_id", "ts"]]
    # normalize to explicit microseconds — read_parquet yields
    # datetime64[us] here, while the UDF's Arrow series is datetime64[ns]
    ev["us"] = ev.ts.astype("datetime64[us]").astype("int64")
    gap_us = 2 * 3600 * 1000 * 1000
    wm_us = ((ev.us.max() // 1000) * 1000) - 3600 * 1000 * 1000
    expected, timeout_only, withheld = [], 0, 0
    for uid, g in ev.sort_values("us").groupby("user_id"):
        us = g.us.to_numpy()
        islands, start, n = [], int(us[0]), 0
        last = start
        for t in us:
            t = int(t)
            if t - last > gap_us:
                islands.append((start, last, n))
                start, n = t, 0
            last = t
            n += 1
        islands.append((start, last, n))
        for i, (st, en, cnt) in enumerate(islands):
            trailing = i == len(islands) - 1
            deadline = (en // 1000) * 1000 + gap_us
            if not trailing or deadline < wm_us:
                expected.append((uid, st, cnt))
                timeout_only += trailing
            else:
                withheld += trailing
    assert timeout_only > 0 and withheld > 0  # both branches represented

    rows = load_registry()["q328_live_session_timeout"].fn(spark, SF).collect()
    got = sorted((r.user_id, r.session_start.timestamp() * 1e6, r.n_events) for r in rows)
    exp = sorted((u, float(st), n) for (u, st, n) in expected)
    assert [(u, round(t), n) for (u, t, n) in got] == [
        (u, round(t), n) for (u, t, n) in exp
    ]


def test_q331_state_store_conservation(spark):
    """The statestore read and the emitted sessions must PARTITION the
    pandas-derived gaps-and-islands sessions: every island is either
    emitted (counted in n_sessions_emitted) or retained in the store
    with the operator's exact timeout arithmetic — and the metadata
    columns prove the no-data batch ran (maxBatchId 4 on 4 data
    files)."""
    import pandas as pd

    from kinesis_sample_spark.queries import load_registry

    ev = pd.read_parquet(f"{SF}/events.parquet")[["user_id", "ts"]]
    ev["us"] = ev.ts.astype("datetime64[us]").astype("int64")
    gap_us = 2 * 3600 * 1000 * 1000
    wm_us = ((ev.us.max() // 1000) * 1000) - 3600 * 1000 * 1000
    n_islands, expected_open = 0, []
    for uid, g in ev.sort_values("us").groupby("user_id"):
        us = g.us.to_numpy()
        islands, start, n = [], int(us[0]), 0
        last = start
        for t in us:
            t = int(t)
            if t - last > gap_us:
                islands.append((start, last, n))
                start, n = t, 0
            last = t
            n += 1
        islands.append((start, last, n))
        n_islands += len(islands)
        st, en, cnt = islands[-1]
        if (en // 1000) * 1000 + gap_us >= wm_us:
            expected_open.append((uid, st, en, cnt, en // 1000 + 7_200_000))

    rows = load_registry()["q331_live_state_store_audit"].fn(spark, SF).collect()
    got = [
        (
            r.user_id,
            (r.session_start - pd.Timestamp(0)) // pd.Timedelta(microseconds=1),
            (r.last_event - pd.Timestamp(0)) // pd.Timedelta(microseconds=1),
            r.n_events,
            r.timeout_ms,
        )
        for r in rows
    ]
    assert sorted(got) == sorted(expected_open)
    assert rows, "fixture must leave at least one open session"
    r0 = rows[0]
    assert r0.n_sessions_emitted + len(rows) == n_islands  # conservation
    assert r0.operator_name == "applyInPandasWithState"
    assert r0.last_batch_id == 4  # 4 file batches + the no-data batch


def test_twsip_capability_probe():
    """Environment probe for the DESIGN_r16 dead candidate: the
    transformWithStateInPandas state protocol needs google.protobuf,
    absent from this container, so q171 runs its semantics through the
    applyInPandasWithState fallback. This test keeps that judgement
    LIVE instead of frozen: if the environment ever gains protobuf it
    fails loudly with marching orders (promote q171 to the native path,
    build the event-time timer query the r14 verdict asked for), and
    while protobuf stays absent it asserts the fallback machinery still
    constructs cleanly — the processor factory must keep working on
    every Spark upgrade even though the native branch can't run here."""
    from kinesis_sample_spark.queries.streaming_live import (
        _make_running_stats_processor,
        _twsip_available,
    )

    if _twsip_available():
        raise AssertionError(
            "google.protobuf is now importable: transformWithStateInPandas "
            "(timers, ListState/MapState — DESIGN_r16's rejected candidate) "
            "is LIVE in this environment. Promote q171 to the native path "
            "and add the registerTimer/handleExpiredTimer query."
        )
    proc = _make_running_stats_processor()
    # the factory returns a real StatefulProcessor instance whose native
    # implementation stays deploy-ready (init/handleInputRows/close)
    for attr in ("init", "handleInputRows", "close"):
        assert callable(getattr(proc, attr))
