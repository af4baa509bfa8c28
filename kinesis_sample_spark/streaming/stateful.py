"""Custom stateful streaming operators — applyInPandasWithState.

SURVEY.md §2 Table B ("Streaming: stateful ops"): beyond managed window
state, the engine exposes arbitrary per-key state. The flagship use is the
reference's A11 bookkeeping made stateful: per-key running record counts
and last-seen tracking that survive across micro-batches via the state
store (checkpointed exactly like offsets).

Scale: state is per key, partitioned with the stream; the watermark-driven
timeout (GroupStateTimeout) bounds retention so abandoned keys are evicted
— state size tracks *active* keys, not history.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "partitionKey string, n_records bigint, total_batches int"
STATE_SCHEMA = "n bigint, batches int"


def _track_counts(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key running totals: accumulate record count and batch count in
    the state store; emit the running value each time the key appears."""
    n, batches = state.get if state.exists else (0, 0)
    seen = 0
    for pdf in pdfs:
        seen += len(pdf)
    n += seen
    batches += 1
    state.update((n, batches))
    yield pd.DataFrame(
        {"partitionKey": [key[0]], "n_records": [n], "total_batches": [batches]}
    )


def stateful_key_counts(env: DataFrame) -> DataFrame:
    """Running per-partitionKey record counts across micro-batches — the
    stateful generalization of the reference's per-shard 'Processing N
    records' log line (Proc:167). Update output mode: each batch emits the
    keys it touched with their new running totals."""
    return env.groupBy("partitionKey").applyInPandasWithState(
        _track_counts,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# A11 — bounded per-record retry with attempt bookkeeping.
# ---------------------------------------------------------------------------
RETRY_OUTPUT_SCHEMA = (
    "sequenceNumber string, result string, ok boolean, attempts int, dlq_reason string"
)
RETRY_STATE_SCHEMA = "attempts int, exhausted boolean"


def retry_process(
    env: DataFrame,
    process,
    *,
    max_attempts: int = 10,
    backoff_s: float = 0.0,
):
    """The reference's per-record retry loop (Proc:63-91: up to 10
    attempts, 3 s backoff, then skip) as a stateful streaming operator —
    with two fidelity upgrades over the reference:

    - the skipped record is not silent: it lands in the output with
      ``ok = false`` and ``attempts = max_attempts`` (callers split it to
      the DLQ via :func:`kinesis_sample_spark.streaming.dlq.split_dlq`-style
      filtering on ``ok``), and
    - the attempt count lives in the state store, keyed by
      ``sequenceNumber``: a poison record redelivered after a lease loss /
      micro-batch replay (A14) short-circuits straight to the DLQ row
      instead of burning another ``max_attempts`` executions.

    ``process(payload: str, attempt: int) -> str`` runs executor-side
    (Arrow-batched); a raise counts as a failed attempt. Retries within
    one trigger are synchronous with ``backoff_s`` sleep between attempts,
    exactly like the reference's loop; state is per-record and removed on
    success, so state size tracks in-flight + poison records only."""
    import time

    def _retry(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        seq = key[0]
        prior_attempts, exhausted = state.get if state.exists else (0, False)
        rows = []
        for pdf in pdfs:
            for payload in pdf["payload"]:
                if exhausted:
                    # redelivered poison: report, don't re-execute
                    rows.append((seq, None, False, prior_attempts, "exhausted:redelivered"))
                    continue
                err = None
                attempt = prior_attempts
                while attempt < max_attempts:
                    attempt += 1
                    try:
                        result = process(payload, attempt)
                        rows.append((seq, result, True, attempt, None))
                        err = None
                        break
                    except Exception as e:  # noqa: BLE001 — any raise = failed attempt
                        err = f"{type(e).__name__}: {e}"
                        if attempt < max_attempts and backoff_s:
                            time.sleep(backoff_s)
                else:
                    exhausted = True
                    prior_attempts = attempt
                    rows.append((seq, None, False, attempt, err))
        if exhausted:
            state.update((prior_attempts, True))
        elif state.exists:
            state.remove()
        yield pd.DataFrame(
            rows, columns=["sequenceNumber", "result", "ok", "attempts", "dlq_reason"]
        )

    decoded = env.select(
        "sequenceNumber",
        F.col("data").cast("string").alias("payload"),
    )
    return decoded.groupBy("sequenceNumber").applyInPandasWithState(
        _retry,
        outputStructType=RETRY_OUTPUT_SCHEMA,
        stateStructType=RETRY_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Event-time timeout sessions — the GroupState TIMEOUT path made live.
# ---------------------------------------------------------------------------
SESSION_OUTPUT_SCHEMA = "user_id bigint, session_start timestamp, n_events bigint"
SESSION_STATE_SCHEMA = "start_us long, last_us long, n long"

_US_PER_MS = 1000


def timeout_sessions(stream: DataFrame, gap_ms: int) -> DataFrame:
    """Custom session windows over ``(user_id, ts)`` where the per-key
    *trailing* session is closed by a ``GroupStateTimeout.EventTimeTimeout``
    firing — the one GroupState feature the live shelf's other stateful
    queries never exercise (q82/q184 run NoTimeout; q131 uses the managed
    ``session_window``; q171 is transformWithState). Two close paths:

    - **gap**: a later event for the key arrives (same batch or a later
      one) more than ``gap_ms`` after the open session's last event — the
      processor closes the island in-function, exactly the gaps-and-islands
      split, on exact microsecond arithmetic;
    - **timeout**: the event-time watermark passes ``floor_ms(last_event) +
      gap_ms`` and Spark invokes the processor with ``state.hasTimedOut``
      and *no data* for the key — the session is emitted and state removed.

    Which path closes a given session depends on batch boundaries, so the
    emitted SET is batch-invariant but the per-row close reason is not —
    callers that need parity-stable output should project the three data
    columns only. Sessions still open when the final watermark stops short
    of their deadline are *never* emitted (state would be carried into the
    next incarnation via the checkpoint).

    Timeout timestamps are set on the millisecond floor of the last event
    (the state store's timeout clock is ms); the gap split itself compares
    raw microseconds, so the two engines in the oracle pair can only
    diverge if a session deadline lands within 1 ms of the final watermark
    — the fixtures keep >20 s of margin (measured at sf0.1).

    Scale: state is one 3-long tuple per *active* key, evicted by the
    timeout as soon as the watermark passes its deadline — retention is
    bounded by ``gap + watermark delay`` of event time, independent of
    history length. Each micro-batch shuffles only that batch's rows by
    key: the standard keyed-state topology (A8), with the timeout scan
    local to the state store partition."""
    gap_us = gap_ms * _US_PER_MS

    def _proc(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "n_events": [n],
                }
            )
            return
        ts = pd.concat([p["ts"] for p in pdfs]).sort_values()
        us = (ts.astype("int64") // 1000).to_numpy()  # ns -> us
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = int(us[0]), int(us[0]), 0
        rows = []
        for t in us:
            t = int(t)
            if t - last_us > gap_us:
                rows.append((key[0], pd.Timestamp(start_us, unit="us"), n))
                start_us, n = t, 0
            last_us = t
            n += 1
        state.update((start_us, last_us, n))
        state.setTimeoutTimestamp(last_us // _US_PER_MS + gap_ms)
        if rows:
            yield pd.DataFrame(
                rows, columns=["user_id", "session_start", "n_events"]
            )

    return stream.groupBy("user_id").applyInPandasWithState(
        _proc,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
