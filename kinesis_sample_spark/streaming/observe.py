"""Observability — the reference's A17 (slf4j/MDC logs + CloudWatch
metrics via KCL metricsConfig, Cons:72/:80) mapped to Spark's
StreamingQueryListener / lastProgress.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class ProgressRecord:
    batch_id: int
    num_input_rows: int
    sink_description: str


class CollectingListener(StreamingQueryListener):
    """Collects per-batch progress (batch size ≈ the reference's
    "Processing N records" log line, Proc:167)."""

    def __init__(self) -> None:
        super().__init__()
        self.progress: list[ProgressRecord] = []
        self.started: list[str] = []
        self.terminated: list[str] = []

    def onQueryStarted(self, event) -> None:
        self.started.append(event.id)

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.progress.append(
            ProgressRecord(
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                sink_description=p.sink.description,
            )
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover
        pass

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(event.id)
