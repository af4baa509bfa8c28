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
    query_id: str = ""  # lets a shared-session consumer filter to one query


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
                query_id=str(p.id),
            )
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover
        pass

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(event.id)


class ObservedMetricsListener(StreamingQueryListener):
    """Accumulates ``df.observe(name, exprs...)`` results per micro-batch
    — Spark's equivalent of the KCL's CloudWatch metric emission (A17),
    but computed inside the query plan instead of by side-channel
    instrumentation.

    Per-batch observed rows are partial aggregates over exactly that
    batch's input, so additive metrics (counts, integer sums) summed
    across batches equal the same aggregate computed over the whole
    bounded input — which is what makes an observability surface
    hash-checkable against batch SQL (the round-6 A17 live-gate
    candidate, see the DRIVER_WINDOW comment in queries/__init__.py)."""

    def __init__(self, metric_name: str) -> None:
        super().__init__()
        self.metric_name = metric_name
        self.rows: list[dict] = []

    def onQueryStarted(self, event) -> None:  # pragma: no cover — no-op
        pass

    def onQueryProgress(self, event) -> None:
        om = event.progress.observedMetrics
        row = om.get(self.metric_name) if om else None
        if row is not None:
            self.rows.append(row.asDict())

    def onQueryIdle(self, event) -> None:  # pragma: no cover
        pass

    def onQueryTerminated(self, event) -> None:  # pragma: no cover — no-op
        pass

    def totals(self) -> dict:
        """Sum each additive metric across batches (None-safe: a batch
        with no matching rows observes NULL for sum-like metrics)."""
        out: dict = {}
        for r in self.rows:
            for k, v in r.items():
                if v is not None:
                    out[k] = out.get(k, 0) + v
        return out
