"""Custom Python DataSource SINKS (round 16): the write-side protocol.

Spark 4's Python DataSource API has a writer half the repo had not
exercised: each TASK serializes its partition and returns a
``WriterCommitMessage``; the DRIVER commits all messages atomically
(or aborts, cleaning task leftovers). That is the two-phase commit
every real sink (parquet's _SUCCESS+manifest, a JDBC staging table, an
object-store multipart upload) implements — here distilled to its
observable contract and gated by q348/q349.

Format: one line per record, ``|``-joined fields in schema order —
deliberately trivial (strings and integers only in the gated schemas)
so the round-trip is byte-deterministic with no codec in the loop.

Task writes land as ``_tmp_*`` files; ``commit`` renames them into
``part-<jobId>-<i>`` / ``b<batchId>-<i>`` names, so a reader that ignores
``_tmp_*`` sees either none or all of a job's output — the atomicity
claim, unit-tested via the abort path in tests/test_round16_ops.py.
Batch ``overwrite`` clears committed files first (SaveMode.Overwrite);
the streaming ``commit`` receives the batchId, which makes replayed
batches idempotent by construction (same batchId → same names →
rename overwrites, never duplicates).
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

SINK_NAME = "kinesis_sample_line_sink"
STREAM_SINK_NAME = "kinesis_sample_line_stream_sink"


@dataclass
class _LineCommit(WriterCommitMessage):
    path: str
    n_rows: int


def _write_partition(out_dir: str, rows) -> _LineCommit:
    """Task side: serialize one partition to a tmp file, report it."""
    tmp = os.path.join(out_dir, f"_tmp_{uuid.uuid4().hex}.lines")
    n = 0
    with open(tmp, "w", encoding="utf-8") as f:
        for row in rows:
            f.write("|".join(str(v) for v in row) + "\n")
            n += 1
    return _LineCommit(path=tmp, n_rows=n)


class LineSinkWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        self.out_dir = options["path"]
        self.overwrite = overwrite
        # job-unique commit prefix: APPEND mode must add files, never
        # rename over a previous job's part-00000 (which would silently
        # mix two jobs' outputs) — the per-job id makes names disjoint
        self.job_id = uuid.uuid4().hex[:12]

    def write(self, rows):
        return _write_partition(self.out_dir, rows)

    def commit(self, messages):
        if self.overwrite:
            for f in os.listdir(self.out_dir):
                if f.startswith("part-"):
                    os.remove(os.path.join(self.out_dir, f))
        for i, m in enumerate(messages):
            os.rename(
                m.path,
                os.path.join(self.out_dir, f"part-{self.job_id}-{i:05d}.lines"),
            )

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class LineStreamSinkWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.out_dir = options["path"]

    def write(self, rows):
        return _write_partition(self.out_dir, rows)

    def commit(self, messages, batchId):
        # batchId in the committed name = replay idempotence: a re-run
        # of batch N renames over batch N's files instead of adding more
        for i, m in enumerate(messages):
            os.rename(
                m.path, os.path.join(self.out_dir, f"b{batchId}-{i:05d}.lines")
            )

    def abort(self, messages, batchId):
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class LineSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return SINK_NAME

    def writer(self, schema, overwrite: bool) -> LineSinkWriter:
        return LineSinkWriter(self.options, overwrite)


class LineStreamSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return STREAM_SINK_NAME

    def streamWriter(self, schema, overwrite) -> LineStreamSinkWriter:
        return LineStreamSinkWriter(self.options)


def register_sinks(spark) -> None:
    """Idempotently register both sinks on this session."""
    spark.dataSource.register(LineSink)
    spark.dataSource.register(LineStreamSink)
