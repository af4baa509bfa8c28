"""Layout maintenance (sources/maintenance.py): compaction must shrink the
file count without touching the data; range clustering must produce
files whose parquet footer min/max ranges are disjoint — the physical
property that makes filter pushdown actually skip I/O."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.sources.maintenance import (
    cluster_parquet,
    compact_parquet,
    parquet_data_files,
)

SF = "/root/testdata/sf0.001"


def _fingerprint(df):
    # order-insensitive content check: count + bit_xor of a portable row hash
    return df.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.hash(F.col("event_id"))).alias("fp"),
    ).collect()[0]


def test_compaction_shrinks_files_preserves_content(spark, tmp_path):
    shredded = os.path.join(str(tmp_path), "shredded")
    compacted = os.path.join(str(tmp_path), "compacted")
    ev = load_table(spark, SF, "events")
    ev.repartition(64).write.parquet(shredded)
    assert len(parquet_data_files(shredded)) == 64

    n_out = compact_parquet(spark, shredded, compacted, target_bytes=256 * 1024)
    assert n_out == len(parquet_data_files(compacted))
    assert n_out < 64
    before = _fingerprint(spark.read.parquet(shredded))
    after = _fingerprint(spark.read.parquet(compacted))
    assert (before["n"], before["fp"]) == (after["n"], after["fp"])


def test_cluster_write_produces_disjoint_file_ranges(spark, tmp_path):
    clustered = os.path.join(str(tmp_path), "clustered")
    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    cluster_parquet(ev, clustered, ["event_id"], n_files=8)

    ranges = []
    for f in parquet_data_files(clustered):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # event_id
            assert col.path_in_schema == "event_id"
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        if mins:
            ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, f"overlapping file ranges: ({lo1},{hi1}) vs ({lo2},{hi2})"

    # and the full id span is covered
    assert ranges[0][0] == 0
    assert ranges[-1][1] == ev.count() - 1
