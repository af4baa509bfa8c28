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


def _file_stat_widths(path, col_idx, col_name):
    """Per-file (max-min) stat width for one column, plus the global span."""
    widths, gmin, gmax = [], None, None
    for f in parquet_data_files(path):
        md = pq.ParquetFile(f).metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(col_idx)
            assert col.path_in_schema == col_name
            mins.append(col.statistics.min)
            maxs.append(col.statistics.max)
        lo, hi = min(mins), max(maxs)
        widths.append(hi - lo)
        gmin = lo if gmin is None else min(gmin, lo)
        gmax = hi if gmax is None else max(gmax, hi)
    return widths, gmax - gmin


def test_zorder_keeps_stats_tight_on_both_dimensions(spark, tmp_path):
    """Morton clustering must narrow per-file min/max on BOTH columns;
    single-column range clustering (the negative control) leaves the
    second column's per-file range at ~the full domain."""
    from kinesis_sample_spark.sources.maintenance import zorder_parquet

    zpath = os.path.join(str(tmp_path), "zorder")
    rpath = os.path.join(str(tmp_path), "range1d")
    ev = load_table(spark, SF, "events").select("event_id", "user_id", "value")
    zorder_parquet(ev, zpath, ["user_id", "value"], n_files=16)
    cluster_parquet(ev, rpath, ["user_id"], n_files=16)

    # data is untouched by the rewrite
    before = _fingerprint(ev)
    after = _fingerprint(spark.read.parquet(zpath))
    assert (before["n"], before["fp"]) == (after["n"], after["fp"])

    # z-order: both dimensions stay tight (16 files ≈ 4×4 grid → ~25% span each)
    for idx, name in ((1, "user_id"), (2, "value")):
        widths, span = _file_stat_widths(zpath, idx, name)
        assert len(widths) >= 8
        assert sum(widths) / len(widths) < 0.5 * span, (
            f"z-order left {name} wide: {widths} vs span {span}"
        )

    # negative control: 1-D clustering on user_id leaves value's per-file
    # range markedly wider than the z-ordered layout does
    zw, zspan = _file_stat_widths(zpath, 2, "value")
    rw, rspan = _file_stat_widths(rpath, 2, "value")
    z_ratio = sum(zw) / len(zw) / zspan
    r_ratio = sum(rw) / len(rw) / rspan
    assert r_ratio > 1.4 * z_ratio, f"control {r_ratio:.2f} vs zorder {z_ratio:.2f}"
