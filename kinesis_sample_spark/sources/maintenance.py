"""Table maintenance: small-file compaction and range-clustered layout.

Two jobs every 100 TB parquet estate runs constantly, expressed as plain
Spark batch jobs:

- **Compaction**: streaming sinks and per-batch appends (e.g. the
  signature-store appends in operators/incremental.py, or any
  ``foreachBatch`` parquet sink) accumulate files far smaller than a scan
  task wants. Scan cost at scale is dominated by file count (driver
  listing + task scheduling + per-file open), so rewriting N tiny files
  into ceil(bytes / target) right-sized files is pure win for every
  subsequent reader.

- **Range clustering**: rewriting a table range-partitioned AND sorted on
  its dominant filter columns makes every parquet row-group's min/max
  stats tight and disjoint, so predicate pushdown skips whole files /
  row groups instead of scanning them. This is the layout half of the
  pushdown story asserted in tests/test_plans.py — the filter only helps
  if the stats let the scan skip.

Both rewrite to a fresh directory: on object stores an in-place rewrite
is not atomic — production estates swap via a metastore pointer or a
table format (see sources/table_formats.py).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def parquet_data_files(path: str) -> list[str]:
    return [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith("_")
    ]


def compact_parquet(
    spark: SparkSession,
    in_path: str,
    out_path: str,
    *,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite ``in_path`` into ~``target_bytes`` files at ``out_path``;
    returns the output file count. Sizing uses the *actual on-disk* bytes
    (already compressed), so output files land near the target without a
    pre-pass over the data."""
    total = sum(os.path.getsize(f) for f in parquet_data_files(in_path))
    n_files = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(in_path)
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return len(parquet_data_files(out_path))


def cluster_parquet(
    df: DataFrame,
    out_path: str,
    cols: list[str],
    *,
    n_files: int | None = None,
) -> None:
    """Write ``df`` range-partitioned and sorted on ``cols``: every output
    file covers a disjoint key range (range exchange boundaries) and is
    internally sorted, so min/max footer stats are as tight as they can
    be. ``repartitionByRange`` samples the keys to pick balanced
    boundaries — skew in ``cols`` yields balanced files anyway."""
    parted = (
        df.repartitionByRange(n_files, *cols)
        if n_files
        else df.repartitionByRange(*cols)
    )
    parted.sortWithinPartitions(*cols).write.mode("overwrite").parquet(out_path)
