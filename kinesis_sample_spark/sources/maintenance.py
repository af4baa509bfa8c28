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

- **Z-order clustering**: single-column range clustering makes the sort
  column's stats tight but leaves every *other* column's per-file range
  at the full domain — a filter on the second column skips nothing.
  Interleaving the bits of two (or more) normalized key columns into one
  Morton code and range-clustering on *that* trades a little tightness on
  each dimension for usable min/max stats on all of them, which is how
  lakehouse engines (Delta OPTIMIZE ZORDER, Iceberg sort orders) make
  multi-predicate scans cheap.

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


_Z_BITS = 16  # bits per dimension in the Morton code (2 dims → 32-bit z-value)


def zorder_parquet(
    df: DataFrame,
    out_path: str,
    cols: list[str],
    *,
    n_files: int | None = None,
) -> None:
    """Write ``df`` clustered on the Morton (z-order) interleaving of the
    bit patterns of ``cols``, so per-file parquet min/max stats stay
    narrow on *every* listed column, not just the first.

    Each column is min/max-normalized to a ``_Z_BITS``-bit integer (the
    min/max pass is one tiny aggregate — at 100 TB it is a metadata-scale
    scan Spark serves from footer stats for raw columns), then the bits
    are interleaved JVM-side with shift/or expressions — no UDF, stays in
    whole-stage codegen. The z-value is a derived write-time column only;
    it is dropped from the stored schema.
    """
    from pyspark.sql import functions as F

    bounds = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    scale = (1 << _Z_BITS) - 1
    norm = []
    for c in cols:
        mn, mx = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
        span = (mx - mn) or 1
        norm.append(
            F.floor(
                (F.col(c).cast("double") - F.lit(float(mn)))
                / F.lit(float(span))
                * scale
            ).cast("bigint")
        )
    z = F.lit(0).cast("bigint")
    for j in range(_Z_BITS):
        for d, nc in enumerate(norm):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(nc, j).bitwiseAND(F.lit(1)),
                    j * len(norm) + d,
                )
            )
    with_z = df.withColumn("__zval", z)
    parted = (
        with_z.repartitionByRange(n_files, "__zval")
        if n_files
        else with_z.repartitionByRange("__zval")
    )
    (
        parted.sortWithinPartitions("__zval")
        .drop("__zval")
        .write.mode("overwrite")
        .parquet(out_path)
    )
