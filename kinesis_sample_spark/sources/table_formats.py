"""Lakehouse table formats (Delta / Iceberg / Hudi) — capability-gated.

Their jars are not in this image (engine rule: stub connectors behind an
import-try / capability check, never a hard dependency). Where a format is
unavailable the engine's portable fallbacks cover the core semantics:

- MERGE INTO            → operators/upsert.py (last-writer-wins emulation)
- time travel           → versioned parquet directories (write-once paths)
- schema evolution      → mergeSchema on read + explicit casts
- streaming upsert sink → operators/upsert.foreach_batch_upsert
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMATS = {
    "delta": ("delta", "io.delta.sql.DeltaSparkSessionExtension"),
    "iceberg": ("iceberg", "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"),
    "hudi": ("hudi", "org.apache.spark.sql.hudi.HoodieSparkSessionExtension"),
}


def format_available(spark: SparkSession, fmt: str) -> bool:
    """True when the format's datasource is loadable in this JVM."""
    if fmt not in _FORMATS:
        raise KeyError(f"unknown table format {fmt!r}; known: {sorted(_FORMATS)}")
    try:
        spark.read.format(_FORMATS[fmt][0]).load("/nonexistent-probe-path")
        return True  # pragma: no cover — would need the jar present
    except Exception as exc:  # noqa: BLE001 — classify by message
        msg = str(exc)
        # datasource resolved but path missing ⇒ jar IS present
        return "PATH_NOT_FOUND" in msg or "DATA_SOURCE_NOT_FOUND" not in msg and "Failed to find" not in msg


def read_table(spark: SparkSession, fmt: str, path: str) -> DataFrame:
    """Read a lakehouse table, or raise with the portable fallback named."""
    if not format_available(spark, fmt):
        raise RuntimeError(
            f"{fmt} jars are not on the classpath. Portable fallbacks: "
            "parquet + operators/upsert.py (MERGE), versioned directories "
            "(time travel). Add the connector jar to enable native "
            f"{fmt} reads."
        )
    return spark.read.format(_FORMATS[fmt][0]).load(path)  # pragma: no cover
