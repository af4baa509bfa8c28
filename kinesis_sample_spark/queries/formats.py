"""File-format round-trips under the value-hash gate.

tests/test_sources.py unit-tests JSON/CSV/ORC round-trips; these queries
put the same paths under the *driver* gate: each writes the events table
out in a non-parquet format, reads it back, and aggregates — while the
oracle aggregates straight from the original parquet. Any value lost or
mangled in the writer→reader round trip (float text precision, quoting,
type mapping) breaks the hash.

Double fidelity note: Spark's JSON and CSV writers serialize doubles via
Java's shortest-round-trip rendering, so read-back doubles are
bit-identical — which is exactly the property the gate checks. Timestamps
are excluded here (format-pinning is exercised in the unit tests); the
exact-decimal sum follows functions/numeric.py.

Scale: the round trip is a full write + read of the table — these are
IO-fidelity gates, not perf paths (and are deliberately NOT in the bench
set). Aggregations are partial+final as everywhere.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.functions.numeric import sql_double
from kinesis_sample_spark.queries import query
from kinesis_sample_spark.scratch import scratch_dir

_SCHEMA = "event_id bigint, user_id bigint, event_type string, value double"

_AGG_ORACLE = f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       {sql_double("SUM(CAST(value AS DECIMAL(18,6)))")} AS total_value,
       CAST(max(event_id) AS BIGINT) AS max_event_id
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def _agg(back: DataFrame) -> DataFrame:
    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
            F.max("event_id").alias("max_event_id"),
        )
        .orderBy("event_type")
    )


def _events_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )


@query("q134_json_roundtrip_agg", oracle=_AGG_ORACLE)
def q134_json_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → JSON lines on disk → schema-pinned read-back → aggregate;
    oracle reads the original parquet. Gates the JSON writer/reader pair
    end-to-end (double text precision included)."""
    out = scratch_dir(prefix="kss_json_")
    _events_subset(spark, sf_dir).write.mode("overwrite").json(out)
    return _agg(spark.read.schema(_SCHEMA).json(out))


@query("q135_csv_roundtrip_agg", oracle=_AGG_ORACLE)
def q135_csv_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same gate through the CSV writer/reader (headered, schema-pinned —
    CSV's untyped text is where quoting/precision bugs live)."""
    out = scratch_dir(prefix="kss_csv_")
    _events_subset(spark, sf_dir).write.mode("overwrite").option("header", True).csv(out)
    return _agg(spark.read.schema(_SCHEMA).option("header", True).csv(out))


@query("q136_orc_roundtrip_agg", oracle=_AGG_ORACLE)
def q136_orc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same gate through ORC (binary columnar — the second warehouse
    format next to parquet)."""
    out = scratch_dir(prefix="kss_orc_")
    _events_subset(spark, sf_dir).write.mode("overwrite").orc(out)
    return _agg(spark.read.orc(out))


# ---------------------------------------------------------------------------
# q179 — schema evolution: union across snapshots with differing columns.
# ---------------------------------------------------------------------------
@query(
    "q179_schema_evolution_union",
    oracle="""
WITH v1 AS (
  SELECT o_orderkey, o_custkey, o_totalprice
  FROM orders WHERE o_orderkey % 2 = 0
),
v2 AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 1
),
unioned AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         NULL AS o_orderpriority, 'v1' AS snapshot
  FROM v1
  UNION ALL
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority, 'v2'
  FROM v2
)
SELECT snapshot,
       count(*) AS n,
       count(o_orderpriority) AS n_with_priority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM unioned
GROUP BY snapshot
ORDER BY snapshot
""",
)
def q179_schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across table snapshots: a v1 snapshot written
    without ``o_orderpriority`` and a v2 snapshot written with it are
    combined via ``unionByName(allowMissingColumns=True)`` — v1 rows get
    NULL for the added column, column order differences are resolved by
    NAME (the failure mode positional UNION silently corrupts). Both
    snapshots are real parquet writes + reads, so the evolved read path
    is exercised, not simulated; the audit counts NULL-backfill
    explicitly. This is the append-only half of lakehouse schema
    evolution (the rewrite half is q143's snapshot diff)."""
    orders = load_table(spark, sf_dir, "orders")
    out = scratch_dir(prefix="kss_evolve_")
    v1_path, v2_path = f"{out}/v1", f"{out}/v2"
    (
        orders.filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite")
        .parquet(v1_path)
    )
    (
        orders.filter(F.col("o_orderkey") % 2 == 1)
        # deliberately different column order: name-based union must fix it
        .select("o_orderpriority", "o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite")
        .parquet(v2_path)
    )
    v1 = spark.read.parquet(v1_path).withColumn("snapshot", F.lit("v1"))
    v2 = spark.read.parquet(v2_path).withColumn("snapshot", F.lit("v2"))
    unioned = v1.unionByName(v2, allowMissingColumns=True)
    return (
        unioned.groupBy("snapshot")
        .agg(
            F.count("*").alias("n"),
            F.count("o_orderpriority").alias("n_with_priority"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("snapshot")
    )


# ---------------------------------------------------------------------------
# q180 — parquet compression-codec matrix round trip.
# ---------------------------------------------------------------------------
_CODECS = ("snappy", "gzip", "zstd", "lz4", "none")


@query(
    "q180_codec_roundtrip",
    oracle=f"""
WITH base AS (
  SELECT count(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
  FROM orders
)
SELECT codec, base.n, base.total
FROM (SELECT unnest(['{"', '".join(sorted(_CODECS))}']) AS codec), base
ORDER BY codec
""",
)
def q180_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write→read round trip through every production parquet codec
    (snappy, gzip, zstd, lz4, uncompressed): each copy must decode to the
    identical row count and exact-decimal total — codec choice can never
    change data. At 100 TB codec choice is a real cost lever (zstd ≈
    30-50% smaller than snappy at similar scan speed); this gate keeps
    the switch purely physical. One write+read per codec over the same
    relation; aggregates are tiny."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    out = scratch_dir(prefix="kss_codec_")
    frames = []
    for codec in sorted(_CODECS):
        path = f"{out}/{codec}"
        orders.write.mode("overwrite").option(
            "compression", codec if codec != "none" else "uncompressed"
        ).parquet(path)
        back = spark.read.parquet(path)
        frames.append(
            back.agg(
                F.count("*").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
                .cast("double")
                .alias("total"),
            ).select(F.lit(codec).alias("codec"), "n", "total")
        )
    result = frames[0]
    for f in frames[1:]:
        result = result.unionByName(f)
    return result.orderBy("codec")
