"""Scalar function surface — string/date/math/JSON (SURVEY.md §2 Table B).

The reference's only scalar work is string concat + ISO timestamp formatting
(producer record construction, AmazonKinesisRecordProducerSample.java:126-130)
and UTF-8 decode (processor, AmazonKinesisApplicationSampleRecordProcessor
.java:102-103). The engine exposes the full built-in surface; everything here
is JVM-side / whole-stage-codegen — no Python in the row path.

Oracle-parity notes: functions are chosen so both engines are bit-exact —
sqrt (IEEE correctly rounded), abs/floor/ceil, round (both round half away
from zero for doubles), integer epoch math (both floor). Transcendentals
(ln/exp/pow) are deliberately excluded from oracle-checked outputs: JVM
Math.log and libm can legally differ by 1 ulp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.queries import query


# ---------------------------------------------------------------------------
# q19 — JSON + string functions over the event payload.
# ---------------------------------------------------------------------------
@query(
    "q19_payload_scalars",
    oracle="""
SELECT event_id,
       CAST(props->>'k' AS INTEGER) AS k,
       UPPER(event_type) AS type_upper,
       SUBSTRING(event_type, 1, 3) AS type_prefix,
       LENGTH(props) AS props_len,
       CONCAT(event_type, '#', CAST(user_id AS VARCHAR)) AS type_user,
       REGEXP_EXTRACT(props, '([0-9]+)', 1) AS k_str,
       CASE WHEN event_type IN ('purchase','signup') THEN 'conversion' ELSE 'traffic' END AS funnel
FROM events
ORDER BY event_id
""",
)
def q19_payload_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's A12 decode-projection generalized: JSON payload lift
    (``from_json`` ≈ the jackson dependency the reference never used),
    string ops, conditional classification. All codegen'd."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.from_json("props", "k INT").getField("k").alias("k"),
            F.upper("event_type").alias("type_upper"),
            F.substring("event_type", 1, 3).alias("type_prefix"),
            F.length("props").alias("props_len"),
            F.concat(F.col("event_type"), F.lit("#"), F.col("user_id").cast("string")).alias(
                "type_user"
            ),
            F.regexp_extract("props", r"([0-9]+)", 1).alias("k_str"),
            F.when(F.col("event_type").isin("purchase", "signup"), "conversion")
            .otherwise("traffic")
            .alias("funnel"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# q20 — date/time function family over event time.
# ---------------------------------------------------------------------------
@query(
    "q20_event_time_parts",
    oracle="""
SELECT event_id,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
       date_trunc('hour', ts) AS hour_start,
       CAST(year(ts) AS INTEGER)  AS y,
       CAST(month(ts) AS INTEGER) AS m,
       CAST(hour(ts) AS INTEGER)  AS h,
       CAST(isodow(ts) AS INTEGER) AS iso_dow,
       strftime(ts, '%Y-%m') AS ym,
       epoch_ms(ts) // 1000 AS epoch_s
FROM events
ORDER BY event_id
""",
)
def q20_event_time_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time decomposition — the typed version of the reference's
    embedded ISO timestamp (producer :128-129, never parsed back by its
    consumer). iso_dow uses Monday=1 on both engines (Spark weekday()+1)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.date_trunc("day", "ts").alias("day_start"),
            F.date_trunc("hour", "ts").alias("hour_start"),
            F.year("ts").alias("y"),
            F.month("ts").alias("m"),
            F.hour("ts").alias("h"),
            (F.weekday("ts") + F.lit(1)).alias("iso_dow"),
            F.date_format("ts", "yyyy-MM").alias("ym"),
            F.unix_timestamp("ts").alias("epoch_s"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# q21 — math function family.
# ---------------------------------------------------------------------------
@query(
    "q21_math_scalars",
    oracle="""
SELECT event_id,
       ROUND(value, 1) AS v_round,
       ABS(value - 100.0) AS v_centered,
       CAST(FLOOR(value) AS BIGINT) AS v_floor,
       CAST(CEIL(value)  AS BIGINT) AS v_ceil,
       SQRT(ABS(value)) AS v_sqrt,
       value * value AS v_sq,
       CAST(FLOOR(value) AS BIGINT) % 7 AS v_mod,
       GREATEST(value, 50.0) AS v_hi,
       LEAST(value, 50.0) AS v_lo
FROM events
ORDER BY event_id
""",
)
def q21_math_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact/correctly-rounded math only (see module docstring). The %7
    input is floored explicitly — Spark's double→bigint cast truncates
    while DuckDB's rounds, so a bare cast would diverge."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    return (
        ev.select(
            "event_id",
            F.round(v, 1).alias("v_round"),
            F.abs(v - 100.0).alias("v_centered"),
            F.floor(v).alias("v_floor"),
            F.ceil(v).alias("v_ceil"),
            F.sqrt(F.abs(v)).alias("v_sqrt"),
            (v * v).alias("v_sq"),
            (F.floor(v).cast("bigint") % 7).alias("v_mod"),
            F.greatest(v, F.lit(50.0)).alias("v_hi"),
            F.least(v, F.lit(50.0)).alias("v_lo"),
        )
        .orderBy("event_id")
    )
