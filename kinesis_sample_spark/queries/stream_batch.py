"""Stream-semantics operators, batch-checked — SURVEY.md §2 Table A + §5.2.

These queries mirror the reference pipeline's observable semantics on the
bounded ``events`` fixture so the DuckDB oracle can gate them; the *live*
Structured Streaming versions of the same transformations are in
``kinesis_sample_spark.streaming`` and are tested for batch-equivalence in
tests/test_streaming.py (SURVEY.md §5.2: run the streaming query on a
bounded source and compare the final table against the batch SQL).

Reference semantics covered here:
- A1/A2 record construction + A12 decode-projection (envelope round trip)
- event-time windows (tumbling/sliding/session) and streaming dedup — absent
  in the reference, required of the engine (Table B)
- as-of join via the union+window composition in operators/asof.py
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.functions.numeric import dec
from kinesis_sample_spark.operators.asof import asof_join
from kinesis_sample_spark.queries import query

#: the reference producer's payload format:
#: "testData-" + LocalDateTime.now() (Prod:128-129; README.md:14)
PAYLOAD_FMT_SPARK = "yyyy-MM-dd'T'HH:mm:ss.SSS"
PAYLOAD_FMT_DUCK = "%Y-%m-%dT%H:%M:%S.%g"


# ---------------------------------------------------------------------------
# q22 — Kinesis envelope round trip: build → binary → decode → lift ts.
# ---------------------------------------------------------------------------
@query(
    "q22_envelope_roundtrip",
    oracle=f"""
SELECT event_id,
       'partitionKey-' || CAST(user_id AS VARCHAR) AS partition_key,
       decode(encode('testData-' || strftime(ts, '{PAYLOAD_FMT_DUCK}'))) AS payload,
       strptime(substring(decode(encode('testData-' || strftime(ts, '{PAYLOAD_FMT_DUCK}'))), 10),
                '{PAYLOAD_FMT_DUCK}') AS parsed_ts
FROM events
ORDER BY event_id
""",
)
def q22_envelope_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full data path in one expression chain: producer
    record construction (payload = "testData-"+ISO ts, partitionKey-%d —
    Prod:126-130), opaque-bytes envelope (encode), consumer UTF-8 decode
    (Proc:102-103) and the typed lift of the embedded timestamp the
    reference never did. Millisecond truncation matches both engines."""
    ev = load_table(spark, sf_dir, "events")
    payload = F.concat(F.lit("testData-"), F.date_format("ts", PAYLOAD_FMT_SPARK))
    data = F.encode(payload, "UTF-8")  # the envelope's opaque bytes
    decoded = F.decode(data, "UTF-8")
    return (
        ev.select(
            "event_id",
            F.concat(F.lit("partitionKey-"), F.col("user_id").cast("string")).alias(
                "partition_key"
            ),
            decoded.alias("payload"),
            F.to_timestamp(F.expr("substring(decode(encode(concat('testData-', date_format(ts, 'yyyy-MM-dd\\'T\\'HH:mm:ss.SSS')), 'UTF-8'), 'UTF-8'), 10)"), PAYLOAD_FMT_SPARK).alias("parsed_ts"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# q23 — tumbling event-time window aggregation.
# ---------------------------------------------------------------------------
@query(
    "q23_tumbling_window",
    bench=True,
    oracle="""
SELECT event_type,
       date_trunc('hour', ts) AS w_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS w_end,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM events
GROUP BY event_type, date_trunc('hour', ts)
ORDER BY event_type, w_start
""",
)
def q23_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``F.window`` tumbling 1h — the same expression works under
    readStream+watermark (see streaming.pipeline); in batch it degenerates
    to a hash aggregation on the window-start. Scale: pre-aggregation
    happens map-side; cardinality = types × hours."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            "event_type",
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n_events",
            "sum_value",
        )
        .orderBy("event_type", "w_start")
    )


# ---------------------------------------------------------------------------
# q24 — sliding window (1 h window, 30 min slide → 2 windows per event).
# ---------------------------------------------------------------------------
@query(
    "q24_sliding_window",
    oracle="""
WITH buckets AS (
    SELECT event_type, value,
           unnest([ (epoch_ms(ts) // 1000 // 1800) * 1800,
                    (epoch_ms(ts) // 1000 // 1800) * 1800 - 1800 ]) AS w_start_s
    FROM events
)
SELECT event_type,
       make_timestamp(w_start_s * 1000000) AS w_start,
       COUNT(*) AS n_events,
       CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_value
FROM buckets
GROUP BY event_type, w_start_s
ORDER BY event_type, w_start
""",
)
def q24_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows assign each event to window_size/slide buckets;
    Spark's Expand does exactly what the oracle's unnest does. State scales
    with (types × windows), not rows."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            "event_type",
            F.col("w.start").alias("w_start"),
            "n_events",
            "sum_value",
        )
        .orderBy("event_type", "w_start")
    )


# ---------------------------------------------------------------------------
# q25 — session windows (30 min inactivity gap) per user.
# ---------------------------------------------------------------------------
@query(
    "q25_session_windows",
    oracle="""
WITH flagged AS (
    SELECT user_id, ts, value,
           CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     > INTERVAL 30 MINUTE OR
                LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                THEN 1 ELSE 0 END AS new_session
    FROM events
),
sessions AS (
    SELECT user_id, ts, value,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
    FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_start
""",
)
def q25_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``F.session_window(ts, gap)`` — merge events within 30 min of each
    other; window end = last event + gap. The oracle is the classic
    gaps-and-islands rewrite. In streaming this same expression runs with
    watermark-managed state (see streaming.pipeline)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


# ---------------------------------------------------------------------------
# q26 — deterministic dedup: first event per (user, type).
# ---------------------------------------------------------------------------
@query(
    "q26_first_event_dedup",
    oracle="""
SELECT event_id, user_id, event_type, ts, value
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id) AS rn
    FROM events
) t
WHERE rn = 1
ORDER BY user_id, event_type
""",
)
def q26_first_event_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keep-first dedup (``dropDuplicates`` keeps an
    arbitrary row — unacceptable for an oracle-checked engine; the
    window-rank rewrite pins the survivor). Streaming equivalent:
    ``dropDuplicatesWithinWatermark`` in streaming.pipeline."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts", "value")
        .orderBy("user_id", "event_type")
    )


# ---------------------------------------------------------------------------
# q27 — as-of join: latest view at-or-before each purchase, per user.
# ---------------------------------------------------------------------------
@query(
    "q27_asof_purchase_view",
    bench=True,
    oracle="""
WITH v AS (
    SELECT user_id, ts, event_id, value FROM (
        SELECT user_id, ts, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'view'
    ) WHERE rn = 1
),
p AS (SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase')
SELECT p.user_id, p.event_id, p.ts, p.value,
       v.ts AS r_ts, v.event_id AS r_event_id, v.value AS r_value
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
ORDER BY p.user_id, p.event_id
""",
)
def q27_asof_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exercises operators.asof.asof_join (union + running last() — the
    SMJ-cost-shape composition; DuckDB's native ASOF JOIN is the oracle).
    Right-side (user, ts) ties collapse to the max event_id on both sides."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    joined = asof_join(purchases, views, on="user_id", left_ts="ts", right_ts="ts")
    return joined.select(
        "user_id", "event_id", "ts", "value", "r_ts", "r_event_id", "r_value"
    ).orderBy("user_id", "event_id")


# ---------------------------------------------------------------------------
# q28 — interval join (time-proximity), bucketed for scale.
# ---------------------------------------------------------------------------
@query(
    "q28_interval_join",
    oracle="""
SELECT e.event_id, COUNT(p.event_id) AS n_purchases_nearby
FROM (SELECT event_id, ts FROM events WHERE event_type = 'error') e
LEFT JOIN (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
  ON p.ts >= e.ts - INTERVAL 1 MINUTE AND p.ts <= e.ts + INTERVAL 1 MINUTE
GROUP BY e.event_id
ORDER BY e.event_id
""",
)
def q28_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: purchases within ±1 min of each error. A naive
    inequality join is O(n·m) (DuckDB's IEJoin hides this; Spark would
    nested-loop). The scalable composition: bucket both sides to the
    minute, equi-join each error bucket against {b-1, b, b+1}, then apply
    the exact interval predicate — candidate space shrinks from all pairs
    to pairs in adjacent buckets, and the join is a plain hash equi-join
    on the bucket key."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"), F.col("ts").alias("e_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        (F.unix_millis("ts") / 60000).cast("bigint").alias("p_bucket"),
    )
    # each error probes its own bucket and both neighbors
    probes = errors.select(
        "e_id",
        "e_ts",
        F.explode(
            F.array(
                (F.unix_millis("e_ts") / 60000).cast("bigint") - 1,
                (F.unix_millis("e_ts") / 60000).cast("bigint"),
                (F.unix_millis("e_ts") / 60000).cast("bigint") + 1,
            )
        ).alias("bucket"),
    )
    # conditional count, NOT a post-join filter: filtering would drop an
    # error entirely when its neighbor buckets hold only out-of-interval
    # purchases (every probe row eliminated), whereas the semantics demand
    # a 0-count row.
    in_interval = (F.col("p_ts") >= F.col("e_ts") - F.expr("INTERVAL 1 MINUTE")) & (
        F.col("p_ts") <= F.col("e_ts") + F.expr("INTERVAL 1 MINUTE")
    )
    matched = probes.join(purchases, probes.bucket == purchases.p_bucket, "left")
    return (
        matched.groupBy(F.col("e_id").alias("event_id"))
        .agg(F.count(F.when(in_interval, F.col("p_id"))).alias("n_purchases_nearby"))
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# q146 — interval-overlap join (order activity windows × promo windows).
# ---------------------------------------------------------------------------


@query(
    "q146_interval_overlap_join",
    oracle="""
WITH o AS (
  SELECT o_orderkey, o_orderdate AS o_start,
         o_orderdate + INTERVAL 3 DAY AS o_end
  FROM orders
),
b AS (
  SELECT min(o_orderdate) AS lo, max(o_orderdate) AS hi FROM orders
),
w AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 11 DAY)) AS w_start FROM b
),
win AS (
  SELECT w_start, w_start + INTERVAL 5 DAY AS w_end FROM w
)
SELECT win.w_start, win.w_end,
       count(o.o_orderkey) AS n_orders
FROM win LEFT JOIN o
  ON o.o_start < win.w_end AND win.w_start < o.o_end
GROUP BY win.w_start, win.w_end
ORDER BY win.w_start
""",
)
def q146_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × interval overlap join: every order owns an activity
    interval [orderdate, +3 days), promo windows of 5 days open every 11
    days across the table's date range; count orders overlapping each
    window (windows with zero orders kept).

    The oracle states it as the theta join it is — which DuckDB's IEJoin
    absorbs but Spark would nested-loop at O(n·m). The engine path blocks
    both sides to 7-day buckets first: each interval explodes into the
    few buckets it touches (≤2 for orders, ≤2 for windows), the join is a
    plain hash equi-join on the bucket key, the exact overlap predicate
    then prunes false bucket-mates, and a distinct collapses pairs that
    met in two buckets. Candidate space shrinks from |orders|·|windows|
    to co-bucketed pairs only — the same bucket-then-verify shape as q28
    and the LSH families, applied to time intervals. Window generation is
    a broadcast-scalar sequence (≤ hundreds of rows at any scale)."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderkey",
        F.col("o_orderdate").alias("o_start"),
        F.expr("o_orderdate + INTERVAL 3 DAYS").alias("o_end"),
    )
    bounds = orders.agg(
        F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi")
    )
    windows = bounds.select(
        F.explode(F.expr("sequence(lo, hi, INTERVAL 11 DAYS)")).alias("w_start")
    ).withColumn("w_end", F.expr("w_start + INTERVAL 5 DAYS"))

    def week_bucket(expr: str) -> F.Column:
        # o_orderdate is TIMESTAMP_NTZ; unix_millis needs TIMESTAMP_LTZ —
        # the session zone is pinned to UTC so the cast is deterministic
        return (
            F.unix_millis(F.expr(expr).cast("timestamp_ltz")) / (7 * 86400 * 1000)
        ).cast("bigint")

    # explode each side into every 7-day bucket its interval touches; the
    # end bound is exclusive, so the last touched bucket is bucket(end - ε)
    o_probes = o.select(
        "o_orderkey",
        "o_start",
        "o_end",
        F.explode(
            F.sequence(
                week_bucket("o_start"),
                week_bucket("o_end - INTERVAL 1 MILLISECOND"),
            )
        ).alias("bucket"),
    )
    w_probes = windows.select(
        "w_start",
        "w_end",
        F.explode(
            F.sequence(
                week_bucket("w_start"),
                week_bucket("w_end - INTERVAL 1 MILLISECOND"),
            )
        ).alias("bucket"),
    )
    overlap = (F.col("o_start") < F.col("w_end")) & (F.col("w_start") < F.col("o_end"))
    pairs = (
        w_probes.join(o_probes, on="bucket")
        .filter(overlap)
        .select("w_start", "w_end", "o_orderkey")
        .distinct()
    )
    return (
        windows.join(pairs, on=["w_start", "w_end"], how="left")
        .groupBy("w_start", "w_end")
        .agg(F.count("o_orderkey").alias("n_orders"))
        .orderBy("w_start")
    )


# ---------------------------------------------------------------------------
# q175 — time-weighted average (TWAP) per user.
# ---------------------------------------------------------------------------
@query(
    "q175_time_weighted_avg",
    oracle="""
WITH seg AS (
  SELECT user_id, value, ts,
         epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS dt_us
  FROM events
),
agg AS (
  SELECT user_id,
         count(*) AS n_segments,
         CAST(SUM(dt_us) AS BIGINT) AS total_us,
         SUM(CAST(value AS DECIMAL(12,4)) * dt_us) AS wsum
  FROM seg WHERE dt_us IS NOT NULL
  GROUP BY user_id
)
SELECT user_id, n_segments, total_us,
       CAST(CAST(wsum AS VARCHAR) AS DOUBLE) / total_us AS twap
FROM agg
ORDER BY user_id
""",
)
def q175_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of the event value per user — the
    time-series aggregate plain AVG gets wrong whenever observations are
    irregularly spaced (a value held for an hour must weigh 3600× one
    held for a second). Each observation is weighted by its holding
    interval Δt = next event time − event time (lead over the per-user
    ordering; the last open-ended segment drops on both engines).
    Exactness: Δt is integer microseconds, values quantize to
    DECIMAL(12,4), so the weighted sum is exact-decimal and associative —
    same hash at any parallelism — and the final division is one double
    op via the correctly-rounded VARCHAR cast. Shape: one window + one
    aggregation, both on the user_id exchange; Catalyst reuses the
    partitioning."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seg = ev.select(
        "user_id",
        "value",
        (
            F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
        ).alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    return (
        seg.groupBy("user_id")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum("dt_us").alias("total_us"),
            F.sum(F.col("value").cast("decimal(12,4)") * F.col("dt_us")).alias(
                "wsum"
            ),
        )
        .select(
            "user_id",
            "n_segments",
            "total_us",
            (F.col("wsum").cast("double") / F.col("total_us")).alias("twap"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# q176 — shard sequence-continuity audit (gaps, duplicates, inversions).
# ---------------------------------------------------------------------------
@query(
    "q176_sequence_continuity",
    oracle="""
WITH seq AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_ts
  FROM events
)
SELECT user_id,
       count(*) AS n_records,
       count(DISTINCT event_id) AS n_distinct,
       CAST(min(event_id) AS BIGINT) AS min_seq,
       CAST(max(event_id) AS BIGINT) AS max_seq,
       CAST(max(event_id) - min(event_id) + 1 - count(DISTINCT event_id) AS BIGINT)
         AS n_gaps,
       count(*) - count(DISTINCT event_id) AS n_dups,
       count(*) FILTER (WHERE prev_ts IS NOT NULL AND ts < prev_ts)
         AS n_time_inversions
FROM seq
GROUP BY user_id
ORDER BY user_id
""",
)
def q176_sequence_continuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stream-integrity audit a Kinesis consumer runs per partition
    key: treating event_id as the shard sequence number (FIXTURES.md —
    "event_id ≈ sequence number"), report per key the record count,
    distinct sequence count, sequence range, GAPS (range minus distinct —
    missed records), DUPLICATES (at-least-once redelivery), and
    event-time INVERSIONS relative to sequence order (out-of-order
    arrival the reference's per-shard ordering guarantee should
    prevent). All integer arithmetic; one window + one aggregation on the
    same user_id exchange. At 100 TB this audit is the cheap invariant
    check run after every backfill or failover replay (A14)."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.lag("ts").over(w).alias("prev_ts"),
    )
    return (
        seq.groupBy("user_id")
        .agg(
            F.count("*").alias("n_records"),
            F.countDistinct("event_id").alias("n_distinct"),
            F.min("event_id").alias("min_seq"),
            F.max("event_id").alias("max_seq"),
            (
                F.max("event_id") - F.min("event_id") + 1 - F.countDistinct("event_id")
            ).alias("n_gaps"),
            (F.count("*") - F.countDistinct("event_id")).alias("n_dups"),
            F.count(
                F.when(
                    F.col("prev_ts").isNotNull() & (F.col("ts") < F.col("prev_ts")), 1
                )
            ).alias("n_time_inversions"),
        )
        .orderBy("user_id")
    )
