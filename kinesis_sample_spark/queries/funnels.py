"""Behavioral analytics over the event stream: cohort retention and
funnel conversion — the canonical product-analytics shapes, built from
the same envelope the reference's consumer decodes
(AmazonKinesisApplicationSampleRecordProcessor.java:99-110 only prints
records; these queries are what a real consumer computes from them).

All outputs are integer counts and exact divisions of integers — no
float-order hazards, so oracle parity is structural.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.queries import query


# ---------------------------------------------------------------------------
# q109 — weekly cohort retention matrix.
# ---------------------------------------------------------------------------
@query(
    "q109_retention_cohorts",
    oracle="""
WITH first_seen AS (
    SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
    FROM events GROUP BY user_id
),
activity AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS act_week
    FROM events
)
SELECT cohort_week,
       CAST(FLOOR(date_diff('day', cohort_week, act_week) / 7) AS BIGINT) AS week_number,
       COUNT(DISTINCT user_id) AS n_active_users
FROM activity JOIN first_seen USING (user_id)
GROUP BY 1, 2
ORDER BY cohort_week, week_number
""",
)
def q109_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort users by first-seen week, count distinct active users per
    (cohort, weeks-since-cohort) cell — the retention triangle. Two
    aggregations plus one user-keyed join; the cohort table is one row
    per user, so at 100 TB the join side to broadcast or bucket is the
    *user dimension*, not the event fact. Week offsets are exact
    multiples of 7 days, so FLOOR(days/7) is integer-safe on both
    engines."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("act_week")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(
                F.datediff(F.col("act_week"), F.col("cohort_week")) / 7
            ).alias("week_number"),
        )
        .agg(F.countDistinct("user_id").alias("n_active_users"))
        .orderBy("cohort_week", "week_number")
    )


# ---------------------------------------------------------------------------
# q110 — signup→purchase funnel conversion per user.
# ---------------------------------------------------------------------------
@query(
    "q110_funnel_conversion",
    oracle="""
WITH s AS (
    SELECT user_id, event_id, ts FROM events WHERE event_type = 'signup'
),
converted AS (
    SELECT DISTINCT s.user_id, s.event_id
    FROM s JOIN events p
      ON p.user_id = s.user_id AND p.event_type = 'purchase'
     AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 1 HOUR
),
per_user AS (
    SELECT s.user_id,
           COUNT(*) AS n_signups,
           COUNT(c.event_id) AS n_converted
    FROM s LEFT JOIN converted c
      ON s.user_id = c.user_id AND s.event_id = c.event_id
    GROUP BY s.user_id
)
SELECT user_id, n_signups, n_converted,
       n_converted / CAST(n_signups AS DOUBLE) AS conversion_rate
FROM per_user
ORDER BY user_id
""",
)
def q110_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user funnel: how many signup events were followed by a purchase
    within an hour (the batch aggregate over q106's stream-stream join
    pairs). Time-banded join on user_id, dedup to one conversion per
    signup, left join back so zero-conversion users keep a row. The band
    condition bounds join state exactly as the streaming watermark does."""
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        "user_id", "event_id", "ts"
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    converted = (
        s.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("ts"))
            & (F.col("p_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select("user_id", "event_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    per_user = (
        s.join(converted, ["user_id", "event_id"], "left")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_signups"),
            F.count("converted").alias("n_converted"),
        )
    )
    return per_user.select(
        "user_id",
        "n_signups",
        "n_converted",
        (F.col("n_converted") / F.col("n_signups").cast("double")).alias(
            "conversion_rate"
        ),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# q111 — training-sequence packing (concat-then-chunk at context length).
# ---------------------------------------------------------------------------
@query(
    "q111_sequence_packing",
    oracle="""
WITH sized AS (
    SELECT source, doc_id, len(string_split(text, ' ')) AS tok_len
    FROM documents
),
offs AS (
    SELECT source, doc_id, tok_len,
           CAST(SUM(tok_len) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - tok_len AS BIGINT) AS start_offset
    FROM sized
)
SELECT source, doc_id, tok_len, start_offset,
       CAST(FLOOR(start_offset / 2048.0) AS BIGINT) AS seq_idx,
       start_offset - CAST(FLOOR(start_offset / 2048.0) AS BIGINT) * 2048 AS offset_in_seq,
       (CAST(FLOOR(start_offset / 2048.0) AS BIGINT)
        <> CAST(FLOOR((start_offset + tok_len - 1) / 2048.0) AS BIGINT)) AS straddles
FROM offs
ORDER BY source, doc_id
""",
)
def q111_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style packing layout: per source, concatenate documents in id
    order and chunk the token stream at a 2048-token context length —
    each doc gets its sequence index, offset within the sequence, and a
    straddles-boundary flag (what an attention-mask builder consumes).
    Pure integer window arithmetic (running token offsets), so parity is
    exact. Scale: one window per source partition; the token streams of
    different sources pack independently, so parallelism = number of
    sources — for a single giant source, salt the stream into shards
    first (operators/skew.py) and offset each shard by its shard-total
    (two passes, still no global sort)."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    sized = docs.select(
        "source", "doc_id", F.size(F.split("text", " ")).alias("tok_len")
    )
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    offs = sized.withColumn(
        "start_offset", F.sum("tok_len").over(w) - F.col("tok_len")
    )
    seq_idx = F.floor(F.col("start_offset") / 2048.0)
    end_idx = F.floor((F.col("start_offset") + F.col("tok_len") - 1) / 2048.0)
    return (
        offs.select(
            "source",
            "doc_id",
            "tok_len",
            "start_offset",
            seq_idx.alias("seq_idx"),
            (F.col("start_offset") - seq_idx * 2048).alias("offset_in_seq"),
            (seq_idx != end_idx).alias("straddles"),
        )
        .orderBy("source", "doc_id")
    )


# ---------------------------------------------------------------------------
# q141 — frequent-transition mining over per-user event sequences.
# ---------------------------------------------------------------------------
_MIN_SUPPORT = 350  # absolute count at sf0.01: ~9.9k transitions over 25 pairs ≈ 394 avg


@query(
    "q141_transition_mining",
    oracle=f"""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS next_type
  FROM events
),
t AS (
  SELECT event_type AS src, next_type AS dst, count(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
),
tot AS (SELECT sum(n) AS total FROM t)
SELECT t.src, t.dst, CAST(t.n AS BIGINT) AS n,
       CAST(t.n AS DOUBLE) / tot.total AS support
FROM t, tot
WHERE t.n >= {_MIN_SUPPORT}
ORDER BY n DESC, src, dst
""",
)
def q141_transition_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent behavioral patterns, mined not pre-specified (q110's
    funnel checks a FIXED pattern; this discovers which transitions are
    common): per-user ordered event pairs via lead(), global counts,
    absolute-support filter. support = n / total is an exact IEEE
    division of two integers — engine-identical. At scale the heavy step
    is the per-user window (one user_id shuffle); the transition table
    is |event_types|² rows, trivially small, and the total is a
    broadcast scalar."""
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type", "event_id")
    seq = ev.withColumn("next_type", F.lead("event_type").over(w)).filter(
        F.col("next_type").isNotNull()
    )
    t = seq.groupBy(
        F.col("event_type").alias("src"), F.col("next_type").alias("dst")
    ).agg(F.count("*").alias("n"))
    tot = t.agg(F.sum("n").alias("total"))
    return (
        t.crossJoin(F.broadcast(tot))
        .filter(F.col("n") >= _MIN_SUPPORT)
        .select(
            "src",
            "dst",
            "n",
            (F.col("n").cast("double") / F.col("total")).alias("support"),
        )
        .orderBy(F.desc("n"), "src", "dst")
    )


# ---------------------------------------------------------------------------
# q181 — first conversion path per user (ordered sequence assembly).
# ---------------------------------------------------------------------------
@query(
    "q181_first_conversion_path",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type, ts, event_id,
         min(CASE WHEN event_type = 'purchase' THEN ts END)
           OVER (PARTITION BY user_id) AS first_purchase_ts
  FROM events
),
pre AS (
  SELECT user_id, event_type, ts, event_id, first_purchase_ts
  FROM ordered
  WHERE first_purchase_ts IS NOT NULL AND ts <= first_purchase_ts
),
paths AS (
  SELECT user_id,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path,
         count(*) AS path_len,
         min(ts) AS path_start,
         max(first_purchase_ts) AS converted_at
  FROM pre GROUP BY user_id
)
SELECT user_id, path, path_len,
       (epoch_us(converted_at) - epoch_us(path_start)) // 1000000
         AS seconds_to_convert
FROM paths
ORDER BY user_id
""",
)
def q181_first_conversion_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-style sequence assembly: for every user who ever
    purchases, the ORDERED chain of event types from their first event up
    to (and including) the first purchase, plus time-to-convert. The
    path string is an order-sensitive aggregation — Spark spells it
    array_join(array_agg over a sorted window frame), DuckDB
    string_agg(... ORDER BY) — ties broken by event_id so both engines
    assemble the identical string. One user_id exchange serves the
    first-purchase window, the path window, and the final group-by."""
    ev = load_table(spark, sf_dir, "events")
    w_user = W.partitionBy("user_id")
    ordered = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).over(
            w_user
        ).alias("first_purchase_ts"),
    )
    pre = ordered.filter(
        F.col("first_purchase_ts").isNotNull()
        & (F.col("ts") <= F.col("first_purchase_ts"))
    )
    w_seq = w_user.orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    with_path = pre.withColumn(
        "path", F.array_join(F.collect_list("event_type").over(w_seq), ">")
    )
    return (
        with_path.groupBy("user_id")
        .agg(
            F.first("path").alias("path"),
            F.count("*").alias("path_len"),
            (
                F.unix_micros(F.max("first_purchase_ts"))
                - F.unix_micros(F.min("ts"))
            ).alias("us_to_convert"),
        )
        .select(
            "user_id",
            "path",
            "path_len",
            F.expr("us_to_convert div 1000000").alias("seconds_to_convert"),
        )
        .orderBy("user_id")
    )
