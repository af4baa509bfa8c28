"""Data-versioning and estate-audit operators: snapshot diffing and
join-key skew measurement.

A 100 TB corpus is rebuilt incrementally, not from scratch — the two ops a
release pipeline runs before promoting a new snapshot are (1) *what
changed* vs the previous snapshot (q143: added / removed / changed rows,
the batch analog of the CDC upsert sink in ``operators/upsert.py``), and
(2) *will the next join blow up* (q147: per-key frequency audit that
surfaces the keys ``operators/skew.py`` would salt).

Reference parity note: the reference
(``AmazonKinesisApplicationSampleRecordProcessor.java``) has no batch
surface at all — these come from the SURVEY §2 mandate (training-data
pipeline operators beyond the reference's stream loop).

Scale notes (100 TB):

- q143 is one full-outer sort-merge join on the primary key. At estate
  scale both snapshots live in key-bucketed parquet
  (``sources/bucketed.py``), which turns this into a zero-exchange
  per-bucket merge; unbucketed, AQE handles it as a plain co-partitioned
  SMJ. The change predicate compares the columns directly here; with wide
  rows the same plan compares one md5 row-fingerprint per side instead
  (cf. q108 partition fingerprints) so the join carries 2 columns, not N.
- q147 is the canonical word-count shape: map-side partial counts per
  key, one exchange of (key, partial) pairs, then a broadcast of the
  2-row totals relation. Nothing here ever materializes the heavy keys'
  rows — the audit reads counts only, which is why it is safe to run
  *before* a join that would not be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.queries import query

# ---------------------------------------------------------------------------
# q143 — snapshot diff (added / removed / changed).
#
# The two snapshots are derived deterministically from `orders` so the
# oracle can rebuild them: the "old" snapshot is missing keys ≡ 0 (mod 97)
# (those appear only in "new" → added), the "new" snapshot is missing keys
# ≡ 0 (mod 89) (→ removed) and bumps o_totalprice by 1.0 for keys ≡ 0
# (mod 7) (→ changed). Unchanged rows are filtered out of the diff.
# ---------------------------------------------------------------------------


@query(
    "q143_snapshot_diff",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
),
old AS (
  SELECT * FROM base WHERE o_orderkey % 97 <> 0
),
new AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice
  FROM base WHERE o_orderkey % 89 <> 0
)
SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
       CASE WHEN old.o_orderkey IS NULL THEN 'added'
            WHEN new.o_orderkey IS NULL THEN 'removed'
            ELSE 'changed' END AS change_type,
       old.o_totalprice AS old_price,
       new.o_totalprice AS new_price
FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
   OR old.o_totalprice <> new.o_totalprice
   OR old.o_orderstatus <> new.o_orderstatus
ORDER BY o_orderkey
""",
)
def q143_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-snapshot diff: full-outer join two snapshot versions on the
    primary key and classify every key as added / removed / changed,
    dropping unchanged rows. This is how an incremental rebuild decides
    what downstream work (re-dedup, re-embed, re-tokenize) a new crawl
    actually requires. One PK-keyed join; bucketed snapshots make it
    exchange-free (see module docstring). The +1.0 price bump is exact in
    IEEE double, so both engines agree bit-for-bit."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    old = base.filter(F.col("o_orderkey") % 97 != 0).select(
        "o_orderkey",
        F.col("o_orderstatus").alias("old_status"),
        F.col("o_totalprice").alias("old_price"),
    )
    new = (
        base.filter(F.col("o_orderkey") % 89 != 0)
        .select(
            "o_orderkey",
            F.col("o_orderstatus").alias("new_status"),
            F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + F.lit(1.0))
            .otherwise(F.col("o_totalprice"))
            .alias("new_price"),
        )
    )
    joined = old.join(new, on="o_orderkey", how="full_outer")
    change = (
        F.when(F.col("old_status").isNull(), F.lit("added"))
        .when(F.col("new_status").isNull(), F.lit("removed"))
        .when(
            (F.col("old_price") != F.col("new_price"))
            | (F.col("old_status") != F.col("new_status")),
            F.lit("changed"),
        )
    )
    return (
        joined.select(
            "o_orderkey",
            change.alias("change_type"),
            "old_price",
            "new_price",
        )
        .filter(F.col("change_type").isNotNull())
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# q147 — join-key skew audit.
# ---------------------------------------------------------------------------
_SKEW_TOP_K = 20
#: a key is flagged when it holds more than this multiple of the average
#: per-key share — the threshold at which operators/skew.py's salting
#: (and AQE's skew-join splitting) starts to pay for itself.
_SKEW_X_AVG = 1.5


@query(
    "q147_join_key_skew_audit",
    oracle=f"""
WITH per_key AS (
  SELECT l_suppkey, count(*) AS n_rows FROM lineitem GROUP BY l_suppkey
),
tot AS (
  SELECT sum(n_rows) AS total_rows, count(*) AS n_keys FROM per_key
)
SELECT l_suppkey, n_rows,
       CAST(n_rows AS DOUBLE) / CAST(total_rows AS DOUBLE) AS share,
       CAST(n_rows AS DOUBLE) * CAST(n_keys AS DOUBLE)
         / CAST(total_rows AS DOUBLE) AS x_avg,
       CAST(CAST(n_rows AS DOUBLE) * CAST(n_keys AS DOUBLE)
              / CAST(total_rows AS DOUBLE) > {_SKEW_X_AVG} AS INT) AS skew_flag
FROM per_key, tot
ORDER BY n_rows DESC, l_suppkey
LIMIT {_SKEW_TOP_K}
""",
)
def q147_join_key_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key frequency audit over ``lineitem.l_suppkey``: row count,
    corpus share, multiple-of-average, and a skew flag for the top-k
    heaviest keys. Run before a fact-fact join to decide whether to salt
    (``operators/skew.py``) or rely on AQE skew splitting; the audit
    itself shuffles only (key, count) pairs — never the rows. Division is
    performed on identical exact integers in both engines, so the double
    shares match bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_suppkey").agg(F.count("*").alias("n_rows"))
    totals = per_key.agg(
        F.sum("n_rows").alias("total_rows"), F.count("*").alias("n_keys")
    )
    x_avg = (
        F.col("n_rows").cast("double")
        * F.col("n_keys").cast("double")
        / F.col("total_rows").cast("double")
    )
    return (
        per_key.crossJoin(F.broadcast(totals))
        .select(
            "l_suppkey",
            "n_rows",
            (F.col("n_rows").cast("double") / F.col("total_rows").cast("double")).alias(
                "share"
            ),
            x_avg.alias("x_avg"),
            (x_avg > F.lit(_SKEW_X_AVG)).cast("int").alias("skew_flag"),
        )
        .orderBy(F.col("n_rows").desc(), "l_suppkey")
        .limit(_SKEW_TOP_K)
    )
