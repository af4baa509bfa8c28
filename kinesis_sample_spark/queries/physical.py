"""Physical-layout operators promoted to the oracle lane (round 16).

Bucketed co-located joins and explicit skew salting have lived in this
repo since the early rounds as `sources/bucketed.py` / `operators/skew.py`
with plan/unit tests only. At 100 TB they are not "utilities" — they are
THE fact⋈fact join strategy and THE hot-key survival strategy — so this
module gives each one a hash-gated registry query: the oracle recomputes
the same answer with a plain join, proving the layout/salting machinery
is result-invariant, while the plan invariant (no shuffle for the
bucketed join; salt in the join key for the salted one) is enforced
in-query and in tests/test_round16_ops.py.

Single-session assumption (as q332/q337+): the bucketed tables are
q-prefixed managed tables, dropped and rewritten per invocation, so
re-runs and sf switches in one session are safe but two threads racing
the same query's setup would interleave. The driver and every sweep tool
run queries sequentially.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.plans import exchange_count
from kinesis_sample_spark.queries import query

# ---------------------------------------------------------------------------
# q345 — bucketed co-located fact⋈fact join, shuffle-freedom gated in-query.
# ---------------------------------------------------------------------------
_Q345_BUCKETS = 8  # fixture-sized; production sizes to data / target split


@query(
    "q345_bucketed_join_audit",
    oracle="""
SELECT o.o_orderpriority,
       count(*) AS n_items,
       CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
)
def q345_bucketed_join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join (`sources/bucketed.py`), promoted to the
    oracle lane: orders and lineitem are written as same-bucketed,
    bucket-sorted managed tables on the join key, then joined WITHOUT A
    SHUFFLE — the query RAISES if the join subtree plans any shuffle
    exchange, so the hash gate and the plan property stand or fall
    together (a driver-green row certifies both). The oracle is the
    plain join: bucketing must be invisible in the values.

    This is the 100 TB fact⋈fact strategy: pay the partitioning shuffle
    ONCE at write (amortized over every later join/agg on the key)
    instead of shuffling both sides on every query. Bucket-sorting also
    deletes the sort from the sort-merge join — matching buckets zip.
    The merge hint pins SMJ so the asserted plan shape is identical at
    every SF (at fixture scale the dims would otherwise broadcast —
    fine for values, wrong for the property under test; at production
    scale neither fact side broadcasts and SMJ is what you get anyway).
    Bucket count is sized to data volume / target split in production;
    8 here. Exact integer cents keep the hash engine-stable."""
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "orderkey"
    )
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "orderkey"
    )
    from kinesis_sample_spark.sources.bucketed import write_bucketed

    write_bucketed(orders, "q345_orders", "orderkey", _Q345_BUCKETS)
    write_bucketed(li, "q345_lineitem", "orderkey", _Q345_BUCKETS)
    joined = (
        spark.table("q345_orders")
        .hint("merge")
        .join(spark.table("q345_lineitem"), "orderkey")
    )
    n_exchanges = exchange_count(joined)
    if n_exchanges != 0:
        raise RuntimeError(
            f"q345: bucketed join planned {n_exchanges} shuffle exchange(s) "
            "— the co-location contract broke (bucket count mismatch, or a "
            "Spark upgrade stopped honoring bucket specs)"
        )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("cents"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q346 — explicit salted join under engineered 90% key skew.
# ---------------------------------------------------------------------------
_Q346_SALT = 16
#: ~90% of lineitem rows land on key 0; the rest spread over l_orderkey%97.
_Q346_KEY_SQL = "CASE WHEN l_orderkey % 10 <> 0 THEN 0 ELSE l_orderkey % 97 END"


@query(
    "q346_salted_skew_join",
    oracle=f"""
WITH l AS (
  SELECT {_Q346_KEY_SQL} AS k,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
),
d AS (SELECT DISTINCT k, k * 2 + 1 AS w FROM l)
SELECT l.k,
       count(*) AS n_rows,
       CAST(sum(l.cents * d.w) AS BIGINT) AS weighted_cents
FROM l JOIN d ON d.k = l.k
GROUP BY l.k
ORDER BY l.k
""",
)
def q346_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit salting (`operators/skew.py::salted_join`), promoted to
    the oracle lane under ENGINEERED skew: ~90% of lineitem rows share
    one join key, the worst case for a shuffled join (one task gets 90%
    of the data; AQE's skew split helps but the hot key still serializes
    through few tasks). `salted_join` spreads the hot key across
    16 sub-keys (deterministic row-hash, no rand() — retry-stable)
    and replicates the dim side once per sub-key; the oracle is the
    UNSALTED join, so the hash gate IS the proof that the
    spread-and-replicate transform is result-invariant. The weighted
    measure (cents x dim attribute) makes a dropped or duplicated
    replica row arithmetically visible, not just count-visible.

    Scale: salting costs dim x 16 replication — chosen when the dim
    is too big to broadcast and the hot key too hot for AQE's split
    (the mid-size regime; `operators/skew.py` has the cost model). The
    merge hint keeps the fixture-scale plan on the SMJ path the
    technique targets; the salt column's presence in the join key is
    plan-asserted in tests."""
    li = load_table(spark, sf_dir, "lineitem")
    left = li.select(
        F.expr(_Q346_KEY_SQL).alias("k"),
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents"),
    )
    dim = left.select("k").distinct().select(
        "k", (F.col("k") * 2 + 1).alias("w")
    )
    from kinesis_sample_spark.operators.skew import salted_join

    joined = salted_join(left, dim.hint("merge"), "k", salt_buckets=_Q346_SALT)
    return (
        joined.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("cents") * F.col("w")).cast("bigint").alias(
                "weighted_cents"
            ),
        )
        .orderBy("k")
    )
