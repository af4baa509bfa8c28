"""Cogrouped-map pandas UDF: the two-sided grouped Arrow exchange.

``df1.groupBy(k).cogroup(df2.groupBy(k)).applyInPandas(fn, schema)`` is the
one pandas-UDF shape the registry did not yet gate: each key's rows from
BOTH inputs arrive as two pandas frames in the same task (a co-partitioned
shuffle on the key, exactly like a join, but handing the merge logic to
Python). It is the idiomatic home for per-entity reconciliation that SQL
expresses awkwardly — custom merge_asof, per-key model scoring against a
feature table, entity resolution.

Scale: one shuffle per side on the cogroup key (identical to a shuffle
join); per-task memory is one key group at a time via Arrow streaming. The
Python work here is deliberately O(group size) with integer/ordered-fold
arithmetic so the result is engine-exact.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.queries import query

COGROUP_SCHEMA = (
    "custkey bigint, acctbal double, n_orders bigint, "
    "cents_total bigint, max_price double"
)


def _reconcile(key, cust: pd.DataFrame, orders: pd.DataFrame) -> pd.DataFrame:
    """Merge one customer's dimension row with their order history.

    Totals accumulate in integer cents (the fixture's doubles carry
    2-decimal semantics), so the sum is associative and deterministic on
    any engine; max is order-independent by nature.
    """
    (custkey,) = key
    acctbal = float(cust["c_acctbal"].iloc[0]) if len(cust) else None
    n = len(orders)
    if n:
        cents = sum(int(round(float(p) * 100)) for p in orders["o_totalprice"])
        mx = float(orders["o_totalprice"].max())
    else:
        cents, mx = 0, None
    return pd.DataFrame(
        [
            {
                "custkey": custkey,
                "acctbal": acctbal,
                "n_orders": n,
                "cents_total": cents,
                "max_price": mx,
            }
        ]
    )


@query(
    "q157_cogroup_reconcile",
    oracle="""
WITH agg AS (
  SELECT o_custkey,
         count(*) AS n_orders,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents_total,
         max(o_totalprice) AS max_price
  FROM orders GROUP BY o_custkey
)
SELECT c.c_custkey AS custkey,
       c.c_acctbal AS acctbal,
       coalesce(agg.n_orders, 0) AS n_orders,
       coalesce(agg.cents_total, 0) AS cents_total,
       agg.max_price AS max_price
FROM customer c LEFT JOIN agg ON agg.o_custkey = c.c_custkey
ORDER BY custkey
""",
)
def q157_cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer↔orders reconciliation through the cogrouped-map exchange.
    Every fixture order references an existing customer, so cogroup's
    key-union equals the customer key set and the oracle is a LEFT JOIN
    against the grouped order roll-up. Value-hashing the result proves the
    two-sided Arrow transport (group alignment, empty-side frames, schema
    projection) end-to-end — not just that it runs."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    out = (
        cust.groupBy("c_custkey")
        .cogroup(orders.groupBy("o_custkey"))
        .applyInPandas(_reconcile, COGROUP_SCHEMA)
    )
    # persist before the global sort: the range-partitioner's sample pass
    # otherwise pushes a second full two-sided Arrow exchange through the
    # cogrouped pandas UDF
    return out.persist().orderBy("custkey")
