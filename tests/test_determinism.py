"""Parallelism-independence: the engine's core correctness premise is that
results are bit-identical under any partitioning (exact-decimal sums,
deterministic tie-breaks, engine-portable hashes). Lock it in by running
float-sensitive queries against adversarially re-partitioned inputs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.functions.numeric import dec, dsum, one_minus
from kinesis_sample_spark.queries import load_registry

REGISTRY = load_registry()
SF = "/root/testdata/sf0.01"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "name",
    ["q01_pricing_summary", "q15_running_order_totals", "q31_minhash_lsh", "q34_cosine_topk"],
)
def test_query_stable_across_runs(spark, name):
    """Two executions of the same plan (fresh lineage each time) must be
    bit-identical — no rand(), no arbitrary-survivor dedup, no
    accumulation-order dependence anywhere."""
    q = REGISTRY[name]
    assert _rows(q.fn(spark, SF)) == _rows(q.fn(spark, SF))


def test_decimal_sum_invariant_to_partitioning(spark):
    """The load-bearing claim for 100 TB: decimal aggregation gives the
    same doubles no matter how rows are distributed. Compare the natural
    scan layout against hostile repartitionings (1 partition ≡ sequential;
    64 hash partitions ≡ maximal reordering)."""
    li = load_table(spark, SF, "lineitem")

    def agg(df):
        return _rows(
            df.groupBy("l_returnflag").agg(
                dsum(dec("l_extendedprice") * one_minus("l_discount"), "rev"),
                dsum(dec("l_quantity"), "qty"),
            )
        )

    base = agg(li)
    assert agg(li.repartition(1)) == base
    assert agg(li.repartition(64, "l_partkey")) == base
    assert agg(li.sort(F.col("l_extendedprice").desc())) == base


def test_double_sum_is_not_invariant(spark):
    """Negative control: plain double sums DO drift across partitionings
    on this data — proving the decimal machinery is necessary, not
    ceremony."""
    li = load_table(spark, SF, "lineitem")

    def agg(df):
        return {
            r["l_returnflag"]: r["rev"]
            for r in df.groupBy("l_returnflag")
            .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"))
            .collect()
        }

    a = agg(li.repartition(1))
    b = agg(li.repartition(64, "l_partkey"))
    assert a.keys() == b.keys()
    # at least one group differs in the low bits (600k float adds)
    assert any(a[k] != b[k] for k in a), "double sums unexpectedly identical"
