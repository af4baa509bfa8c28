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


def test_lsh_recall_vs_brute_force_ground_truth(spark):
    """Completeness of the banded-LSH candidate generation: every pair
    with true jaccard >= 0.8 (brute-force over all doc pairs, word-shingle
    sets) must appear in q31's output. LSH banding is probabilistic in
    general; the fixture's planted near-dups sit at j ~ 0.98 where two
    4-hash bands detect with prob ~1 — a silent banding regression (wrong
    band split, broken hash seed) would show up here as a recall hole."""
    import itertools

    from kinesis_sample_spark.queries import load_registry

    sf = "/root/testdata/sf0.001"
    R = load_registry()
    docs = spark.read.parquet(f"{sf}/documents.parquet").collect()
    shingles = {}
    for r in docs:
        toks = r["text"].split(" ")
        if len(toks) < 3:
            continue
        shingles[r["doc_id"]] = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    truth = set()
    for a, b in itertools.combinations(sorted(shingles), 2):
        inter = len(shingles[a] & shingles[b])
        union = len(shingles[a] | shingles[b])
        if union and inter / union >= 0.8:
            truth.add((a, b))
    assert truth, "fixture should plant at least one near-dup pair at sf0.001"
    got = {
        (r["doc_a"], r["doc_b"])
        for r in R["q31_minhash_lsh"].fn(spark, sf).collect()
    }
    assert truth <= got, f"LSH missed true pairs: {sorted(truth - got)}"
    assert got <= truth, f"LSH emitted false pairs: {sorted(got - truth)}"


def test_kmeans_centroids_invariant_to_partitioning(spark):
    """The premise that lets q38 carry a full value-hash oracle: the
    fitted centroids are bit-identical under ANY partitioning (decimal-
    exact mean accumulation + explicit round-before-decimal-cast +
    lowest-cluster tie-breaks). Fit on the natural layout, a single
    partition (sequential), and 64 salted partitions (maximal reorder) —
    the doubles must be EXACTLY equal, not allclose."""
    from kinesis_sample_spark.operators.kmeans import kmeans_fit

    emb = load_table(spark, SF, "embeddings")
    base, _ = kmeans_fit(emb, k=4, n_iter=2, init="spread")
    seq, _ = kmeans_fit(emb.repartition(1), k=4, n_iter=2, init="spread")
    wide, _ = kmeans_fit(
        emb.repartition(64, F.pmod(F.hash("vec_id"), F.lit(64))),
        k=4,
        n_iter=2,
        init="spread",
    )
    assert base == seq
    assert base == wide
