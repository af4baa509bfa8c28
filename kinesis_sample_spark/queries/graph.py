"""Graph analytics over catalog-shaped relations.

The part–supplier bipartite graph (edge = "this supplier shipped this
part", distinct (l_partkey, l_suppkey) from lineitem) is the natural
graph hiding in the TPC-H-ish fixtures: ~52k edges over 2k parts + 100
suppliers at sf0.01, hub-skewed on the supplier side — the same shape as
a domain–document or repo–file graph in a crawl corpus.

q125 runs :mod:`operators.pagerank` over it. Because the operator uses
pure integer arithmetic, the oracle is a straight 3-iteration SQL unroll
— a *hash-gated iterative algorithm*, which the float version could never
be (accumulation-order divergence). See operators/pagerank.py for the
scale analysis (one join + one agg per iteration, nothing on the driver).

Reference parity note: the reference (AmazonKinesisApplicationSample*.java)
has no graph surface; SURVEY §2 engine-category mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.operators.pagerank import (
    DAMP_DEN,
    DAMP_NUM,
    RANK_BASE,
    RANK_SCALE,
    pagerank_int,
)
from kinesis_sample_spark.queries import query

#: Supplier node id = OFFSET + suppkey, keeping the two key spaces
#: disjoint (TPC-H suppkey tops out at SF·10k — far below 1e12).
_SUPPLIER_OFFSET = 10**12
_ITERS = 3
_TOP = 25

# One unrolled iteration of the integer PageRank recurrence, as SQL.
# sum(BIGINT) is HUGEINT in DuckDB — the CAST back to BIGINT keeps every
# iteration's rank in the same type Spark carries (the q51 lesson).
def _sql_iter(prev: str, cur: str) -> str:
    return f"""{cur} AS (
  SELECT adj.v AS node,
         CAST({RANK_BASE} + (sum({prev}.pr // adj.d) * {DAMP_NUM}) // {DAMP_DEN} AS BIGINT) AS pr
  FROM adj JOIN {prev} ON {prev}.node = adj.u
  GROUP BY adj.v
)"""


_ORACLE = f"""
WITH e AS (
  SELECT DISTINCT l_partkey AS a, {_SUPPLIER_OFFSET} + l_suppkey AS b FROM lineitem
),
und AS (
  SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e
),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY u),
adj AS (SELECT und.u, und.v, deg.d FROM und JOIN deg USING (u)),
r0 AS (SELECT u AS node, CAST({RANK_SCALE} AS BIGINT) AS pr FROM deg),
{",".join(_sql_iter(f"r{i}", f"r{i + 1}") for i in range(_ITERS))}
SELECT node,
       CASE WHEN node >= {_SUPPLIER_OFFSET} THEN 'supplier' ELSE 'part' END AS kind,
       pr
FROM r{_ITERS}
ORDER BY pr DESC, node
LIMIT {_TOP}
"""


@query("q125_pagerank_part_supplier", oracle=_ORACLE)
def q125_pagerank_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{25} nodes of the part–supplier graph by 3-iteration integer
    PageRank. Suppliers dominate the top (each touches ~500 parts at
    sf0.01) — exactly the hub-detection use ("which domains anchor this
    crawl") the operator exists for. The bipartite encoding keeps both
    key spaces in one bigint node id, so the whole pipeline is
    join/agg-only; the oracle unrolls the identical recurrence serially
    and must match bit-for-bit thanks to integer arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        li.select(
            F.col("l_partkey").alias("a"),
            (F.lit(_SUPPLIER_OFFSET) + F.col("l_suppkey")).alias("b"),
        )
        .distinct()
    )
    ranks = pagerank_int(edges, "a", "b", iterations=_ITERS)
    return (
        ranks.select(
            "node",
            F.when(F.col("node") >= _SUPPLIER_OFFSET, "supplier")
            .otherwise("part")
            .alias("kind"),
            F.col("rank").alias("pr"),
        )
        .orderBy(F.desc("pr"), "node")
        .limit(_TOP)
    )


# ---------------------------------------------------------------------------
# q150 — triangle counting on the part co-occurrence graph.
# ---------------------------------------------------------------------------


@query(
    "q150_triangle_count",
    oracle="""
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT node, count(*) AS d
  FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
  GROUP BY node
),
wedges AS (
  SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) AS n_wedges FROM deg
),
tri AS (
  SELECT count(*) AS n_triangles
  FROM e ab JOIN e bc ON ab.v = bc.u
            JOIN e ac ON ac.u = ab.u AND ac.v = bc.v
),
edges AS (
  SELECT count(*) AS n_edges FROM e
)
SELECT n_edges, n_wedges, n_triangles,
       3.0 * n_triangles / n_wedges AS clustering_coeff
FROM edges, wedges, tri
""",
)
def q150_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle count + clustering coefficient over the part
    co-occurrence graph (parts sharing an order are adjacent — the
    products-bought-together projection). The canonical a<u<v ordered
    edge list means every triangle is generated exactly once by the
    wedge join (ab.v = bc.u) plus the closing-edge hash join — the
    standard distributed triangle algorithm (node-iterator over ordered
    edges); no nested loops, three hash equi-joins total.

    Scale notes (100 TB): the per-order pair expansion is quadratic in
    *per-order* part count, which TPC-H bounds at 7 (a crawl analog:
    links per page — cap the fan-out before pairing). The ordered edge
    direction makes high-degree hubs emit only their higher-id
    neighbors, the classic mitigation that keeps the wedge join from
    exploding on hubs; residual skew falls to AQE skew-join splitting.
    Counts are exact integers; the coefficient divides identical
    integers on both engines.

    Degree-ordered orientation (rank nodes by (degree, id), relabel
    edges low-rank→high-rank — the arboricity-bounded variant) was A/B
    tested in round 12 at sf0.1: 8.5–10.2 s vs 6.6–8.3 s for this
    id-ordered form, identical triangle count. The two rank-mapping
    joins cost more than the wedge-fan-out reduction saves because
    co-purchase degrees are basket-bounded (no true hubs); revisit only
    for graphs with power-law hubs."""
    op = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = op.alias("a"), op.alias("b")
    e = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .distinct()
        # NOT persisted: the edge list has multiple consumers, but its
        # distinct's shuffle output is already reused across them
        # (ReusedExchange) — an A/B at sf0.1 measured persist SLOWER
        # (10.9 s vs 8.5 s): cache materialization cost more than the
        # recompute it avoided. localCheckpoint retried in r10: also no
        # win (6.5/8.0 s vs 7.5/6.4 s baseline — inside noise); leave
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    wedges = deg.agg(
        F.sum((F.col("d") * (F.col("d") - 1) / 2)).cast("bigint").alias("n_wedges")
    )
    ab, bc, ac = e.alias("ab"), e.alias("bc"), e.alias("ac")
    tri = (
        ab.join(bc, F.col("ab.v") == F.col("bc.u"))
        .join(ac, (F.col("ac.u") == F.col("ab.u")) & (F.col("ac.v") == F.col("bc.v")))
        .agg(F.count("*").alias("n_triangles"))
    )
    edges = e.agg(F.count("*").alias("n_edges"))
    return (
        edges.crossJoin(F.broadcast(wedges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_edges",
            "n_wedges",
            "n_triangles",
            (F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges")).alias(
                "clustering_coeff"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q198 — market-basket co-purchase pairs (bipartite order->part projection).
# ---------------------------------------------------------------------------
MAX_BASKET = 32
"""Mega-basket bound for co-purchase pair generation: a basket with more
than this many distinct items is excluded before pairing. Pair fan-out is
quadratic in basket size, so one crawler-cart outlier with 100k items
would emit 5e9 pairs into a single shuffle partition; the bound makes the
worst case MAX_BASKET^2 per basket regardless of input skew."""


def bounded_baskets(
    op: DataFrame, basket_key: str, max_basket: int = MAX_BASKET
) -> DataFrame:
    """Drop baskets larger than ``max_basket`` whole — the cap is a
    window count over the basket key, so it rides the same shuffle the
    downstream self-join needs anyway. Shared by the pair/triple/lift
    queries so callers that also need item supports or basket counts
    (q230) bound the relation exactly once."""
    sized = op.withColumn(
        "basket_size", F.count("*").over(Window.partitionBy(basket_key))
    )
    return sized.filter(F.col("basket_size") <= max_basket).drop("basket_size")


def pair_counts(bounded: DataFrame, basket_key: str, item_key: str) -> DataFrame:
    """(part_a, part_b, n_orders) co-occurrence counts over an
    already-bounded (basket, item) edge relation."""
    a = bounded.alias("a")
    b = bounded.alias("b")
    pairs = a.join(
        b,
        (F.col(f"a.{basket_key}") == F.col(f"b.{basket_key}"))
        & (F.col(f"a.{item_key}") < F.col(f"b.{item_key}")),
    ).select(
        F.col(f"a.{item_key}").alias("part_a"),
        F.col(f"b.{item_key}").alias("part_b"),
    )
    return pairs.groupBy("part_a", "part_b").agg(F.count("*").alias("n_orders"))


def copurchase_pairs(
    op: DataFrame, basket_key: str, item_key: str, max_basket: int = MAX_BASKET
) -> DataFrame:
    """Bounded bipartite projection: distinct (basket, item) edges in,
    (part_a, part_b, n_orders) co-occurrence counts out (bounded_baskets
    + pair_counts)."""
    return pair_counts(
        bounded_baskets(op, basket_key, max_basket), basket_key, item_key
    )


@query(
    "q198_copurchase_pairs",
    oracle=f"""
WITH op AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
bounded AS (
    SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS basket_size
        FROM op
    ) s WHERE basket_size <= {MAX_BASKET}
),
pairs AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
    FROM bounded a JOIN bounded b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT part_a, part_b, COUNT(*) AS n_orders
FROM pairs GROUP BY part_a, part_b
ORDER BY n_orders DESC, part_a, part_b
LIMIT 100
""",
)
def q198_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: project the bipartite order–part
    graph onto parts by counting orders that contain both parts of a
    pair (the candidate-generation step of association-rule mining, and
    the item-item edge list behind co-purchase recommenders). Dedup to
    distinct (order, part) first so multi-line orders don't inflate
    support, drop mega-baskets above ``MAX_BASKET`` items (enforced in
    code — round-9 verdict item 5 — and brute-force-tested in
    tests/test_round10_ops.py), self-join co-partitioned on the order
    key with a strict key inequality (each unordered pair once), then a
    pair-keyed count and a tie-broken top-100 (TakeOrdered heap merge,
    no global sort).

    Scale: the self-join shuffles both sides on l_orderkey once and the
    basket-size window rides that same partitioning; pair fan-out is
    quadratic only in the capped basket size — never in corpus size. On
    TPC-H (baskets <= 7) the cap drops nothing, so the oracle applies
    the identical bound and parity pins that equivalence."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    return (
        copurchase_pairs(op, "l_orderkey", "l_partkey")
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q220 — frequent 3-itemsets over capped baskets (A-priori candidate step).
# ---------------------------------------------------------------------------
@query(
    "q220_itemset3_support",
    oracle=f"""
WITH op AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
bounded AS (
    SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS basket_size
        FROM op
    ) s WHERE basket_size <= {MAX_BASKET}
)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, c.l_partkey AS part_c,
       CAST(COUNT(*) AS BIGINT) AS support
FROM bounded a
JOIN bounded b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
JOIN bounded c ON b.l_orderkey = c.l_orderkey AND b.l_partkey < c.l_partkey
GROUP BY a.l_partkey, b.l_partkey, c.l_partkey
ORDER BY support DESC, part_a, part_b, part_c
LIMIT 100
""",
)
def q220_itemset3_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent 3-itemsets (the A-priori candidate-generation step one
    level above q198's pairs): orders containing all three parts of an
    ordered triple, counted per triple, top-100 by support. The triple
    fan-out is C(basket, 3), so the same MAX_BASKET cap as q198 bounds
    the worst case at ~5500 triples per basket instead of unbounded
    cubic blow-up on a crawler-cart outlier.

    Scale: all three self-join legs key on l_orderkey — one shuffle
    partitioning serves the whole join tree (co-partitioned sort-merge,
    no re-shuffle between legs); the support count is word-count-shaped
    and the top-100 is a TakeOrdered heap merge, not a global sort."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    bounded = bounded_baskets(op, "l_orderkey")
    a = bounded.alias("a")
    b = bounded.alias("b")
    c = bounded.alias("c")
    triples = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .join(
            c,
            (F.col("b.l_orderkey") == F.col("c.l_orderkey"))
            & (F.col("b.l_partkey") < F.col("c.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
            F.col("c.l_partkey").alias("part_c"),
        )
    )
    return (
        triples.groupBy("part_a", "part_b", "part_c")
        .agg(F.count("*").alias("support"))
        .orderBy(F.col("support").desc(), "part_a", "part_b", "part_c")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q230 — association-rule lift/confidence over capped baskets.
# ---------------------------------------------------------------------------
@query(
    "q230_association_lift",
    oracle=f"""
WITH op AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
bounded AS (
    SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS basket_size
        FROM op
    ) s WHERE basket_size <= {MAX_BASKET}
),
item AS (
    SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM bounded GROUP BY l_partkey
),
pair AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS c_ab
    FROM bounded a JOIN bounded b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
),
nb AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM bounded)
SELECT part_a, part_b, c_ab,
       CAST(ia.c AS BIGINT) AS c_a, CAST(ib.c AS BIGINT) AS c_b,
       (CAST(n AS DOUBLE) * c_ab) / (ia.c * ib.c) AS lift,
       CAST(c_ab AS DOUBLE) / ia.c AS confidence_a_to_b
FROM pair
JOIN item ia ON ia.l_partkey = part_a
JOIN item ib ON ib.l_partkey = part_b
CROSS JOIN nb
WHERE c_ab >= 2
ORDER BY lift DESC, part_a, part_b
LIMIT 100
""",
)
def q230_association_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule lift and confidence over the capped baskets —
    the scoring step after q198's candidate pairs (lift > 1 = genuinely
    bought together; q211 gives the log-scaled PMI view, this gives the
    retailer's ratio view with no transcendental at all): lift = N*c_ab
    / (c_a*c_b), confidence = c_ab/c_a, both single divisions of exact
    integers, minimum support 2 so singleton coincidences never rank.

    Scale: pair and item supports ride the same l_orderkey shuffle as
    q198/q220 (the MAX_BASKET window cap bounds pair fan-out); the
    support joins are pair-keyed equi-joins; top-100 is a TakeOrdered
    heap merge.

    Session hygiene: the shared ``bounded`` subtree stays persisted for
    the returned (lazy) DataFrame's execution — the blocks outlive this
    call by design. Long-lived sessions running many queries should call
    :func:`kinesis_sample_spark.session.release_checkpoints` between
    jobs to free them (the evidence sweep tools do)."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    # bound ONCE and persist: pairs, item supports, and the basket count
    # all consume this relation — unshared, the distinct + cap window
    # subtree executes three times (A/B at sf0.1: 4.1 s -> 2.7-3.4 s)
    bounded = bounded_baskets(op, "l_orderkey").persist()
    item = bounded.groupBy("l_partkey").agg(F.count("*").alias("c"))
    pair = pair_counts(bounded, "l_orderkey", "l_partkey").withColumnRenamed(
        "n_orders", "c_ab"
    )
    nb = bounded.agg(F.countDistinct("l_orderkey").alias("n"))
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("c_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("c_b"))
    return (
        pair.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(nb))
        .filter(F.col("c_ab") >= 2)
        .select(
            "part_a",
            "part_b",
            "c_ab",
            "c_a",
            "c_b",
            ((F.col("n").cast("double") * F.col("c_ab")) / (F.col("c_a") * F.col("c_b"))).alias("lift"),
            (F.col("c_ab").cast("double") / F.col("c_a")).alias("confidence_a_to_b"),
        )
        .orderBy(F.col("lift").desc(), "part_a", "part_b")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q237 — brand-affinity matrix (co-purchase projected to brand grain).
# ---------------------------------------------------------------------------
@query(
    "q237_brand_affinity",
    oracle=f"""
WITH op AS (
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
bounded AS (
    SELECT l_orderkey, l_partkey FROM (
        SELECT l_orderkey, l_partkey,
               COUNT(*) OVER (PARTITION BY l_orderkey) AS basket_size
        FROM op
    ) s WHERE basket_size <= {MAX_BASKET}
),
ob AS (
    SELECT DISTINCT l_orderkey, p_brand
    FROM bounded JOIN part ON p_partkey = l_partkey
)
SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM ob a JOIN ob b
  ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
GROUP BY a.p_brand, b.p_brand
ORDER BY n_orders DESC, brand_a, brand_b
LIMIT 100
""",
)
def q237_brand_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand-affinity matrix: q198's co-purchase projection lifted to the
    bounded-cardinality brand grain (the heat-map a merchandiser reads;
    for a corpus, the source-cosampling matrix) — dedup to distinct
    (order, brand) FIRST so two parts of the same brand in one basket
    count once, then the ordered pair count. The part->brand lookup is a
    broadcast dim join before the self-join.

    Scale: same single orderkey shuffle as q198/q220/q230 (the cap rides
    it); the brand pair space is bounded by brand cardinality squared,
    so the aggregate state is constant at any SF."""
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    op = li.select("l_orderkey", "l_partkey").distinct()
    bounded = bounded_baskets(op, "l_orderkey")
    ob = (
        bounded.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    a, b = ob.alias("a"), ob.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.p_brand") < F.col("b.p_brand")),
        )
        .groupBy(
            F.col("a.p_brand").alias("brand_a"), F.col("b.p_brand").alias("brand_b")
        )
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "brand_a", "brand_b")
        .limit(100)
    )
