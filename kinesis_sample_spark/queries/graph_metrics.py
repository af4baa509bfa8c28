"""Graph-structure metrics over the co-purchase graph — round-12 additions
next to q125 (PageRank), q150 (triangles), q198/q230 (pairs/lift).

Three operators the earlier graph family did not cover:

- q241: community extraction — connected components of the
  support-thresholded co-purchase graph, summarized per community. The
  Spark side runs the engine's pointer-jumping CC operator
  (operators/components.py); the oracle recomputes components with a
  recursive-CTE min-label closure, so the iterative operator is checked
  against a genuinely different algorithm.
- q246: degree distribution (power-of-two binned) — the first question
  anyone asks of a graph before choosing a partitioning strategy.
- q247: degree assortativity — do high-degree parts co-purchase with
  high-degree parts? (Pearson correlation of endpoint degrees over the
  symmetrized edge list.)

All three ride the bounded-basket pair projection from queries/graph.py
(MAX_BASKET cap riding the l_orderkey shuffle), so a single mega-basket
can never explode the edge list — the property that makes the family
100 TB-viable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.functions.numeric import sql_double
from kinesis_sample_spark.operators.components import connected_components
from kinesis_sample_spark.queries import query
from kinesis_sample_spark.queries.graph import MAX_BASKET, copurchase_pairs

#: minimum co-purchase support for an edge to enter the COMMUNITY graph.
#: Deliberately high: thresholding is what keeps components small and
#: meaningful (support-1 edges are mostly coincidence), and it also bounds
#: the oracle's recursive closure (rows = Σ|C|² over components).
COMMUNITY_MIN_SUPPORT = 3

#: shared pair projection (distinct (order, part) edges, MAX_BASKET cap,
#: pair counts) — textually identical to the q198 oracle so both families
#: audit the same relation.
_SQL_PAIRS = f"""op AS (
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
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS sup
    FROM bounded a
    JOIN bounded b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
)"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(part_a, part_b, sup) co-purchase counts — the Spark twin of the
    ``pairs`` CTE above."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    return copurchase_pairs(op, "l_orderkey", "l_partkey").withColumnRenamed(
        "n_orders", "sup"
    )


# ---------------------------------------------------------------------------
# q241 — co-purchase communities (CC of the thresholded graph).
# ---------------------------------------------------------------------------
@query(
    "q241_copurchase_communities",
    oracle=f"""
WITH RECURSIVE {_SQL_PAIRS},
edges AS (SELECT part_a, part_b, sup FROM pairs WHERE sup >= {COMMUNITY_MIN_SUPPORT}),
bidir AS (
    SELECT part_a AS a, part_b AS b FROM edges
    UNION ALL
    SELECT part_b, part_a FROM edges
),
reach(node, lbl) AS (
    SELECT a, a FROM (SELECT DISTINCT a FROM bidir) n
    UNION
    SELECT e.b, r.lbl FROM bidir e JOIN reach r ON e.a = r.node
),
lbl AS (SELECT node, MIN(lbl) AS community FROM reach GROUP BY node),
node_stats AS (
    SELECT community, CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM lbl GROUP BY community
),
edge_stats AS (
    SELECT l.community, CAST(COUNT(*) AS BIGINT) AS n_edges,
           CAST(SUM(e.sup) AS BIGINT) AS total_support
    FROM edges e JOIN lbl l ON l.node = e.part_a
    GROUP BY l.community
)
SELECT n.community, n.n_parts, e.n_edges, e.total_support
FROM node_stats n JOIN edge_stats e ON e.community = n.community
ORDER BY n.community
""",
)
def q241_copurchase_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Communities = connected components of the co-purchase graph at
    support >= {sup}: the product-affinity clusters a recommender or
    assortment planner actually consumes, summarized per community
    (member count, internal edges, total support). Community id = min
    part id, matching the engine's min-label CC exactly.

    Cross-algorithm check: Spark runs pointer-jumping label propagation
    (O(log diameter) rounds, eager localCheckpoint per round); the
    DuckDB oracle runs a recursive-CTE reachability closure — two
    independent algorithms must produce identical partitions.

    Scale: the support threshold (>= {sup}) is the load-bearing choice —
    it prunes the edge list to the statistically meaningful core BEFORE
    the iterative stage, so CC runs on a graph orders of magnitude
    smaller than the raw pair projection; the pair projection itself is
    MAX_BASKET-capped. The oracle's closure is quadratic per component,
    which the same pruning keeps trivially small; the Spark operator has
    no such limit.""".format(sup=COMMUNITY_MIN_SUPPORT)
    # materialize the thresholded edge list ONCE: it feeds both the CC
    # iteration (which would otherwise re-run the quadratic pair
    # projection to build its own checkpoint) and the edge_stats join.
    # Post-threshold it is tiny by construction; blocks are freed by
    # session.release_checkpoints between jobs.
    edges = (
        _edges(spark, sf_dir)
        .filter(F.col("sup") >= COMMUNITY_MIN_SUPPORT)
        .localCheckpoint(eager=True)
    )
    cc = connected_components(edges, "part_a", "part_b")
    node_stats = cc.groupBy("component").agg(F.count("*").alias("n_parts"))
    edge_stats = (
        edges.join(cc, edges.part_a == cc.node)
        .groupBy("component")
        .agg(F.count("*").alias("n_edges"), F.sum("sup").alias("total_support"))
    )
    return (
        node_stats.join(edge_stats, "component")
        .select(
            F.col("component").alias("community"),
            "n_parts",
            "n_edges",
            "total_support",
        )
        .orderBy("community")
    )


# ---------------------------------------------------------------------------
# q246 — degree distribution (power-of-two bins).
# ---------------------------------------------------------------------------
_MAX_EXP = 20


def _bucket_case(col: str) -> str:
    """Power-of-two bin index as a pure integer CASE ladder — shared SQL
    text for both engines, so there is no float log2 to disagree on
    (log2(8) is not reliably 3.0 across libm implementations)."""
    cases = " ".join(
        f"WHEN {col} >= {1 << e} THEN {e}" for e in range(_MAX_EXP, 0, -1)
    )
    return f"(CASE {cases} ELSE 0 END)"


@query(
    "q246_degree_distribution",
    oracle=f"""
WITH {_SQL_PAIRS},
deg AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT part_a AS node FROM pairs
        UNION ALL
        SELECT part_b FROM pairs
    ) t GROUP BY node
)
SELECT {_bucket_case('d')} AS bucket,
       CAST(MIN(d) AS BIGINT) AS min_degree,
       CAST(MAX(d) AS BIGINT) AS max_degree,
       CAST(COUNT(*) AS BIGINT) AS n_parts
FROM deg GROUP BY 1 ORDER BY bucket
""",
)
def q246_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the (unthresholded) co-purchase graph in
    power-of-two bins — the heavy-tail diagnostic that decides whether a
    downstream graph job needs skew handling (a part in the 2^10 bucket
    is a hub that will dominate any degree-keyed shuffle).

    The bin index is an integer CASE ladder, not floor(log2(d)): log2 of
    an exact power of two is not reliably exact across engines/libm.

    Scale: degrees are one count per node over the capped pair
    projection (each distinct pair contributes one endpoint row each
    way); output is <= {_MAX_EXP + 1} rows."""
    pairs = _edges(spark, sf_dir)
    deg = (
        pairs.select(F.col("part_a").alias("node"))
        .unionByName(pairs.select(F.col("part_b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    return (
        deg.groupBy(F.expr(_bucket_case("d")).alias("bucket"))
        .agg(
            F.min("d").alias("min_degree"),
            F.max("d").alias("max_degree"),
            F.count("*").alias("n_parts"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# q247 — degree assortativity (endpoint-degree Pearson r).
# ---------------------------------------------------------------------------
@query(
    "q247_degree_assortativity",
    oracle=f"""
WITH {_SQL_PAIRS},
deg AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT part_a AS node FROM pairs
        UNION ALL
        SELECT part_b FROM pairs
    ) t GROUP BY node
),
sym AS (
    SELECT da.d AS x, db.d AS y
    FROM pairs p JOIN deg da ON da.node = p.part_a JOIN deg db ON db.node = p.part_b
    UNION ALL
    SELECT db.d, da.d
    FROM pairs p JOIN deg da ON da.node = p.part_a JOIN deg db ON db.node = p.part_b
),
s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * y) AS BIGINT) AS sxy,
           CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy
    FROM sym
)
SELECT CAST(n / 2 AS BIGINT) AS n_edges,
       {sql_double(
           "CAST(round("
           "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
           " / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
           "  * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
           ", 6) AS DECIMAL(18,6))"
       )} AS assortativity
FROM s
""",
)
def q247_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity: Pearson r of (deg(a), deg(b)) over the
    symmetrized edge list. Negative r (hubs attach to leaves) predicts a
    very different join-skew profile than positive r (hub-hub cliques) —
    the scalar that tells you whether q246's tail nodes cluster.

    Determinism: every moment is an exact BIGINT sum; the single r
    expression is evaluated over exact inputs in IEEE doubles with
    identical operation order in both engines, then quantized
    round(.,6) -> DECIMAL -> double (the ln/log10 rule applied to a
    compound expression).

    Scale: two hash joins of the pair list against the (node, degree)
    relation, one global moment aggregation — no per-node state beyond
    the degree count. The Spark side folds the symmetrization into the
    moment algebra (one pass over the joined edges) instead of the
    oracle's explicit (x,y)+(y,x) union, which would re-execute the
    projection+join subtree per branch; the moments are the same exact
    integers either way (round-13 rewrite, outputs bit-identical)."""
    pairs = _edges(spark, sf_dir)
    deg = (
        pairs.select(F.col("part_a").alias("node"))
        .unionByName(pairs.select(F.col("part_b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    da = deg.select(F.col("node").alias("part_a"), F.col("d").alias("xa"))
    db = deg.select(F.col("node").alias("part_b"), F.col("d").alias("xb"))
    joined = pairs.join(da, "part_a").join(db, "part_b")
    # The symmetrized moments are computed algebraically from ONE pass
    # over `joined` instead of materializing the (x,y)+(y,x) union the
    # oracle spells out: over the mirrored list, n = 2·|E|,
    # sum x = sum y = Σ(xa+xb), sum xy = 2·Σ xa·xb, and
    # sum x² = sum y² = Σ(xa²+xb²). The union form re-executed the
    # pair-projection + degree-join subtree in both branches (measured
    # 10.9 s cold / 2.3 s steady at sf0.1 vs 3.7 / 1.9 for this form);
    # every moment is the SAME exact BIGINT either way, so the final
    # double is bit-identical to the oracle's union evaluation.
    s = joined.agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("xa") + F.col("xb")).alias("s1"),
        F.sum(F.col("xa") * F.col("xb")).alias("sp"),
        F.sum(F.col("xa") * F.col("xa") + F.col("xb") * F.col("xb")).alias("sq"),
    ).select(
        (F.col("cnt") * 2).alias("n"),
        F.col("s1").alias("sx"),
        F.col("s1").alias("sy"),
        (F.col("sp") * 2).alias("sxy"),
        F.col("sq").alias("sxx"),
        F.col("sq").alias("syy"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    r = (nd * sxy - sx * sy) / (
        F.sqrt(nd * sxx - sx * sx) * F.sqrt(nd * syy - sy * sy)
    )
    return s.select(
        (F.col("n") / F.lit(2)).cast("bigint").alias("n_edges"),
        F.round(r, 6).cast("decimal(18,6)").cast("double").alias("assortativity"),
    )
