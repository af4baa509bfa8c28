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

from pyspark.sql import DataFrame, SparkSession
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
