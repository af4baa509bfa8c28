"""Semantics corners — null handling, map/JSON explosion, deterministic
sampling, and time-series gap filling (Table B rows "Predicates", "Scalar
functions", plus the densification idiom every metrics pipeline needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.functions.hashing import md5_long, md5_long_sql
from kinesis_sample_spark.queries import query


# ---------------------------------------------------------------------------
# q52 — null semantics: outer-join nulls through arithmetic/comparison.
# ---------------------------------------------------------------------------
@query(
    "q52_null_semantics",
    oracle="""
WITH j AS (
    SELECT c_custkey, c_acctbal, o_totalprice
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 400000
)
SELECT c_custkey,
       COALESCE(o_totalprice, 0.0) AS price_or_zero,
       NULLIF(c_acctbal, 0.0) AS bal_or_null,
       (o_totalprice IS NULL) AS no_big_order,
       CASE WHEN o_totalprice IS NOT NULL AND c_acctbal IS NOT NULL
            THEN o_totalprice + c_acctbal END AS sum_or_null,
       COUNT(*) OVER (PARTITION BY c_custkey) AS n_rows_for_cust
FROM j
ORDER BY c_custkey, price_or_zero
""",
)
def q52_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued logic through an outer join: COALESCE/NULLIF, IS NULL
    predicates, null-propagating arithmetic — identical SQL semantics on
    both engines, so any engine deviation in null handling trips the
    hash."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    j = cust.join(
        orders,
        (cust.c_custkey == orders.o_custkey) & (orders.o_totalprice > 400000),
        "left",
    ).select("c_custkey", "c_acctbal", "o_totalprice")
    from pyspark.sql import Window as W

    return (
        j.select(
            "c_custkey",
            F.coalesce("o_totalprice", F.lit(0.0)).alias("price_or_zero"),
            F.nullif(F.col("c_acctbal"), F.lit(0.0)).alias("bal_or_null"),
            F.col("o_totalprice").isNull().alias("no_big_order"),
            F.when(
                F.col("o_totalprice").isNotNull() & F.col("c_acctbal").isNotNull(),
                F.col("o_totalprice") + F.col("c_acctbal"),
            ).alias("sum_or_null"),
            F.count("*").over(W.partitionBy("c_custkey")).alias("n_rows_for_cust"),
        )
        .orderBy("c_custkey", "price_or_zero")
    )


# ---------------------------------------------------------------------------
# q53 — map/JSON explosion: payload → (key, value) rows.
# ---------------------------------------------------------------------------
@query(
    "q53_props_map_explode",
    oracle="""
SELECT event_id, k AS key, CAST(json_extract_string(props, k) AS INTEGER) AS val
FROM (SELECT event_id, props, unnest(json_keys(props)) AS k FROM events) t
ORDER BY event_id, key
""",
)
def q53_props_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The generic form of A12's payload lift: parse the opaque JSON
    payload into a map and explode to key/value rows (works for any key
    set, unlike the fixed-schema from_json in q19)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.explode(F.from_json("props", "map<string,int>")).alias("key", "val"),
        )
        .orderBy("event_id", "key")
    )


# ---------------------------------------------------------------------------
# q54 — deterministic hash sampling.
# ---------------------------------------------------------------------------
@query(
    "q54_hash_sample",
    oracle=f"""
SELECT event_id, user_id, event_type
FROM events
WHERE {md5_long_sql("CAST(event_id AS VARCHAR)")} % 100 < 10
ORDER BY event_id
""",
)
def q54_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~10% sample via hash-mod on the key — unlike
    ``df.sample`` this is stable across engines, runs, partitionings and
    retries, which is what experiment pipelines actually need. Scale:
    pure map-side filter."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(md5_long(F.col("event_id").cast("string")) % 100 < 10)
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# q55 — time-series gap filling (densification).
# ---------------------------------------------------------------------------
@query(
    "q55_gap_fill_daily",
    oracle="""
WITH bounds AS (
    SELECT CAST(date_trunc('day', MIN(ts)) AS TIMESTAMP) AS d0,
           CAST(date_trunc('day', MAX(ts)) AS TIMESTAMP) AS d1
    FROM events
),
grid AS (
    SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
    FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 20), bounds
),
actual AS (
    SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n
    FROM events WHERE user_id < 20 GROUP BY 1, 2
)
SELECT g.user_id, g.day, COALESCE(a.n, 0) AS n_events
FROM grid g LEFT JOIN actual a ON a.user_id = g.user_id AND a.day = g.day
ORDER BY g.user_id, g.day
""",
)
def q55_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densify per-user daily counts over the full corpus date range:
    sequence+explode builds the grid, outer join fills zeros. Scale: the
    grid is (keys × days) — generated, never shuffled wide; the join keys
    on (user, day) which is also the aggregation key, so AQE reuses the
    partitioning."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    bounds = load_table(spark, sf_dir, "events").agg(
        F.date_trunc("day", F.min("ts")).alias("d0"),
        F.date_trunc("day", F.max("ts")).alias("d1"),
    )
    grid = (
        ev.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))).alias("day"),
        )
    )
    actual = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("n"))
    return (
        grid.join(actual, ["user_id", "day"], "left")
        .select("user_id", "day", F.coalesce("n", F.lit(0)).alias("n_events"))
        .orderBy("user_id", "day")
    )


# ---------------------------------------------------------------------------
# q163 — map-type operator gallery.
# ---------------------------------------------------------------------------
@query(
    "q163_map_ops_gallery",
    oracle="""
SELECT l_orderkey, l_linenumber,
       3 AS n_entries,
       2 AS n_kept,
       'disc:' || CAST(l_discount * 100 AS VARCHAR)
         || ' qty:' || CAST(l_quantity * 100 AS VARCHAR) AS kept_scaled,
       'price' AS dropped_key,
       l_quantity + l_extendedprice + l_discount AS value_sum
FROM lineitem
WHERE l_orderkey < 100
ORDER BY l_orderkey, l_linenumber
""",
)
def q163_map_ops_gallery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface under the gate: build a map from arrays, filter
    entries by value (price is always the largest of the three, so the
    kept set is deterministic), scale values with transform_values, fold
    values with a HOF over map_values, and name the dropped key via
    map_keys + except. The oracle recomputes the final scalars directly —
    it gates that the map-op COMPOSITION lands on the right values, while
    the Spark side proves the ops themselves compose. Canonical output is
    sorted 'k:v' strings (maps are unordered; driver canonicalizers need
    scalars). Map columns are per-row structures — map ops are map-only
    expressions, nothing here shuffles at any scale."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    m = F.map_from_arrays(
        F.array(F.lit("qty"), F.lit("price"), F.lit("disc")),
        F.array(
            F.col("l_quantity").cast("double"),
            F.col("l_extendedprice").cast("double"),
            F.col("l_discount").cast("double"),
        ),
    )
    kept = F.map_filter(m, lambda k, v: v < F.col("l_extendedprice"))
    scaled = F.transform_values(kept, lambda k, v: v * 100)
    kept_str = F.array_join(
        F.transform(
            F.array_sort(F.map_keys(scaled)),
            lambda k: F.concat(k, F.lit(":"), F.element_at(scaled, k).cast("string")),
        ),
        " ",
    )
    dropped = F.array_join(
        F.array_sort(F.array_except(F.map_keys(m), F.map_keys(kept))), ","
    )
    value_sum = F.aggregate(F.map_values(m), F.lit(0.0), lambda a, v: a + v)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.size(m).alias("n_entries"),
            F.size(kept).alias("n_kept"),
            kept_str.alias("kept_scaled"),
            dropped.alias("dropped_key"),
            value_sum.alias("value_sum"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# q168 — recursive CTE (transitive closure / hierarchy walk).
# ---------------------------------------------------------------------------
_RECURSIVE_SQL = """
WITH RECURSIVE tree AS (
  SELECT p_partkey, CAST(p_partkey // 4 AS BIGINT) AS parent,
         0 AS depth,
         CAST(p_partkey AS STRING) AS path
  FROM part WHERE p_partkey = 0
  UNION ALL
  SELECT c.p_partkey, CAST(c.p_partkey // 4 AS BIGINT) AS parent,
         t.depth + 1,
         t.path || '>' || CAST(c.p_partkey AS STRING)
  FROM part c JOIN tree t ON c.p_partkey // 4 = t.p_partkey
  WHERE c.p_partkey <> 0
)
SELECT p_partkey, parent, depth, path FROM tree
ORDER BY p_partkey
"""


@query("q168_recursive_cte", oracle=_RECURSIVE_SQL)
def q168_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark ≥4.0) over a synthetic part hierarchy
    (parent = partkey // 4, rooted at 0): each part's depth and full
    ancestor path — the BOM-explosion / org-chart shape. The IDENTICAL
    SQL text runs on both engines; Spark executes the recursion as an
    iterative union of DataFrame steps (one join per level, ~log₄ n
    levels), which is exactly how the engine's hand-built iterative
    operators (PageRank, connected components) are shaped — this gates
    the declarative spelling. Depth is O(log n), so the plan stays
    shallow at any corpus size; each level's join is partkey-equi and
    AQE-broadcastable."""
    from kinesis_sample_spark.catalog import register_views

    register_views(spark, sf_dir, "part")
    # Spark needs integer div spelled `div`; DuckDB uses `//` — keep one
    # text by using floor division via DIV on both? DuckDB lacks DIV, so
    # translate just that token for the Spark run.
    return spark.sql(_RECURSIVE_SQL.replace("//", "div"))


# ---------------------------------------------------------------------------
# q172 — LATERAL correlated subquery (per-row top-k the SQL way).
# ---------------------------------------------------------------------------
_LATERAL_SQL = """
SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 2
) t
ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey
"""


@query("q172_lateral_topk", oracle=_LATERAL_SQL)
def q172_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — top-2 orders per customer spelled as
    a per-row dependent subquery instead of q14's window rank. The
    IDENTICAL SQL text runs on both engines. Catalyst decorrelates the
    LATERAL into a ranked join (no per-row re-execution), so the plan
    cost matches the window formulation — the gate proves the
    decorrelation rewrite preserves limit/order semantics, including
    customers with <2 or 0 orders (dropped, inner-join semantics)."""
    from kinesis_sample_spark.catalog import register_views

    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(_LATERAL_SQL)


# ---------------------------------------------------------------------------
# q173 — row-value IN subquery (multi-column membership predicate).
# ---------------------------------------------------------------------------
_ROW_IN_SQL = """
SELECT o_orderstatus, count(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders
WHERE (o_custkey, o_orderstatus) IN
      (SELECT c_custkey, 'O' FROM customer WHERE c_acctbal > 5000)
   OR (o_custkey, o_orderstatus) IN
      (SELECT c_custkey, 'F' FROM customer WHERE c_acctbal < 0)
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


_ROW_IN_ORACLE = """
SELECT o_orderstatus, count(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders
WHERE EXISTS (SELECT 1 FROM customer
              WHERE c_custkey = o_custkey AND c_acctbal > 5000
                AND o_orderstatus = 'O')
   OR EXISTS (SELECT 1 FROM customer
              WHERE c_custkey = o_custkey AND c_acctbal < 0
                AND o_orderstatus = 'F')
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@query("q173_row_value_in", oracle=_ROW_IN_ORACLE)
def q173_row_value_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column (row-value) IN membership against correlated-free
    subqueries, disjunctively combined — Catalyst compiles each to a
    semi-join over a composite key rather than per-row subquery
    evaluation. DuckDB does not bind multi-column IN subqueries, so the
    oracle is the EXISTS rewrite of the same predicate — gating the
    SEMANTICS of Spark's row-value IN, including the disjunction
    (a row must not double-count when matching both branches).
    Exact-decimal sums for the value gate."""
    from kinesis_sample_spark.catalog import register_views

    register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(_ROW_IN_SQL)
