"""Spark 4 SQL-surface additions: VARIANT and pipe syntax.

Two capabilities the Spark 4 line added to the engine's declarative
surface, each gated against the oracle's classical spelling:

- VARIANT (q169): schemaless semi-structured values with typed extraction
  — the engine-native home for the reference's JSON-ish opaque payloads
  (the jackson-core dependency the reference declares but never uses,
  pom.xml:24-27). Parsing keeps binary-encoded variants JVM-side;
  extraction is codegen'd, so the 100 TB cost is one parse per row, no
  Python, no schema inference pass.
- SQL pipe syntax (q170): the |> operator-chain spelling; compiles to the
  same logical plan as the classical query, which the identical-result
  hash proves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table, register_views
from kinesis_sample_spark.queries import query


# ---------------------------------------------------------------------------
# q169 — VARIANT parse + typed extraction over the event payload.
# ---------------------------------------------------------------------------
@query(
    "q169_variant_payload",
    oracle="""
SELECT event_id,
       CAST(props->>'k' AS INTEGER) AS k_int,
       CAST(props->>'k' AS VARCHAR) AS k_str,
       CAST(props->>'k' AS INTEGER) IS NOT NULL AS has_k,
       CASE WHEN CAST(props->>'k' AS INTEGER) IS NULL THEN NULL
            WHEN CAST(props->>'k' AS INTEGER) % 2 = 0 THEN 'even' ELSE 'odd' END
         AS parity
FROM events
ORDER BY event_id
""",
)
def q169_variant_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_json → VARIANT → variant_get typed extraction (int and
    string views of the same path), plus null-safe derived logic. The
    oracle reads the same payloads with DuckDB's JSON operators — same
    values, different engine machinery, so the hash gates Spark's variant
    binary encoding round trip."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k_int = F.try_variant_get(v, "$.k", "int")
    return (
        ev.select(
            "event_id",
            k_int.alias("k_int"),
            F.try_variant_get(v, "$.k", "string").alias("k_str"),
            k_int.isNotNull().alias("has_k"),
            F.when(k_int.isNull(), None)
            .when(k_int % 2 == 0, "even")
            .otherwise("odd")
            .alias("parity"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# q170 — SQL pipe syntax (|>) compiling to the classical plan.
# ---------------------------------------------------------------------------
_PIPE_SQL = """
FROM lineitem
|> WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
|> AGGREGATE count(*) AS n_rows,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
   GROUP BY l_returnflag, l_linestatus
|> SELECT l_returnflag, l_linestatus, n_rows, sum_qty
|> ORDER BY l_returnflag, l_linestatus
"""


@query(
    "q170_pipe_syntax",
    oracle="""
SELECT l_returnflag, l_linestatus,
       count(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q170_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipe-operator spelling of a Q1-shape aggregation. Pipe syntax
    is sugar over the same Catalyst plan — filters still push down,
    aggregates still split partial/final — which the value hash against
    the classical oracle demonstrates. Exact-decimal quantity sums keep
    the float-order determinism contract of functions/numeric.py."""
    register_views(spark, sf_dir, "lineitem")
    return spark.sql(_PIPE_SQL)


# ---------------------------------------------------------------------------
# q174 — SQL sugar: GROUP BY ALL / ORDER BY ALL / SELECT * EXCEPT.
# ---------------------------------------------------------------------------
#: one template, one differing token: Spark spells column exclusion
#: `* EXCEPT (c)`, DuckDB `* EXCLUDE (c)` — same semantics.
_SUGAR_TEMPLATE = """
SELECT * {EXCLUDE} (max_price)
FROM (
  SELECT o_orderstatus, o_orderpriority,
         count(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
         max(o_totalprice) AS max_price
  FROM orders
  GROUP BY ALL
)
ORDER BY ALL
"""
_SUGAR_SQL = _SUGAR_TEMPLATE.format(EXCLUDE="EXCEPT")


@query("q174_sql_sugar", oracle=_SUGAR_TEMPLATE.format(EXCLUDE="EXCLUDE"))
def q174_sql_sugar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analyst-ergonomics sugar shared by both engines, one text: GROUP BY
    ALL (group on every non-aggregate select item), ORDER BY ALL (sort by
    every output column left-to-right), SELECT * EXCEPT — DuckDB's
    EXCLUDE — (project away a
    column post-aggregation — the column-pruning rule then drops its
    computation where possible). Sugar desugars in the analyzer; this
    gates that both engines desugar to the same query."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(_SUGAR_SQL)
