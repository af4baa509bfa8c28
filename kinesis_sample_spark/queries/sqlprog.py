"""SQL programmability surfaces (Spark 4): SQL UDFs, session variables,
parameterized queries, EXECUTE IMMEDIATE, SQL scripting, collation.

Round-16 wave. Every query here exercises a declarative-surface feature
the registry had never touched — each one a distinct compilation or
binding path in the engine, not a new operator semantics:

- **SQL scalar UDF** (q337): ``CREATE FUNCTION ... RETURN expr`` —
  Catalyst INLINES the body into the caller's plan, so unlike every
  Python UDF in this repo the reusable function costs nothing at
  100 TB: it stays inside whole-stage codegen, filters through it still
  push down, and no serialization boundary appears. The scale story is
  the whole point: this is the packaging mechanism for shared business
  logic that does NOT leave the JVM.
- **SQL table function** (q338): ``RETURNS TABLE`` — an inlined,
  parameterized relation generator (the calendar-axis idiom: the dense
  month spine a gap-filling LEFT JOIN needs comes from a function, not
  a physical table).
- **Session variables + EXECUTE IMMEDIATE + parameterized sql()**
  (q339, q340): three binding paths for the same two-phase pattern —
  compute a small scalar once, bind it as a LITERAL into the big scan
  so it constant-folds and reaches PushedFilters (vs. the scalar
  subquery spelling, which plans a subquery join).
- **SQL scripting** (q341): ``BEGIN ... WHILE ... END`` procedural
  control flow. Each statement inside the loop is still a full
  distributed plan; the script is driver-side orchestration — the
  engine-native replacement for the Python-side loop every iterative
  operator in this repo (q125 pagerank, q38 k-means, q314 power
  iteration) drives from the host language.
- **Collation** (q344): ``COLLATE UTF8_LCASE`` grouping — equality
  itself becomes collation-aware; the hash aggregate buckets 'Apple'
  and 'APPLE' together with NO normalizing expression in the plan.

Single-session assumption (same as q332): temp functions, views and
session variables are q-prefixed and CREATE OR REPLACE'd, so re-runs
and cross-query interleaving in one session are safe, but two threads
racing the SAME query's setup would interleave — the driver and every
sweep tool run queries sequentially.

Reference: the reference repo (4 Java classes of Kinesis plumbing —
AmazonKinesisRecordProducerSample.java,
AmazonKinesisRecordConsumerSample.java,
AmazonKinesisApplicationSampleRecordProcessor.java and its factory) has
no SQL surface at all; these queries exist for SURVEY §2 Table B
"scalar functions / query surface" completeness of the engine built
OVER it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table, register_views
from kinesis_sample_spark.queries import query

# ---------------------------------------------------------------------------
# q337 — SQL scalar UDFs, inlined by Catalyst into codegen.
# ---------------------------------------------------------------------------
# The exact-integer convention: cents via round(p*100) is the proven
# cross-engine recipe (q171's oracle); bands compare BIGINTs only.
_Q337_BANDS_SQL = """CASE WHEN c < 10000000 THEN 'small'
     WHEN c < 30000000 THEN 'mid'
     ELSE 'large' END"""


@query(
    "q337_sql_udf_pricing_bands",
    oracle=f"""
SELECT {_Q337_BANDS_SQL.replace("c <", "CAST(round(o_totalprice * 100) AS BIGINT) <")} AS band,
       o_orderpriority,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
FROM orders
GROUP BY 1, 2
ORDER BY band, o_orderpriority
""",
)
def q337_sql_udf_pricing_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scalar UDFs (``CREATE FUNCTION ... RETURN expr``, Spark 4):
    ``q337_cents`` (exact integer cents) and ``q337_band`` (threshold
    banding) — reusable logic packaged WITHOUT leaving the JVM. Catalyst
    inlines both bodies into the caller, so the aggregation plan is
    byte-for-byte the plan of the hand-written expressions: no Python
    eval node, no serialization boundary, whole-stage codegen intact
    (plan-asserted in tests/test_round16_ops.py — the guard fails if a
    Spark upgrade ever stops inlining). The 100 TB contrast is q342:
    the SAME shape through a Python UDF pays an Arrow hop per batch;
    this pays nothing. The oracle is the inlined spelling, so the hash
    also gates that inlining preserved semantics.

    Determinism: all arithmetic is exact BIGINT (round(p*100) on
    positive 2-decimal doubles is the proven q171 recipe); counts and
    integer sums are order-insensitive."""
    register_views(spark, sf_dir, "orders")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION q337_cents(p DOUBLE) "
        "RETURNS BIGINT RETURN CAST(round(p * 100) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION q337_band(c BIGINT) "
        f"RETURNS STRING RETURN {_Q337_BANDS_SQL}"
    )
    return spark.sql(
        """
        SELECT q337_band(q337_cents(o_totalprice)) AS band,
               o_orderpriority,
               count(*) AS n_orders,
               CAST(sum(q337_cents(o_totalprice)) AS BIGINT) AS cents
        FROM orders
        GROUP BY 1, 2
        ORDER BY band, o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# q338 — SQL table function (RETURNS TABLE): the calendar-spine idiom.
# ---------------------------------------------------------------------------
@query(
    "q338_sql_tvf_month_spine",
    oracle="""
WITH spine AS (
  SELECT unnest(range(TIMESTAMP '2001-01-01', TIMESTAMP '2002-01-01',
                      INTERVAL 1 MONTH)) AS mon
),
agg AS (
  SELECT date_trunc('month', o_orderdate) AS mon,
         count(*) AS n,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '2001-01-01'
    AND o_orderdate < TIMESTAMP '2002-01-01'
  GROUP BY 1
)
SELECT s.mon, COALESCE(a.n, 0) AS n_orders, COALESCE(a.c, 0) AS cents
FROM spine s LEFT JOIN agg a ON a.mon = s.mon
ORDER BY s.mon
""",
)
def q338_sql_tvf_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL table function (``CREATE FUNCTION ... RETURNS TABLE``,
    Spark 4): a parameterized month-spine generator, LEFT-joined against
    the per-month revenue aggregate — the dense-axis gap-fill idiom
    (q55 does it with sequence+explode inline; here the spine is a
    REUSABLE, parameterized relation). 2001 is deliberately the fixture's
    ragged final year: orders stop in August, so four spine months
    survive only via the LEFT JOIN with zero-filled measures — the rows
    an inner join (or a spine derived from the data itself) would
    silently drop.

    Scale: the TVF body is inlined — a 12-row generated relation,
    broadcast against the month aggregate of the fact; the fact-side
    month filter pushes to the scan. Exact integer cents; month
    boundaries are calendar arithmetic, identical on both engines."""
    register_views(spark, sf_dir, "orders")
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION q338_months(y INT) "
        "RETURNS TABLE(mon TIMESTAMP) RETURN "
        "SELECT make_timestamp(y, m, 1, 0, 0, 0) "
        "FROM (SELECT explode(sequence(1, 12)) AS m)"
    )
    return spark.sql(
        """
        SELECT s.mon,
               COALESCE(a.n, CAST(0 AS BIGINT)) AS n_orders,
               COALESCE(a.c, CAST(0 AS BIGINT)) AS cents
        FROM q338_months(2001) s
        LEFT JOIN (
          SELECT date_trunc('MONTH', o_orderdate) AS mon,
                 count(*) AS n,
                 CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
          FROM orders
          WHERE o_orderdate >= TIMESTAMP '2001-01-01'
            AND o_orderdate < TIMESTAMP '2002-01-01'
          GROUP BY 1
        ) a ON a.mon = s.mon
        ORDER BY s.mon
        """
    )


# ---------------------------------------------------------------------------
# q339 — session variables: compute once, bind as a literal, push down.
# ---------------------------------------------------------------------------
@query(
    "q339_session_variable_threshold",
    oracle="""
WITH cut AS (
  SELECT CAST(floor(avg(CAST(round(o_totalprice * 100) AS BIGINT))) AS BIGINT)
         AS cut_cents
  FROM orders
)
SELECT o.o_orderpriority,
       count(*) AS n_above,
       CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents_above,
       (SELECT CAST(cut_cents AS DOUBLE) / 100.0 FROM cut) AS cut_dollars
FROM orders o
WHERE o.o_totalprice > (SELECT CAST(cut_cents AS DOUBLE) / 100.0 FROM cut)
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
)
def q339_session_variable_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session variables (``DECLARE`` / ``SET VARIABLE``, Spark 4) as the
    two-phase threshold pattern: phase 1 computes the mean order value
    ONCE (small scalar aggregate), phase 2 binds it into the big scan as
    a LITERAL — so the filter constant-folds and reaches the parquet
    scan's PushedFilters (plan-asserted). The contrast is the oracle's
    own spelling: a correlated scalar subquery, which an engine must
    plan as a subquery + join and cannot push into the scan before
    execution. At 100 TB the difference is reading row groups vs
    reading the table; the session-variable form is how a driver
    program hands the optimizer a closed predicate.

    Determinism: the threshold is floor(avg(exact integer cents)) — the
    sum is an exact BIGINT, n is exact, the double division and floor
    are identical on both engines; /100.0 is the same double everywhere.
    Exact-integer measures above the cut."""
    register_views(spark, sf_dir, "orders")
    spark.sql("DECLARE OR REPLACE VARIABLE q339_cut_cents BIGINT")
    spark.sql(
        "SET VARIABLE q339_cut_cents = ("
        "SELECT CAST(floor(avg(CAST(round(o_totalprice * 100) AS BIGINT)))"
        " AS BIGINT) FROM orders)"
    )
    spark.sql("DECLARE OR REPLACE VARIABLE q339_cut DOUBLE")
    spark.sql(
        "SET VARIABLE q339_cut = CAST(q339_cut_cents AS DOUBLE) / 100.0"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               count(*) AS n_above,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents_above,
               q339_cut AS cut_dollars
        FROM orders
        WHERE o_totalprice > q339_cut
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


# ---------------------------------------------------------------------------
# q340 — parameter binding: named args, positional args, EXECUTE IMMEDIATE.
# ---------------------------------------------------------------------------
_Q340_CUT = 250000.0
_Q340_SINCE = "1998-01-01 00:00:00"


@query(
    "q340_parameterized_binding",
    oracle=f"""
SELECT o_orderstatus,
       count(*) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
FROM orders
WHERE o_totalprice > {_Q340_CUT}
  AND o_orderdate >= TIMESTAMP '{_Q340_SINCE}'
GROUP BY o_orderstatus
ORDER BY o_orderstatus
""",
)
def q340_parameterized_binding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameterized SQL — the injection-safe binding surface, exercised
    through all three Spark 4 paths against ONE query text: named
    parameters (``:cut``), positional parameters (``?``), and dynamic
    SQL (``EXECUTE IMMEDIATE ... USING``). All three must produce the
    same literal-bound plan; the function asserts row-level equality of
    the three results in-process and returns the named-parameter one —
    so the hash gate covers the binding machinery end to end, and a
    binding path that ever coerced a parameter differently (the classic
    string-vs-timestamp bug) fails the internal cross-check loudly
    before it can reach the oracle.

    Scale: bound parameters become plan literals (pushed filters), and
    parameterized text gives plan-cache reuse across invocations —
    at fleet scale the compile cost of a repeated report amortizes to
    one. Exact integer cents; the date literal is a fixed timestamp."""
    register_views(spark, sf_dir, "orders")
    body = (
        "SELECT o_orderstatus, count(*) AS n, "
        "CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) "
        "AS cents FROM orders "
        "WHERE o_totalprice > {cut} AND o_orderdate >= {since} "
        "GROUP BY o_orderstatus ORDER BY o_orderstatus"
    )
    import datetime as _dt

    since_ts = _dt.datetime.strptime(_Q340_SINCE, "%Y-%m-%d %H:%M:%S")
    named = spark.sql(
        body.format(cut=":cut", since=":since"),
        args={"cut": _Q340_CUT, "since": since_ts},
    )
    pos = spark.sql(
        body.format(cut="?", since="?"),
        args=[_Q340_CUT, since_ts],
    )
    spark.sql("DECLARE OR REPLACE VARIABLE q340_sql STRING")
    spark.sql(
        "SET VARIABLE q340_sql = '"
        + body.format(cut="?", since="?").replace("'", "''")
        + "'"
    )
    dyn = spark.sql(
        f"EXECUTE IMMEDIATE q340_sql USING {_Q340_CUT}, "
        f"TIMESTAMP '{_Q340_SINCE}'"
    )
    rows_named = named.collect()
    for label, other in (("positional", pos), ("execute_immediate", dyn)):
        if [tuple(r) for r in other.collect()] != [tuple(r) for r in rows_named]:
            raise RuntimeError(
                f"q340: {label} binding diverged from named binding — "
                "a parameter coerced differently between binding paths"
            )
    return named


# ---------------------------------------------------------------------------
# q341 — SQL scripting: driver-side control flow, distributed statements.
# ---------------------------------------------------------------------------
@query(
    "q341_scripting_bisection_quantile",
    oracle="""
WITH c AS (
  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders
),
t AS (
  SELECT CAST(ceil(0.9 * count(*)) AS BIGINT) AS target,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM c
)
SELECT (SELECT cents FROM c ORDER BY cents
        LIMIT 1 OFFSET (SELECT target - 1 FROM t)) AS p90_cents,
       t.target AS target_rank,
       t.n_rows
FROM t
""",
)
def q341_scripting_bisection_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (``BEGIN ... WHILE ... END``, Spark 4): an exact
    90th-percentile threshold found by INTEGER BISECTION — the classic
    multi-pass distributed quantile (Munro-Paterson lower bound: exact
    selection needs passes; bisection does log2(range) of them). The
    loop is driver-side control flow in pure SQL; every statement inside
    it (the count below mid) is a full Catalyst-planned distributed
    aggregate — the engine-native spelling of what q125/q314/q38 drive
    from Python. Terminates in <= ~26 iterations here (cents range
    < 2^26); the loop invariant (count(<= lo-1) < target <= count(<= hi))
    makes lo the MINIMAL cents value whose running count reaches the
    target rank, which is exactly the order statistic the oracle reads
    with ORDER BY/OFFSET.

    Scale, stated honestly: one histogram-building pass plus log2(range)
    passes over the range-bounded histogram, against ONE sort (exact) or
    one approx_percentile pass (bounded error) — you choose bisection
    when range is small and a sort's shuffle is the thing you can't
    afford; the query exists to exercise the scripting surface with an
    exactly-gateable answer. All arithmetic BIGINT.

    Optimization r16 (guide §5 caching rule: reuse × recompute cost)
    persisted the raw cents projection so the ~28 scripted statements
    stopped re-scanning parquet. Optimization r17 goes one step further
    down the same §2.3 aggregate-before-you-iterate road: the scripted
    counts only ever ask "how many rows have cents <= mid", which a
    GROUP BY cents histogram answers exactly — so ONE distributed
    aggregation pass builds the histogram (cardinality bounded by the
    cents RANGE, < 2^26 cells regardless of row count, ~16 bytes/cell,
    MEMORY_AND_DISK so even the worst case spills instead of OOMing)
    and the 26 threshold counts become sums over that tiny persisted
    relation instead of 26 full passes over the fact. The answer is
    unchanged: count(cents <= mid) == sum over histogram cells with
    cents <= mid, n_rows == sum of all cells, max(cents) is the max
    cell key. The persist lives and dies inside this query: unpersisted
    in the ``finally`` once the script has run, so nothing leaks across
    bench/oracle invocations."""
    from pyspark.storagelevel import StorageLevel

    hist = (
        load_table(spark, sf_dir, "orders")
        .selectExpr("CAST(round(o_totalprice * 100) AS BIGINT) AS cents")
        .groupBy("cents")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # single partition, justified by the RANGE bound (not a local
        # tuned constant): the histogram is < 2^26 cells x 16 B <= ~1 GB
        # at ANY input size, and the 26+ scripted consumer jobs otherwise
        # each schedule shuffle.partitions near-empty tasks against the
        # cached copy (measured ~1 s of pure scheduling at sf0.1). The
        # aggregation itself still runs at full parallelism — the
        # repartition only collapses the (bounded) aggregated output.
        .repartition(1)
    )
    hist.persist(StorageLevel.MEMORY_AND_DISK)
    hist.createOrReplaceTempView("q341_cents_hist")
    try:
        return spark.sql(
            """
        BEGIN
          DECLARE lo BIGINT DEFAULT 0;
          DECLARE hi BIGINT;
          DECLARE mid BIGINT;
          DECLARE cnt BIGINT;
          DECLARE target BIGINT;
          DECLARE n_rows BIGINT;
          SET hi = (SELECT max(cents) FROM q341_cents_hist);
          SET n_rows = (SELECT coalesce(sum(cnt), 0) FROM q341_cents_hist);
          SET target = CAST(ceil(0.9 * n_rows) AS BIGINT);
          WHILE lo < hi DO
            SET mid = (lo + hi) DIV 2;
            SET cnt = (SELECT coalesce(sum(cnt), 0) FROM q341_cents_hist
                       WHERE cents <= mid);
            IF cnt >= target THEN
              SET hi = mid;
            ELSE
              SET lo = mid + 1;
            END IF;
          END WHILE;
          SELECT lo AS p90_cents, target AS target_rank, n_rows;
        END
        """
        )
    finally:
        # the script has fully executed by the time spark.sql returns —
        # its result depends only on script variables, never on the view
        hist.unpersist()


# ---------------------------------------------------------------------------
# q344 — collation-aware grouping (UTF8_LCASE).
# ---------------------------------------------------------------------------
_Q344_MIXED_SQL = """CASE CAST(p_partkey % 3 AS INT)
  WHEN 0 THEN lower(p_type)
  WHEN 1 THEN upper(p_type)
  ELSE concat(upper(substring(p_type, 1, 1)), lower(substring(p_type, 2)))
END"""


@query(
    "q344_collated_grouping",
    oracle=f"""
WITH m AS (SELECT {_Q344_MIXED_SQL} AS s, p_partkey FROM part)
SELECT lower(s) AS key,
       count(*) AS n,
       CAST(count(DISTINCT s) AS BIGINT) AS case_variants
FROM m
GROUP BY lower(s)
ORDER BY key
""",
)
def q344_collated_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String collation (Spark 4): grouping by a ``COLLATE UTF8_LCASE``
    expression makes EQUALITY ITSELF case-insensitive — the hash
    aggregate buckets 'economy', 'ECONOMY' and 'Economy' together with
    no normalizing function in the grouping key (the oracle, which has
    no such collation registered for its hash agg, spells the same
    semantics as ``GROUP BY lower(s)`` — two different mechanisms, one
    hash-gated answer). The inner ``count(DISTINCT s)`` runs under the
    default binary collation in the SAME aggregate, proving the two
    collations compose per-expression. The mixed-case input is derived
    deterministically (partkey mod 3 picks lower/UPPER/Title), shared
    as identical SQL text with the oracle.

    Scale: collation changes the key's equality/ordering functions, not
    the data movement — but it DOES change the physical strategy:
    Spark 4.1 cannot hash-aggregate collated keys, so the plan is a
    partial+final SORT-based aggregate (plan-asserted: SortAggregate,
    no HashAggregate), with the count(DISTINCT) adding the standard
    two-level rewrite. Same two key-exchanges as the binary-collation
    spelling; the sort-vs-hash aggregate is the real 100 TB cost of
    collated keys today and is exactly why the guard pins it. Output
    keys are lowercased for a collation-independent sort and hash."""
    register_views(spark, sf_dir, "part")
    return spark.sql(
        f"""
        WITH m AS (SELECT {_Q344_MIXED_SQL} AS s, p_partkey FROM part)
        SELECT lower(any_value(s)) AS key,
               count(*) AS n,
               count(DISTINCT s) AS case_variants
        FROM m
        GROUP BY s COLLATE UTF8_LCASE
        ORDER BY key
        """
    )
