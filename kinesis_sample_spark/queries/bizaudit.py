"""Business-rule and data-layout audits — round-12 additions.

Operational audit operators over the star schema: functional-dependency
checks, shift-share growth decomposition, rapid-repeat-order (double
billing) detection, customer value-band migration, key-space density,
month-over-month contribution, and exact largest-remainder point
allocation. Each is the kind of reconciliation query a warehouse team
runs nightly; together they extend the audit family (q147 skew, q201
k-anonymity, q205 referential integrity, q225 column profile, q238
cardinality estimates) from physical health to business invariants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.functions.numeric import sql_double
from kinesis_sample_spark.queries import query


def _dec2(col):
    return F.round(col, 2).cast("decimal(18,2)")


# ---------------------------------------------------------------------------
# q254 — functional-dependency audit.
# ---------------------------------------------------------------------------
#: candidate FDs: (label, table, lhs, rhs). Deliberately a mix of
#: plausible-and-violated and plausible-and-holding dependencies — the
#: audit's value is the violation_rate column, not a boolean.
_FDS = (
    ("part.brand->type", "part", "p_brand", "p_type"),
    ("part.name->brand", "part", "p_name", "p_brand"),
    ("customer.segment->nation", "customer", "c_mktsegment", "c_nationkey"),
    ("orders.cust->priority", "orders", "o_custkey", "o_orderpriority"),
    ("lineitem.part->supp", "lineitem", "l_partkey", "l_suppkey"),
)


def _sql_fd_branch(label: str, table: str, lhs: str, rhs: str) -> str:
    return f"""
SELECT '{label}' AS fd,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS violating_groups,
       SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) / COUNT(*) AS violation_rate,
       CAST(MAX(nd) AS BIGINT) AS max_rhs_distinct
FROM (SELECT {lhs}, COUNT(DISTINCT {rhs}) AS nd FROM {table} GROUP BY {lhs}) g"""


@query(
    "q254_fd_audit",
    oracle="SELECT * FROM ("
    + "\nUNION ALL ".join(_sql_fd_branch(*fd) for fd in _FDS)
    + ") u ORDER BY fd",
)
def q254_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit: for each candidate X -> Y, the share
    of X-groups carrying more than one distinct Y — the schema-inference
    primitive behind normalization checks and silent-denormalization
    drift detection. violation_rate is a single division of exact
    counts.

    Scale: one hash aggregate per candidate on the lhs key (distinct
    rhs counts ride it); candidates evaluate independently — at
    cluster scale they run as parallel jobs over one cached scan per
    table."""
    outs = []
    for label, table, lhs, rhs in _FDS:
        t = load_table(spark, sf_dir, table)
        g = t.groupBy(lhs).agg(F.countDistinct(rhs).alias("nd"))
        viol = F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
        outs.append(
            g.agg(
                F.lit(label).alias("fd"),
                F.count("*").alias("n_groups"),
                viol.alias("violating_groups"),
                (viol / F.count("*")).alias("violation_rate"),
                F.max("nd").alias("max_rhs_distinct"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("fd")


# ---------------------------------------------------------------------------
# q265 — shift-share decomposition of YoY revenue change.
# ---------------------------------------------------------------------------
@query(
    "q265_shift_share",
    oracle=f"""
WITH yearly AS (
    SELECT c.c_nationkey AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS y,
           CAST(COUNT(*) AS BIGINT) AS vol,
           CAST(SUM(CAST(round(o.o_totalprice, 2) AS DECIMAL(18,2)))
                AS DECIMAL(18,2)) AS rev
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_nationkey, year(o.o_orderdate)
)
SELECT c.nation, c.y AS year,
       {sql_double(
           "CAST(round((c.vol - p.vol) * ({rp} / p.vol), 6) AS DECIMAL(18,6))".format(
               rp=sql_double("p.rev")
           )
       )} AS volume_effect,
       {sql_double(
           "CAST(round(({rc} / c.vol - {rp} / p.vol) * c.vol, 6) AS DECIMAL(18,6))".format(
               rc=sql_double("c.rev"), rp=sql_double("p.rev")
           )
       )} AS price_effect,
       {sql_double('c.rev - p.rev')} AS total_change
FROM yearly c JOIN yearly p ON p.nation = c.nation AND p.y = c.y - 1
ORDER BY c.nation, c.y
""",
)
def q265_shift_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shift-share decomposition of year-over-year revenue change per
    customer nation: volume effect (order-count change at last year's
    average ticket) + price effect (average-ticket change at this
    year's volume) = total change, the standard two-term Laspeyres
    split a growth report runs. Nation-years need a prior year to
    decompose against (inner join on y-1 — the q240 lesson applied:
    the contract is explicit, not a silent lag skip).

    rev is exact DECIMAL; average tickets are single divisions; each
    effect is one identically-ordered double expression quantized
    round(.,6). total_change is the exact decimal difference, so
    volume_effect + price_effect ≈ total_change with the residual
    bounded by the two quantizations — the audit's tolerance band.

    Scale: one (nation x year) aggregate riding the customer join, then
    a self-join on the bounded grid."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    yearly = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_nationkey").alias("nation"),
            F.year("o_orderdate").cast("int").alias("y"),
        )
        .agg(
            F.count("*").alias("vol"),
            F.sum(_dec2(F.col("o_totalprice"))).cast("decimal(18,2)").alias("rev"),
        )
    )
    c = yearly.select(
        "nation", "y", F.col("vol").alias("vc"), F.col("rev").alias("rc")
    )
    p = yearly.select(
        F.col("nation").alias("pn"),
        (F.col("y") + 1).alias("py"),
        F.col("vol").alias("vp"),
        F.col("rev").alias("rp"),
    )
    j = c.join(p, (F.col("pn") == F.col("nation")) & (F.col("py") == F.col("y")))
    ap_p = F.col("rp").cast("double") / F.col("vp")
    ap_c = F.col("rc").cast("double") / F.col("vc")
    return j.select(
        "nation",
        F.col("y").alias("year"),
        F.round((F.col("vc") - F.col("vp")) * ap_p, 6)
        .cast("decimal(18,6)")
        .cast("double")
        .alias("volume_effect"),
        F.round((ap_c - ap_p) * F.col("vc"), 6)
        .cast("decimal(18,6)")
        .cast("double")
        .alias("price_effect"),
        (F.col("rc") - F.col("rp")).cast("double").alias("total_change"),
    ).orderBy("nation", "year")


# ---------------------------------------------------------------------------
# q266 — rapid-repeat-order (double billing) audit.
# ---------------------------------------------------------------------------
_REPEAT_DAYS = 3


@query(
    "q266_double_billing_audit",
    oracle=f"""
WITH pairs AS (
    SELECT a.o_orderpriority AS pri, a.o_custkey,
           CASE WHEN a.o_orderpriority = b.o_orderpriority THEN 1 ELSE 0 END
             AS same_pri,
           CAST(round(
               CASE WHEN a.o_totalprice <= b.o_totalprice
                    THEN a.o_totalprice / b.o_totalprice
                    ELSE b.o_totalprice / a.o_totalprice END, 6)
             AS DECIMAL(18,6)) AS amt_ratio
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
     AND abs(datediff('day', a.o_orderdate, b.o_orderdate)) <= {_REPEAT_DAYS}
)
SELECT pri AS o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(SUM(same_pri) AS BIGINT) AS n_same_priority,
       {sql_double('SUM(amt_ratio)')} / COUNT(*) AS avg_amount_ratio
FROM pairs GROUP BY pri ORDER BY pri
""",
)
def q266_double_billing_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rapid repeat orders: pairs of orders from the same customer
    placed within {d} days of each other — the candidate set for a
    double-billing / duplicate-submission review. Per priority of the
    earlier order: pair count, affected customers, how many pairs share
    a priority, and the average small/large amount ratio (a ratio near
    1.0 flags true duplicates; near 0 flags a split order).

    Each amount ratio is ONE double division quantized round(.,6) ->
    DECIMAL so the average is an exact sum over a single division.

    Scale: a self-join partitioned by customer (per-customer order
    counts are small and the date band prunes inside the partition);
    never a time-axis range join."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.select(
        F.col("o_custkey").alias("ck"),
        F.col("o_orderkey").alias("ka"),
        F.col("o_orderdate").alias("da"),
        F.col("o_orderpriority").alias("pa"),
        F.col("o_totalprice").alias("ta"),
    )
    b = orders.select(
        F.col("o_custkey").alias("ckb"),
        F.col("o_orderkey").alias("kb"),
        F.col("o_orderdate").alias("db"),
        F.col("o_orderpriority").alias("pb"),
        F.col("o_totalprice").alias("tb"),
    )
    pairs = a.join(
        b,
        (F.col("ck") == F.col("ckb"))
        & (F.col("ka") < F.col("kb"))
        & (F.abs(F.datediff(F.col("da"), F.col("db"))) <= _REPEAT_DAYS),
    ).select(
        F.col("pa").alias("pri"),
        F.col("ck").alias("o_custkey"),
        F.when(F.col("pa") == F.col("pb"), 1).otherwise(0).alias("same_pri"),
        F.round(
            F.when(
                F.col("ta") <= F.col("tb"), F.col("ta") / F.col("tb")
            ).otherwise(F.col("tb") / F.col("ta")),
            6,
        )
        .cast("decimal(18,6)")
        .alias("amt_ratio"),
    )
    return (
        pairs.groupBy(F.col("pri").alias("o_orderpriority"))
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.sum("same_pri").alias("n_same_priority"),
            (F.sum("amt_ratio").cast("double") / F.count("*")).alias(
                "avg_amount_ratio"
            ),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q267 — customer value-band migration matrix.
# ---------------------------------------------------------------------------
_BANDS = 10


@query(
    "q267_value_band_migration",
    oracle=f"""
WITH yearly AS (
    SELECT o_custkey, CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(SUM(CAST(round(o_totalprice, 2) AS DECIMAL(18,2)))
                AS DECIMAL(18,2)) AS spend
    FROM orders GROUP BY o_custkey, year(o_orderdate)
),
banded AS (
    SELECT o_custkey, y,
           CAST(NTILE({_BANDS}) OVER (PARTITION BY y
                                      ORDER BY spend, o_custkey) AS INTEGER)
             AS band
    FROM yearly
),
moves AS (
    SELECT f.band AS band_from, t.band AS band_to
    FROM banded f JOIN banded t ON t.o_custkey = f.o_custkey AND t.y = f.y + 1
)
SELECT band_from, band_to, CAST(COUNT(*) AS BIGINT) AS n,
       COUNT(*) / SUM(COUNT(*)) OVER (PARTITION BY band_from)
         AS share_of_from
FROM moves GROUP BY band_from, band_to ORDER BY band_from, band_to
""",
)
def q267_value_band_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-band migration: yearly spend deciles (NTILE over a
    TOTAL order — spend then custkey, so banding is deterministic under
    ties) joined customer-to-self across consecutive years into a
    from-band x to-band transition matrix with per-row shares. The
    churn/upgrade diagnostic behind every retention deck; q229 snapshots
    RFM bands once, this tracks the flow between them.

    Customers need both years to appear (inner join on y+1, explicit
    contract). share_of_from is one division of exact counts.

    Scale: NTILE partitions by year (each year's sort is
    range-partitionable); the migration join is customer-keyed."""
    orders = load_table(spark, sf_dir, "orders")
    yearly = orders.groupBy(
        "o_custkey", F.year("o_orderdate").cast("int").alias("y")
    ).agg(F.sum(_dec2(F.col("o_totalprice"))).cast("decimal(18,2)").alias("spend"))
    banded = yearly.select(
        "o_custkey",
        "y",
        F.ntile(_BANDS)
        .over(W.partitionBy("y").orderBy("spend", "o_custkey"))
        .cast("int")
        .alias("band"),
    )
    f_side = banded.select(
        F.col("o_custkey").alias("ck"), F.col("y").alias("yf"),
        F.col("band").alias("band_from"),
    )
    t_side = banded.select(
        F.col("o_custkey").alias("ckt"), F.col("y").alias("yt"),
        F.col("band").alias("band_to"),
    )
    moves = f_side.join(
        t_side, (F.col("ckt") == F.col("ck")) & (F.col("yt") == F.col("yf") + 1)
    )
    counts = moves.groupBy("band_from", "band_to").agg(F.count("*").alias("n"))
    return counts.select(
        "band_from",
        "band_to",
        "n",
        (
            F.col("n") / F.sum("n").over(W.partitionBy("band_from"))
        ).alias("share_of_from"),
    ).orderBy("band_from", "band_to")


# ---------------------------------------------------------------------------
# q268 — key-space density audit.
# ---------------------------------------------------------------------------
_KEY_BUCKET = 1000


@query(
    "q268_key_density_audit",
    oracle=f"""
WITH buckets AS (
    SELECT o_orderkey // {_KEY_BUCKET} AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(MIN(o_orderkey) AS BIGINT) AS mn,
           CAST(MAX(o_orderkey) AS BIGINT) AS mx
    FROM orders GROUP BY o_orderkey // {_KEY_BUCKET}
),
scored AS (
    SELECT CASE WHEN cnt / (mx - mn + 1) > 0.75 THEN 'dense'
                WHEN cnt / (mx - mn + 1) > 0.5 THEN 'mixed'
                WHEN cnt / (mx - mn + 1) > 0.25 THEN 'sparse'
                ELSE 'fragmented' END AS density_band,
           cnt,
           CAST(round(cnt / (mx - mn + 1), 6) AS DECIMAL(18,6)) AS density
    FROM buckets
)
SELECT density_band,
       CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(cnt) AS BIGINT) AS total_rows,
       {sql_double('SUM(density)')} / COUNT(*) AS avg_density
FROM scored GROUP BY density_band ORDER BY density_band
""",
)
def q268_key_density_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-space density audit: orderkey buckets of {b} keys scored by
    occupancy (rows / observed key span) and banded dense/mixed/sparse/
    fragmented — the surrogate-key fragmentation signal that predicts
    whether key-range pruning and sequential scans will pay off. The
    fixture generator emits a contiguous key space (every bucket lands
    'dense'), which is itself the audit passing; post-deletion or
    multi-writer key spaces populate the other bands.

    density is one division of exact BIGINTs, quantized before the
    band average so the final mean is exact-sum / count.

    Scale: one hash aggregate on the bucket key; output is 4 rows."""
    orders = load_table(spark, sf_dir, "orders")
    buckets = orders.groupBy(
        F.expr(f"o_orderkey DIV {_KEY_BUCKET}").alias("bucket")
    ).agg(
        F.count("*").alias("cnt"),
        F.min("o_orderkey").alias("mn"),
        F.max("o_orderkey").alias("mx"),
    )
    density_raw = F.col("cnt") / (F.col("mx") - F.col("mn") + 1)
    scored = buckets.select(
        F.when(density_raw > 0.75, "dense")
        .when(density_raw > 0.5, "mixed")
        .when(density_raw > 0.25, "sparse")
        .otherwise("fragmented")
        .alias("density_band"),
        "cnt",
        F.round(density_raw, 6).cast("decimal(18,6)").alias("density"),
    )
    return (
        scored.groupBy("density_band")
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum("cnt").alias("total_rows"),
            (F.sum("density").cast("double") / F.count("*")).alias("avg_density"),
        )
        .orderBy("density_band")
    )


# ---------------------------------------------------------------------------
# q269 — month-over-month contribution by segment.
# ---------------------------------------------------------------------------
@query(
    "q269_mom_contribution",
    oracle=f"""
WITH monthly AS (
    SELECT c.c_mktsegment AS segment,
           CAST(year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1 AS INTEGER)
             AS m,
           CAST(SUM(CAST(round(o.o_totalprice, 2) AS DECIMAL(18,2)))
                AS DECIMAL(18,2)) AS rev
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment, year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1
),
valid AS (
    SELECT a.m FROM (SELECT DISTINCT m FROM monthly) a
    JOIN (SELECT DISTINCT m FROM monthly) b ON b.m = a.m - 1
),
paired AS (
    SELECT COALESCE(c.m, p.m + 1) AS m,
           COALESCE(c.segment, p.segment) AS segment,
           COALESCE(c.rev, CAST(0 AS DECIMAL(18,2)))
             - COALESCE(p.rev, CAST(0 AS DECIMAL(18,2))) AS seg_delta
    FROM monthly c FULL OUTER JOIN monthly p
      ON p.segment = c.segment AND c.m = p.m + 1
),
tot AS (
    SELECT m, SUM(seg_delta) AS total_delta
    FROM paired JOIN valid USING (m) GROUP BY m
)
SELECT CAST((p.m // 12) * 100 + (p.m % 12) + 1 AS INTEGER) AS month,
       p.segment,
       {sql_double('p.seg_delta')} AS seg_delta,
       CASE WHEN t.total_delta = 0 THEN NULL
            ELSE {sql_double('p.seg_delta')} / {sql_double('t.total_delta')}
       END AS contribution
FROM paired p JOIN valid v ON v.m = p.m JOIN tot t ON t.m = p.m
ORDER BY month, p.segment
""",
)
def q269_mom_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue-change contribution by market segment:
    which segment drove this month's move (the waterfall chart's data).
    Consecutive months pair by FULL OUTER join with COALESCE(rev, 0) —
    the q240 churn rule — and a month enters only when its predecessor
    has data. contribution = segment delta / total delta, NULL when the
    total is exactly zero (the w=0-style guard, identical both
    engines); deltas are exact decimals.

    Scale: one (segment x month) aggregate riding the customer join;
    everything after runs on the bounded grid."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    monthly = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
            .cast("int")
            .alias("m"),
        )
        .agg(F.sum(_dec2(F.col("o_totalprice"))).cast("decimal(18,2)").alias("rev"))
    )
    months = monthly.select("m").distinct()
    valid = months.alias("a").join(
        months.alias("b"), F.col("b.m") == F.col("a.m") - 1
    ).select(F.col("a.m").alias("m"))
    cur = monthly.select("m", "segment", F.col("rev").alias("rc"))
    prev = monthly.select(
        (F.col("m") + 1).alias("m"), "segment", F.col("rev").alias("rp")
    )
    zero = F.lit(0).cast("decimal(18,2)")
    paired = cur.join(prev, ["m", "segment"], "full_outer").select(
        "m",
        "segment",
        (F.coalesce("rc", zero) - F.coalesce("rp", zero)).alias("seg_delta"),
    ).join(F.broadcast(valid), "m")
    tot = paired.groupBy("m").agg(F.sum("seg_delta").alias("total_delta"))
    return (
        paired.join(tot, "m")
        .select(
            (
                F.floor(F.col("m") / 12) * 100 + F.pmod(F.col("m"), F.lit(12)) + 1
            )
            .cast("int")
            .alias("month"),
            "segment",
            F.col("seg_delta").cast("double").alias("seg_delta"),
            F.when(F.col("total_delta") == 0, F.lit(None).cast("double"))
            .otherwise(
                F.col("seg_delta").cast("double")
                / F.col("total_delta").cast("double")
            )
            .alias("contribution"),
        )
        .orderBy("month", "segment")
    )


# ---------------------------------------------------------------------------
# q270 — largest-remainder integer allocation.
# ---------------------------------------------------------------------------
_ALLOC_POINTS = 100


@query(
    "q270_largest_remainder_alloc",
    oracle=f"""
WITH lines AS (
    SELECT l_orderkey, l_linenumber,
           CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents
    FROM lineitem
),
tot AS (
    SELECT l_orderkey, CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lines GROUP BY l_orderkey
),
base AS (
    SELECT l.l_orderkey, l.l_linenumber,
           ({_ALLOC_POINTS} * l.cents) // t.total_cents AS base_pts,
           ({_ALLOC_POINTS} * l.cents) % t.total_cents AS rem
    FROM lines l JOIN tot t ON t.l_orderkey = l.l_orderkey
),
leftovers AS (
    SELECT l_orderkey,
           {_ALLOC_POINTS} - CAST(SUM(base_pts) AS BIGINT) AS leftover
    FROM base GROUP BY l_orderkey
),
alloc AS (
    SELECT b.l_orderkey,
           CAST(b.base_pts
                + CASE WHEN ROW_NUMBER() OVER (PARTITION BY b.l_orderkey
                                               ORDER BY b.rem DESC,
                                                        b.l_linenumber)
                            <= lo.leftover
                       THEN 1 ELSE 0 END AS BIGINT) AS pts
    FROM base b JOIN leftovers lo ON lo.l_orderkey = b.l_orderkey
),
per_order AS (
    SELECT a.l_orderkey, CAST(SUM(a.pts) AS BIGINT) AS order_pts,
           CAST(MAX(a.pts) AS BIGINT) AS max_pts
    FROM alloc a GROUP BY a.l_orderkey
)
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(p.order_pts) AS BIGINT) AS total_points,
       CAST(SUM(CASE WHEN p.order_pts = {_ALLOC_POINTS} THEN 1 ELSE 0 END)
            AS BIGINT) AS orders_balanced,
       CAST(MAX(p.max_pts) AS BIGINT) AS max_single_alloc
FROM per_order p JOIN orders o ON o.o_orderkey = p.l_orderkey
GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
""",
)
def q270_largest_remainder_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) allocation: 100 integer points per
    order split across its line items proportionally to price — floor
    the exact integer quotas, then hand the leftover points to the
    largest remainders (ties to the lowest line number). The exact
    integer-division discipline q272 deliberately skips: here
    orders_balanced MUST equal n_orders, and the query proves it per
    priority. The same operator allocates sampling budgets and shard
    quotas in a training pipeline.

    Everything is BIGINT: cents via round(price*100), quotas via
    integer DIV/%% (Spark's DIV ≡ DuckDB's // on positive ints — never
    FLOOR of a double quotient, which can misround at exact-division
    boundaries).

    Scale: quotas and remainders ride one orderkey-partitioned shuffle
    (window rank inside it); the audit join to orders is key-to-key.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lines = li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("cents"),
    )
    tot = lines.groupBy("l_orderkey").agg(
        F.sum("cents").alias("total_cents"), F.count("*").alias("n_lines")
    )
    base = lines.join(tot, "l_orderkey").select(
        "l_orderkey",
        "l_linenumber",
        F.expr(f"({_ALLOC_POINTS} * cents) DIV total_cents").alias("base_pts"),
        F.expr(f"({_ALLOC_POINTS} * cents) % total_cents").alias("rem"),
    )
    leftovers = base.groupBy("l_orderkey").agg(
        (F.lit(_ALLOC_POINTS) - F.sum("base_pts")).alias("leftover")
    )
    wr = W.partitionBy("l_orderkey").orderBy(F.col("rem").desc(), "l_linenumber")
    alloc = base.join(leftovers, "l_orderkey").select(
        "l_orderkey",
        (
            F.col("base_pts")
            + F.when(F.row_number().over(wr) <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("pts"),
    )
    per_order = alloc.groupBy("l_orderkey").agg(
        F.sum("pts").alias("order_pts"), F.max("pts").alias("max_pts")
    )
    return (
        per_order.join(orders, per_order.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("order_pts").alias("total_points"),
            F.sum(
                F.when(F.col("order_pts") == _ALLOC_POINTS, 1).otherwise(0)
            ).alias("orders_balanced"),
            F.max("max_pts").alias("max_single_alloc"),
        )
        .orderBy("o_orderpriority")
    )
