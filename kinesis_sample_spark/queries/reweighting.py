"""Importance-based data selection (DSIR-style) over hashed token features.

Data Selection via Importance Resampling (Xie et al., 2023) scores every
raw-pool document by how target-like its hashed n-gram feature
distribution is, then resamples by that weight. The published method uses
*hashed* features precisely for scale: the weight model is a fixed-width
count table, not an unbounded vocabulary. q123 implements the same
pipeline shape with a fixture-sized bucket count (1024):

1. token → bucket via the engine-portable md5 hash (functions/hashing.py);
2. per-bucket occurrence counts for the target slice (``source='src0'``,
   standing in for the trusted corpus) and the raw pool (everything else);
3. per-pool-doc sums of (1 + bucket count) under each distribution, with
   the +1 Laplace smoothing keeping empty buckets harmless;
4. an integer likelihood-ratio proxy ``(t_sum·1e6) div p_sum`` as the
   selection score.

Production DSIR uses log-probability ratios; logs are transcendental and
JVM-vs-libm can differ by 1 ulp (the parity trap in functions/numeric.py),
so the gate-checked score is the cross-multiplied integer form — the
*plan* (broadcast weight table, map-side scoring, one doc_id shuffle) is
identical either way, which is what matters at 100 TB.

Scale (100 TB): both count tables are ≤1024 rows regardless of corpus
size → broadcast; the corpus side is explode → hash → broadcast-lookup →
groupBy(doc_id), i.e. exactly one corpus-scale shuffle keyed on doc_id.
Growing the feature space (DSIR uses 10k buckets) changes only the
broadcast size.

Reference parity note: the reference (AmazonKinesisApplicationSample*.java)
has no selection surface; SURVEY §2 training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.functions.hashing import md5_long, md5_long_sql
from kinesis_sample_spark.queries import query

_BUCKETS = 1024
_TARGET = "src0"
_TOP = 100
_RATIO_SCALE = 10**6

_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok FROM documents
),
b AS (
  SELECT doc_id, source, {md5_long_sql("tok")} % {_BUCKETS} AS bucket FROM tok
),
t_c AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS t_cnt FROM b
  WHERE source = '{_TARGET}' GROUP BY bucket
),
p_c AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS p_cnt FROM b
  WHERE source <> '{_TARGET}' GROUP BY bucket
),
agg AS (
  SELECT doc_id,
         CAST(sum(1 + coalesce(t_cnt, 0)) AS BIGINT) AS t_sum,
         CAST(sum(1 + coalesce(p_cnt, 0)) AS BIGINT) AS p_sum
  FROM (SELECT doc_id, bucket FROM b WHERE source <> '{_TARGET}') pool
  LEFT JOIN t_c USING (bucket)
  LEFT JOIN p_c USING (bucket)
  GROUP BY doc_id
)
SELECT doc_id, t_sum, p_sum,
       CAST((t_sum * {_RATIO_SCALE}) // p_sum AS BIGINT) AS score_q
FROM agg
ORDER BY score_q DESC, doc_id
LIMIT {_TOP}
"""


@query("q123_importance_weights", oracle=_ORACLE)
def q123_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 raw-pool documents by target-likeness score. The weight
    tables never exceed 1024 rows — Spark broadcasts them into the
    exploded token stream, so scoring is map-side and the only
    corpus-scale shuffle is the final per-doc sum."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(F.split("text", " ")).alias("tok"),
    ).withColumn("bucket", md5_long("tok") % _BUCKETS)

    t_c = (
        toks.filter(F.col("source") == _TARGET)
        .groupBy("bucket")
        .agg(F.count("*").alias("t_cnt"))
    )
    p_c = (
        toks.filter(F.col("source") != _TARGET)
        .groupBy("bucket")
        .agg(F.count("*").alias("p_cnt"))
    )
    pool = toks.filter(F.col("source") != _TARGET).select("doc_id", "bucket")
    scored = pool.join(F.broadcast(t_c), "bucket", "left").join(
        F.broadcast(p_c), "bucket", "left"
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum(F.lit(1) + F.coalesce("t_cnt", F.lit(0))).alias("t_sum"),
        F.sum(F.lit(1) + F.coalesce("p_cnt", F.lit(0))).alias("p_sum"),
    )
    return (
        agg.withColumn("score_q", F.expr(f"(t_sum * {_RATIO_SCALE}) div p_sum"))
        .orderBy(F.desc("score_q"), "doc_id")
        .limit(_TOP)
    )


# ---------------------------------------------------------------------------
# q307 — deterministic weighted sampling (Efraimidis–Spirakis).
# ---------------------------------------------------------------------------
_WS_M = 1_000_000
_WS_K = 20


@query(
    "q307_weighted_sample_es",
    oracle=f"""
WITH keyed AS (
    SELECT source, doc_id, n_chars,
           CAST(CAST(round(ln(CAST(({md5_long_sql("'ws:' || CAST(doc_id AS VARCHAR)")} % {_WS_M}) + 1 AS DOUBLE)
                              / CAST({_WS_M} + 1 AS DOUBLE)), 6)
                     AS DECIMAL(18,6)) AS VARCHAR)::DOUBLE
             / CAST(n_chars AS DOUBLE) AS sample_key
    FROM documents
)
SELECT source, doc_id, n_chars, sample_key, rank
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                 ORDER BY sample_key DESC, doc_id) AS rank
    FROM keyed
) t
WHERE rank <= {_WS_K}
ORDER BY source, rank
""",
)
def q307_weighted_sample_es(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, the Efraimidis–Spirakis
    way: every document draws a deterministic uniform u from the md5
    recipe and competes on key = ln(u)/w (equivalent to the classic
    u^(1/w) — monotone transform), and the top-k keys per source ARE a
    weighted sample without replacement: inclusion probability is
    proportional to weight (n_chars here — longer documents are
    likelier picks, the usual token-budget-aware selection).

    Why this and not ``df.sample``: the key is a pure per-row function
    of (doc_id, weight), so the drawn sample is identical across
    engines, partitionings, retries and shards — q54's reproducibility
    argument extended from uniform to WEIGHTED draws, and the ES
    construction is what makes per-shard top-k mergeable: top-k of a
    union is the top-k of per-shard top-ks (the distributed-selection
    property; take the per-partition top-k, merge, re-take).

    ln is the one transcendental: quantized round(·,6) → DECIMAL →
    correctly-rounded double (the SCALING.md rule), then one division by
    the exact weight — bit-identical keys in both engines.

    Scale: map-side key computation, one (source, key) top-k — no
    shuffle wider than k rows per source after the window's partial
    rank pushdown; no seed coordination across 1000 executors."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        (md5_long(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))) % _WS_M)
        + 1
    ).cast("double") / F.lit(_WS_M + 1).cast("double")
    key = (
        F.round(F.log(u), 6).cast("decimal(18,6)").cast("double")
        / F.col("n_chars").cast("double")
    )
    keyed = docs.select("source", "doc_id", "n_chars", key.alias("sample_key"))
    w = W.partitionBy("source").orderBy(F.desc("sample_key"), "doc_id")
    return (
        keyed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _WS_K)
        .orderBy("source", "rank")
    )


# ---------------------------------------------------------------------------
# q320 — Neyman-allocation stratified sampling (round 14).
# ---------------------------------------------------------------------------
_NEY_B = 500  # total sample budget


def _ney_oracle() -> str:
    h = md5_long_sql("'ney:' || CAST(c_custkey AS VARCHAR)")
    d6 = "CAST(CAST(CAST(round({x}, 6) AS DECIMAL(18,6)) AS VARCHAR) AS DOUBLE)"
    return f"""
WITH m AS (
    SELECT c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_pop,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR)
                AS DOUBLE) AS sx,
           CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(19,2))
                         * CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR)
                AS DOUBLE) AS sxx
    FROM customer GROUP BY c_mktsegment
),
sd AS (
    SELECT segment, n_pop, sx,
           sqrt((n_pop * sxx - sx * sx)
                / (n_pop * CAST(n_pop - 1 AS DOUBLE))) AS s_h
    FROM m
),
w AS (
    SELECT segment, n_pop, sx, s_h, n_pop * s_h AS w_h,
           SUM(n_pop * s_h) OVER () AS w_tot
    FROM sd
),
alloc0 AS (
    SELECT segment, n_pop, sx, s_h,
           CAST(floor({_NEY_B} * w_h / w_tot) AS BIGINT) AS base,
           {_NEY_B} * w_h / w_tot
             - floor({_NEY_B} * w_h / w_tot) AS rem
    FROM w
),
alloc AS (
    SELECT segment, n_pop, sx, s_h,
           base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, segment)
                            <= {_NEY_B} - SUM(base) OVER ()
                       THEN 1 ELSE 0 END AS n_alloc
    FROM alloc0
),
ranked AS (
    SELECT c_mktsegment AS segment,
           CAST(c_acctbal AS DECIMAL(12,2)) AS bal,
           ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                              ORDER BY {h}, c_custkey) AS rk
    FROM customer
),
samp AS (
    SELECT r.segment,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(CAST(SUM(r.bal) AS VARCHAR) AS DOUBLE) AS ssx
    FROM ranked r JOIN alloc a ON a.segment = r.segment
    WHERE r.rk <= a.n_alloc
    GROUP BY r.segment
)
SELECT a.segment, a.n_pop,
       {d6.format(x='a.s_h')} AS sd_pop,
       a.n_alloc, s.n_sampled,
       a.n_alloc > a.n_pop AS exhausted,
       (SELECT SUM(n_alloc) FROM alloc) = {_NEY_B} AS budget_exact,
       {d6.format(x='s.ssx / s.n_sampled')} AS sample_mean,
       {d6.format(x='a.sx / a.n_pop')} AS pop_mean
FROM alloc a JOIN samp s ON s.segment = a.segment
ORDER BY a.segment
"""


@query("q320_neyman_allocation", oracle=_ney_oracle())
def q320_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-allocation stratified sampling: the two-phase design
    every survey/eval pipeline uses when strata differ in spread —
    phase 1 measures each stratum's size and standard deviation, phase
    2 allocates the B={b} sample budget proportional to N_h * S_h
    (minimum-variance allocation for a fixed budget) and draws a
    deterministic md5-ranked sample per stratum. The registry's
    sampling shelf draws at FIXED rates (q93 bernoulli, q297 union
    stability, q307 weighted-ES); this is the first whose rates are
    fitted from the data's own variance structure.

    The integer allocation uses the largest-remainder method (floor the
    real allocation, hand the remaining budget to the largest
    fractional parts, ties by segment) so sum(n_alloc) == B EXACTLY —
    gated by the budget_exact boolean. This is the ONE-SHOT allocation:
    a stratum smaller than its allocation simply exhausts
    (n_sampled = min(n_pop, n_alloc), surfaced by the exhausted flag)
    rather than re-distributing iteratively — the honest readout at
    tiny scale factors, a no-op at production N_h. Moments are exact decimals (one factor widened to
    DECIMAL(19,2) before multiplying); S_h and the means are identical
    double expressions quantized round(.,6).

    Scale: phase 1 is one partial-aggregated moment pass; phase 2's
    rank-within-stratum is a per-stratum shuffle of (hash, key) pairs
    ONLY (the md5 rank, not a global sort); the draw is a broadcast
    join against the 5-row allocation table. At 100 TB with a big
    stratum count both passes stay key-partitioned; nothing global
    exists but the 5-row window over strata."""
    cust = load_table(spark, sf_dir, "customer")
    bal2 = F.col("c_acctbal").cast("decimal(12,2)")
    bal19 = F.col("c_acctbal").cast("decimal(19,2)")
    m = cust.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_pop"),
        F.sum(bal2).cast("double").alias("sx"),
        F.sum(bal19 * bal2).cast("double").alias("sxx"),
    )
    s_h = F.sqrt(
        (F.col("n_pop") * F.col("sxx") - F.col("sx") * F.col("sx"))
        / (F.col("n_pop") * (F.col("n_pop") - 1).cast("double"))
    )
    w = m.select("segment", "n_pop", "sx", s_h.alias("s_h")).withColumn(
        "w_tot", F.sum(F.col("n_pop") * F.col("s_h")).over(W.partitionBy())
    )
    real = F.lit(_NEY_B) * F.col("n_pop") * F.col("s_h") / F.col("w_tot")
    alloc0 = w.select(
        "segment",
        "n_pop",
        "sx",
        "s_h",
        F.floor(real).cast("bigint").alias("base"),
        (real - F.floor(real)).alias("rem"),
    )
    alloc = alloc0.select(
        "segment",
        "n_pop",
        "sx",
        "s_h",
        (
            F.col("base")
            + F.when(
                F.row_number().over(W.orderBy(F.col("rem").desc(), "segment"))
                <= F.lit(_NEY_B) - F.sum("base").over(W.partitionBy()),
                1,
            ).otherwise(0)
        ).alias("n_alloc"),
    )
    rk = F.row_number().over(
        W.partitionBy("c_mktsegment").orderBy(
            md5_long(F.concat(F.lit("ney:"), F.col("c_custkey").cast("string"))),
            "c_custkey",
        )
    )
    ranked = cust.select(
        F.col("c_mktsegment").alias("segment"), bal2.alias("bal"), rk.alias("rk")
    )
    samp = (
        ranked.join(F.broadcast(alloc.select("segment", "n_alloc")), "segment")
        .filter(F.col("rk") <= F.col("n_alloc"))
        .groupBy("segment")
        .agg(
            F.count("*").alias("n_sampled"),
            F.sum("bal").cast("double").alias("ssx"),
        )
    )
    btot = alloc.groupBy().agg(F.sum("n_alloc").alias("btot"))
    q6 = lambda c: F.round(c, 6).cast("decimal(18,6)").cast("double")  # noqa: E731
    return (
        alloc.join(samp, "segment")
        .crossJoin(F.broadcast(btot))
        .select(
            "segment",
            "n_pop",
            q6(F.col("s_h")).alias("sd_pop"),
            "n_alloc",
            "n_sampled",
            (F.col("n_alloc") > F.col("n_pop")).alias("exhausted"),
            (F.col("btot") == _NEY_B).alias("budget_exact"),
            q6(F.col("ssx") / F.col("n_sampled")).alias("sample_mean"),
            q6(F.col("sx") / F.col("n_pop")).alias("pop_mean"),
        )
        .orderBy("segment")
    )
