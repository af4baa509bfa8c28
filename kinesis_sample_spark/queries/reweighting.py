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
