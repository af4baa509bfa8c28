"""Benchmark decontamination and rarity-based quality scoring.

Two corpus-hygiene operators every LLM training pipeline runs before a
data release:

- **Decontamination** (GPT-3 appendix-C style): flag training documents
  that share any word n-gram with a held-out benchmark/eval set, so eval
  answers don't leak into training. Here the ``source='src0'`` slice of
  ``documents`` stands in for the benchmark; 5-grams are long enough that
  chance overlap in the fixture vanishes (3-grams flag 84% of docs by
  chance, 5-grams flag exactly the planted near-duplicates).
- **Rare-token ratio**: the share of a document's tokens whose corpus
  document-frequency is below a relative threshold — a cheap quality /
  outlier signal (OCR noise, boilerplate and gibberish skew rare-heavy).
  Uses an exact count ratio, not log-idf, so the oracle comparison never
  touches transcendentals (JVM/libm can differ by 1 ulp there).

Scale notes (100 TB): the benchmark n-gram set is tiny relative to the
corpus (evals are ~1e5-1e7 grams) → broadcast semi/inner join against an
exploded corpus, no corpus-side shuffle before the per-doc count. The df
table is |vocab| rows — shuffled once on token, then broadcast back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.functions.shingles import shingle_array
from kinesis_sample_spark.queries import query

_NGRAM = 5
_BENCH_SOURCE = "src0"

# DuckDB rendering of the in-order word 5-gram list of string_split(text,' ')
_SQL_GRAMS = (
    "list_transform(range(1, len(t) - "
    + str(_NGRAM - 2)
    + "), i -> "
    + " || ' ' || ".join(f"t[i+{j}]" for j in range(_NGRAM))
    + ")"
)


# ---------------------------------------------------------------------------
# q97 — benchmark decontamination via n-gram overlap.
# ---------------------------------------------------------------------------
@query(
    "q97_benchmark_decontamination",
    oracle=f"""
WITH g AS (
  SELECT doc_id, source, {_SQL_GRAMS} AS grams
  FROM (SELECT doc_id, source, string_split(text, ' ') AS t FROM documents)
),
bench AS (
  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE source = '{_BENCH_SOURCE}'
),
corpus AS (
  SELECT DISTINCT doc_id, unnest(grams) AS gram FROM g WHERE source <> '{_BENCH_SOURCE}'
)
SELECT doc_id, count(*) AS n_shared_grams
FROM corpus JOIN bench USING (gram)
GROUP BY doc_id
ORDER BY doc_id
""",
)
def q97_benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag corpus documents sharing any word 5-gram with the benchmark
    slice, with the count of distinct shared grams as evidence. The
    benchmark gram set is distinct-ed then broadcast, so the corpus side
    is explode→join→per-doc count with its only shuffle being the final
    tiny aggregation on doc_id. At sf0.01 this finds exactly the planted
    near-duplicate pair — 3-grams would flag 400/475 docs by chance."""
    docs = load_table(spark, sf_dir, "documents")
    grams = shingle_array(F.split("text", " "), _NGRAM)
    bench = (
        docs.filter(F.col("source") == _BENCH_SOURCE)
        .select(F.explode(grams).alias("gram"))
        .distinct()
    )
    corpus = (
        docs.filter(F.col("source") != _BENCH_SOURCE)
        .select("doc_id", F.explode(F.array_distinct(grams)).alias("gram"))
    )
    return (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q98 — rare-token ratio (df-based quality signal).
# ---------------------------------------------------------------------------
@query(
    "q98_rare_token_ratio",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
n AS (SELECT count(*) AS n_docs FROM documents),
df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token)
SELECT doc_id,
       count(*) AS n_tokens,
       CAST(count(*) FILTER (WHERE df * 4 < n_docs) AS DOUBLE) / count(*)
         AS rare_ratio
FROM toks JOIN df USING (token), n
GROUP BY doc_id
ORDER BY doc_id
""",
)
def q98_rare_token_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document share of token occurrences whose corpus document
    frequency is below 25% of the corpus size (`df*4 < n_docs` keeps the
    threshold in exact integer arithmetic — no float cutoff to disagree
    on). The df table is |vocab| rows: one token-keyed shuffle to build,
    then broadcast back onto the exploded corpus, so the big side shuffles
    only for the final per-doc count. The corpus size joins in as a
    broadcast 1-row aggregate (keeps the plan fully lazy — no eager
    driver-side count). Ratio is a single double division of two exact
    counts — bit-identical across engines."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    df = toks.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    return (
        toks.join(F.broadcast(df), "token")
        .join(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            (
                F.count(F.when(F.col("df") * 4 < F.col("n_docs"), 1)).cast("double")
                / F.count(F.lit(1))
            ).alias("rare_ratio"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q130 — cross-source contamination matrix.
# ---------------------------------------------------------------------------
_MAX_SRC_DF = 10  # stop-gram cap: grams in more sources than this are noise


@query(
    "q130_source_overlap_matrix",
    oracle=f"""
WITH g AS (
  SELECT DISTINCT source, unnest(grams) AS gram
  FROM (
    SELECT source, {_SQL_GRAMS} AS grams
    FROM (SELECT source, string_split(text, ' ') AS t FROM documents)
  )
),
srcdf AS (SELECT gram, count(*) AS n_src FROM g GROUP BY gram),
k AS (SELECT g.source, g.gram FROM g JOIN srcdf USING (gram) WHERE srcdf.n_src <= {_MAX_SRC_DF}),
sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n_grams FROM k GROUP BY source),
p AS (
  SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS n_shared
  FROM k a JOIN k b ON a.gram = b.gram AND a.source < b.source
  GROUP BY 1, 2
)
SELECT p.src_a, p.src_b, p.n_shared, sa.n_grams AS n_a, sb.n_grams AS n_b
FROM p
JOIN sizes sa ON sa.source = p.src_a
JOIN sizes sb ON sb.source = p.src_b
ORDER BY src_a, src_b
""",
)
def q130_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sources duplicate each other: distinct word-5-gram overlap
    counts per source pair, the corpus-composition audit run before
    mixing sources (a crawl that mirrors another source inflates its
    effective weight). Stop-gram hygiene: grams present in more than
    {10} sources are boilerplate and excluded *before* the self-join —
    that cap is what bounds the join fanout at scale (per surviving gram,
    at most {10}·{9}/2 source pairs, independent of corpus size). The
    per-gram relation shuffles once on gram; pair counts and the sizes
    join are |sources|²-bounded, i.e. tiny."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism  # single-file scan: spread the
    )  # shingle+explode CPU across cores before the distinct (r08 lesson)
    grams = shingle_array(F.split("text", " "), _NGRAM)
    g = (
        docs.select("source", F.explode(grams).alias("gram"))
        .distinct()
        .persist()  # read 2×: stop-gram df + the kept relation below
    )
    srcdf = g.groupBy("gram").agg(F.count("*").alias("n_src"))
    k = (
        g.join(srcdf.filter(F.col("n_src") <= _MAX_SRC_DF), "gram")
        .select("source", "gram")
        .persist()  # read 3×: both self-join sides + per-source sizes
    )
    sizes = k.groupBy("source").agg(F.count("*").alias("n_grams"))
    a = k.select(F.col("source").alias("src_a"), "gram")
    b = k.select(F.col("source").alias("src_b"), "gram")
    p = (
        a.join(b, "gram")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        p.join(F.broadcast(sizes.withColumnRenamed("source", "src_a").withColumnRenamed("n_grams", "n_a")), "src_a")
        .join(F.broadcast(sizes.withColumnRenamed("source", "src_b").withColumnRenamed("n_grams", "n_b")), "src_b")
        .select("src_a", "src_b", "n_shared", "n_a", "n_b")
        .orderBy("src_a", "src_b")
    )
