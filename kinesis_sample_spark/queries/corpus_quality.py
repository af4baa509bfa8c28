"""Corpus-quality operators — the filter battery a training-data pipeline
runs before tokenization (C4/Gopher/RefinedWeb-style): chunk-level exact
dedup (boilerplate removal), intra-document repetition signals, and
pattern scanning (PII-shaped regex counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.functions.hashing import md5_long, md5_long_sql
from kinesis_sample_spark.queries import query

CHUNK = 20
STRIDE = 20  # disjoint paragraphs for dedup (no overlap, unlike q63's RAG chunks)


# ---------------------------------------------------------------------------
# q66 — chunk-level exact dedup (boilerplate-paragraph removal).
# ---------------------------------------------------------------------------
@query(
    "q66_chunk_dedup",
    oracle=f"""
WITH chunks AS (
    SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
           array_to_string(list_slice(string_split(text, ' '),
                                      i * {STRIDE} + 1, i * {STRIDE} + {CHUNK}), ' ') AS chunk_text
    FROM documents, (SELECT unnest(range(0, 100)) AS i) idx
    WHERE i * {STRIDE} < len(string_split(text, ' '))
),
hashed AS (
    SELECT doc_id, chunk_idx, {md5_long_sql('chunk_text')} AS h FROM chunks
),
ranked AS (
    SELECT doc_id, chunk_idx, h,
           ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, chunk_idx) AS occurrence,
           COUNT(*) OVER (PARTITION BY h) AS n_copies
    FROM hashed
)
SELECT doc_id, chunk_idx, h AS chunk_hash, (occurrence = 1) AS keep, n_copies
FROM ranked
WHERE n_copies > 1
ORDER BY chunk_hash, doc_id, chunk_idx
""",
)
def q66_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-granularity exact dedup: split every document into
    disjoint {CHUNK}-token chunks, hash, keep the first occurrence of each
    repeated chunk (deterministic by (doc_id, chunk_idx)) and flag the
    rest — the C4-style boilerplate filter. Output lists only duplicated
    chunks (the interesting rows). Scale: one shuffle on the 60-bit chunk
    hash; chunk text itself never shuffles."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    chunks = docs.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, cast(ceil(size(split(text,' ')) / {STRIDE}.0) as int) - 1),"
                f" i -> concat_ws(' ', slice(split(text, ' '), i * {STRIDE} + 1, {CHUNK})))"
            )
        ).alias("chunk_idx", "chunk_text"),
    ).filter(F.length("chunk_text") > 0)
    hashed = chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        md5_long(F.col("chunk_text")).alias("chunk_hash"),
    )
    w = W.partitionBy("chunk_hash")
    ranked = hashed.select(
        "doc_id",
        "chunk_idx",
        "chunk_hash",
        (F.row_number().over(w.orderBy("doc_id", "chunk_idx")) == 1).alias("keep"),
        F.count("*").over(w).alias("n_copies"),
    )
    return ranked.filter(F.col("n_copies") > 1).orderBy("chunk_hash", "doc_id", "chunk_idx")


# ---------------------------------------------------------------------------
# q67 — intra-document repetition signals (Gopher-style).
# ---------------------------------------------------------------------------
@query(
    "q67_repetition_scores",
    oracle="""
WITH m AS (
    SELECT doc_id,
           string_split(text, ' ') AS toks,
           list_transform(range(1, len(string_split(text, ' ')) - 1),
                          i -> string_split(text, ' ')[i] || ' ' ||
                               string_split(text, ' ')[i+1] || ' ' ||
                               string_split(text, ' ')[i+2]) AS sh
    FROM documents
)
SELECT doc_id,
       1.0 - len(list_distinct(sh)) / len(sh) AS dup_3gram_ratio,
       1.0 - len(list_distinct(toks)) / len(toks) AS dup_token_ratio,
       len(list_filter(toks, t -> t = toks[1])) / len(toks) AS first_token_share
FROM m
WHERE len(sh) > 0
ORDER BY doc_id
""",
)
def q67_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition metrics per document (duplicate-n-gram ratio, duplicate
    token ratio, top-token concentration) — the Gopher repetition filters.
    All array HOFs; integer ratios → identical doubles."""
    from kinesis_sample_spark.functions.shingles import shingle_array

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    toks = F.split("text", " ")
    m = docs.select(
        "doc_id", toks.alias("toks"), shingle_array(toks).alias("sh")
    ).filter(F.size("sh") > 0)
    first_tok = F.element_at("toks", 1)
    return (
        m.select(
            "doc_id",
            (1.0 - F.size(F.array_distinct("sh")) / F.size("sh")).alias("dup_3gram_ratio"),
            (1.0 - F.size(F.array_distinct("toks")) / F.size("toks")).alias(
                "dup_token_ratio"
            ),
            (
                F.size(F.filter("toks", lambda t: t == first_tok)) / F.size("toks")
            ).alias("first_token_share"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q68 — pattern scan (PII-shaped regex counts) over text + payloads.
# ---------------------------------------------------------------------------
@query(
    "q68_pattern_scan",
    oracle=r"""
SELECT event_id,
       len(regexp_extract_all(props, '[0-9]+')) AS n_digit_runs,
       len(regexp_extract_all(props, '[0-9]{3,}')) AS n_long_digit_runs,
       len(regexp_extract_all(props, '[a-z]+@[a-z]+\.[a-z]+')) AS n_email_like,
       regexp_matches(props, '"k":\s*[0-9]+') AS has_k_field
FROM events
ORDER BY event_id
""",
)
def q68_pattern_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex pattern battery over the opaque payload — the shape of a PII
    scrubbing pass (emails/phones/ids). On the fixtures only digit runs
    fire, but the operator (multi-pattern extract-all counts + boolean
    flags, single scan) is the production one."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            F.size(F.regexp_extract_all("props", F.lit(r"[0-9]+"), 0)).alias("n_digit_runs"),
            F.size(F.regexp_extract_all("props", F.lit(r"[0-9]{3,}"), 0)).alias(
                "n_long_digit_runs"
            ),
            F.size(
                F.regexp_extract_all("props", F.lit(r"[a-z]+@[a-z]+\.[a-z]+"), 0)
            ).alias("n_email_like"),
            F.col("props").rlike(r'"k":\s*[0-9]+').alias("has_k_field"),
        )
        .orderBy("event_id")
    )
