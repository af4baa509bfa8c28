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


# ---------------------------------------------------------------------------
# q188 — corpus-derived unigram log-probability quality score.
# ---------------------------------------------------------------------------
_ULP_KEEP = -3.402  # fixture median avg-logprob; below = token-soup outlier


@query(
    "q188_unigram_logprob_quality",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
tot AS (SELECT count(*) AS n FROM tok),
freq AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
lp AS (
  SELECT t.doc_id,
         CAST(round(ln(f.c / (SELECT n FROM tot)), 6) AS DECIMAL(18,6)) AS l
  FROM tok t JOIN freq f ON f.tok = t.tok
),
doc AS (
  SELECT doc_id, CAST(SUM(l) AS DOUBLE) AS sum_lp,
         CAST(COUNT(*) AS BIGINT) AS n_tokens
  FROM lp GROUP BY doc_id
)
SELECT doc_id, n_tokens, sum_lp,
       sum_lp / n_tokens AS avg_logprob,
       CAST(sum_lp / n_tokens >= {_ULP_KEEP} AS INT) AS keep
FROM doc ORDER BY doc_id
""",
)
def q188_unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style language-model quality scoring with the LM derived
    from the corpus itself: each document's average unigram
    log-probability under the corpus token distribution (the perplexity
    proxy CCNet/fineweb pipelines threshold on — here self-contained, no
    external model). Engine-portability: ln's argument is a ratio of two
    exact integers (token count / corpus total), so both engines feed
    libm identical doubles; each token's logprob is then round(·, 6) →
    DECIMAL(18,6), making the per-document SUM exact integer arithmetic
    (order-independent under any partitioning) — the r04 quantization
    convention. The final average divides that exactly-representable
    decimal-as-double by an integer count, so ``keep`` is a deterministic
    bit-equal comparison even though the threshold sits in the
    distribution's dense center.

    Scale: one word-count shuffle for the frequency table (vocabulary-
    sized — at 100 TB still only as big as the vocabulary), broadcast
    back to the token stream, one per-doc aggregation. No all-pairs, no
    Python."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tot = tok.agg(F.count(F.lit(1)).alias("n"))
    freq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    lp = (
        tok.join(F.broadcast(freq), "tok")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(F.log(F.col("c") / F.col("n")), 6)
            .cast("decimal(18,6)")
            .alias("l"),
        )
    )
    doc = lp.groupBy("doc_id").agg(
        F.sum("l").cast("double").alias("sum_lp"),
        F.count(F.lit(1)).alias("n_tokens"),
    )
    avg = F.col("sum_lp") / F.col("n_tokens")
    return doc.select(
        "doc_id",
        "n_tokens",
        "sum_lp",
        avg.alias("avg_logprob"),
        (avg >= _ULP_KEEP).cast("int").alias("keep"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q190 — per-source percentile-normalized quality blend.
# ---------------------------------------------------------------------------
_BLEND_KEEP = 0.4  # keep docs above the 40th blended percentile of their source


@query(
    "q190_quality_percentile_blend",
    oracle=f"""
WITH m AS (
  SELECT doc_id, source,
         len(string_split(text, ' ')) AS n_words,
         len(list_distinct(string_split(text, ' '))) AS n_distinct,
         length(text) AS n_chars_t
  FROM documents
),
s AS (
  SELECT doc_id, source,
         (n_chars_t - n_words + 1) / n_words AS mean_wlen,
         n_distinct / n_words AS ttr
  FROM m
),
p AS (
  SELECT doc_id, source, mean_wlen, ttr,
         percent_rank() OVER (PARTITION BY source ORDER BY mean_wlen, doc_id) AS pr_wlen,
         percent_rank() OVER (PARTITION BY source ORDER BY ttr, doc_id) AS pr_ttr
  FROM s
)
SELECT doc_id, source, mean_wlen, ttr, pr_wlen, pr_ttr,
       0.5 * pr_wlen + 0.5 * pr_ttr AS blend,
       CAST(0.5 * pr_wlen + 0.5 * pr_ttr >= {_BLEND_KEEP} AS INT) AS keep
FROM p ORDER BY doc_id
""",
)
def q190_quality_percentile_blend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score ensembling the way multi-signal pipelines actually
    combine filters: raw signals live on incomparable scales (mean word
    length in chars, type-token ratio in [0,1]), so each is normalized to
    its percentile WITHIN its source before blending — per-source
    normalization stops one crawl's length distribution from dominating
    another's, the standard calibration step before a blended keep
    threshold. Signals and ranks are exact: both signals are ratios of
    integers (bit-equal across engines), percent_rank is
    (rank-1)/(n_partition-1) over a (signal, doc_id) total order (ties
    impossible ⇒ identical ranks), and the blend is one fused multiply-
    add shape evaluated identically on both engines.

    Scale: two window functions over the same source partitioning — one
    shuffle keyed on source; at 100 TB per-source partitions are the
    natural unit (sources are crawls/dumps), with AQE splitting any
    mega-source."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    s = docs.select(
        "doc_id",
        "source",
        ((F.length("text") - F.size(toks) + F.lit(1)) / F.size(toks)).alias(
            "mean_wlen"
        ),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("ttr"),
    )
    w_wlen = W.partitionBy("source").orderBy("mean_wlen", "doc_id")
    w_ttr = W.partitionBy("source").orderBy("ttr", "doc_id")
    p = s.select(
        "doc_id",
        "source",
        "mean_wlen",
        "ttr",
        F.percent_rank().over(w_wlen).alias("pr_wlen"),
        F.percent_rank().over(w_ttr).alias("pr_ttr"),
    )
    blend = F.lit(0.5) * F.col("pr_wlen") + F.lit(0.5) * F.col("pr_ttr")
    return p.select(
        "doc_id",
        "source",
        "mean_wlen",
        "ttr",
        "pr_wlen",
        "pr_ttr",
        blend.alias("blend"),
        (blend >= _BLEND_KEEP).cast("int").alias("keep"),
    ).orderBy("doc_id")
