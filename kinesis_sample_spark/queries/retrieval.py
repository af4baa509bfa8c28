"""Full-text retrieval operators over ``documents`` — the search side of a
training-data pipeline (quality-scored corpus search, benchmark-query
retrieval, RAG-ish candidate generation).

Everything is built from explode → filter-early → partial/final aggregation;
the per-query scoring joins are against *tiny* broadcast relations (the
fixed query set and the per-term document frequencies), so the only wide
operation over the corpus is the (doc, term) term-frequency aggregation —
which Catalyst executes with map-side partial aggregation. At 100 TB the
shape is unchanged: tf rows for the query vocabulary only (a few dozen
terms), never the full corpus vocabulary.

Determinism notes (for oracle-hash exactness):
- every per-document score is a FIXED-ARITY expression (one explicit `+`
  chain over the query's terms after a pivot), never a float SUM over an
  unordered row set — so 32 threads, 1000 executors, and DuckDB's serial
  scan all produce the identical double;
- `ln` is the one transcendental; both engines take it over identical
  doubles and the result is rounded to 6 decimals in the emitted score
  (rank ordering uses the raw double; a tie needs |Δ| < ~1e-15 relative on
  different inputs, which the fixture cannot produce).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.functions.hashing import md5_long, md5_long_sql
from kinesis_sample_spark.queries import query

# ---------------------------------------------------------------------------
# q154 — BM25 top-k retrieval for a fixed query set.
# ---------------------------------------------------------------------------
#: the benchmark query set (id → terms). Fixed and tiny — broadcast by
#: construction; swap for a real query table at deploy time.
BM25_QUERIES: dict[str, tuple[str, str, str]] = {
    "q_join": ("join", "hash", "sort"),
    "q_stream": ("stream", "window", "batch"),
    "q_scan": ("scan", "table", "query"),
}
_K1 = 1.2
_B = 0.75
_TOPK = 10

_ALL_TERMS = sorted({t for ts in BM25_QUERIES.values() for t in ts})


def _sql_idf(term: str) -> str:
    """Lucene-BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5)); N and df are
    integer subqueries, so the ln argument is bit-identical on both
    engines."""
    return (
        f"ln(1 + ((SELECT count(*) FROM documents) - df.df_{term} + 0.5)"
        f" / (df.df_{term} + 0.5))"
    )


def _sql_tfnorm(term: str) -> str:
    return (
        f"(tf.tf_{term} * ({_K1} + 1))"
        f" / (tf.tf_{term} + {_K1} * (1 - {_B} + {_B} * tf.dl / st.avgdl))"
    )


def _build_bm25_oracle() -> str:
    tf_cols = ",\n           ".join(
        f"CAST(len(list_filter(toks, t -> t = '{term}')) AS DOUBLE) AS tf_{term}"
        for term in _ALL_TERMS
    )
    df_cols = ",\n           ".join(
        f"count(*) FILTER (WHERE tf_{term} > 0) AS df_{term}" for term in _ALL_TERMS
    )
    score_selects = "\n  UNION ALL\n".join(
        f"""  SELECT '{qid}' AS query_id, tf.doc_id,
         {' + '.join(f'({_sql_idf(t)}) * ({_sql_tfnorm(t)})' for t in terms)} AS score
  FROM tf, df, st WHERE tf.tf_{terms[0]} > 0 OR tf.tf_{terms[1]} > 0 OR tf.tf_{terms[2]} > 0"""
        for qid, terms in sorted(BM25_QUERIES.items())
    )
    return f"""
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
tf AS (
  SELECT doc_id, CAST(len(toks) AS DOUBLE) AS dl,
           {tf_cols}
  FROM tok
),
df AS (
  SELECT {df_cols} FROM tf
),
st AS (
  SELECT CAST(SUM(CAST(dl AS BIGINT)) AS DOUBLE) / count(*) AS avgdl FROM tf
),
scored AS (
{score_selects}
),
ranked AS (
  SELECT query_id, doc_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
  FROM scored
)
SELECT query_id, rnk, doc_id, round(score, 6) AS score_r
FROM ranked WHERE rnk <= {_TOPK}
ORDER BY query_id, rnk
"""


@query("q154_bm25_topk", oracle=_build_bm25_oracle())
def q154_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (Robertson/Spärck Jones; Lucene idf variant) top-10 per query.

    Spark shape, 100 TB-ready:
    - per-document term frequencies for the QUERY VOCABULARY ONLY, via one
      pass of array higher-order functions (no explode, no shuffle of the
      token stream — `size(filter(tokens, t = term))` per term);
    - corpus count, document frequencies and average doc length in ONE
      tiny global aggregate, broadcast back as a scalar relation — no
      extra count() scan;
    - ALL queries scored in the same single pass over the corpus (one
      score column per query, unpivoted with `stack`) — the corpus is
      scanned exactly once however many queries run; each score is a
      fixed `+` chain (float-order deterministic), and score > 0 is
      exactly "matches ≥1 term" because idf > 0 and tfnorm(0) = 0;
    - per-query top-k via window row_number — TakeOrdered shape, no
      global sort of the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")

    def _term_eq(term: str):
        # NB: the lambda must take exactly one argument — PySpark treats a
        # second parameter as the array index.
        return lambda t: t == F.lit(term)

    tf = docs.select(
        "doc_id",
        F.size(toks).cast("double").alias("dl"),
        *[
            F.size(F.filter(toks, _term_eq(term)))
            .cast("double")
            .alias(f"tf_{term}")
            for term in _ALL_TERMS
        ],
    )
    stats = tf.agg(
        *[
            F.count(F.when(F.col(f"tf_{t}") > 0, 1)).alias(f"df_{t}")
            for t in _ALL_TERMS
        ],
        (F.sum(F.col("dl").cast("bigint")).cast("double") / F.count("*")).alias(
            "avgdl"
        ),
        F.count("*").cast("double").alias("n_docs"),
    )
    tf_s = tf.crossJoin(F.broadcast(stats))

    def idf(term: str):
        df_c = F.col(f"df_{term}")
        return F.log(
            F.lit(1.0) + (F.col("n_docs") - df_c + 0.5) / (df_c + 0.5)
        )

    def tfnorm(term: str):
        tf_c = F.col(f"tf_{term}")
        return (tf_c * (_K1 + 1)) / (
            tf_c + _K1 * (1 - _B + _B * F.col("dl") / F.col("avgdl"))
        )

    score_cols = []
    stack_args: list[str] = []
    for qi, (qid, terms) in enumerate(sorted(BM25_QUERIES.items())):
        t1, t2, t3 = terms
        score = (
            (idf(t1) * tfnorm(t1)) + (idf(t2) * tfnorm(t2)) + (idf(t3) * tfnorm(t3))
        )
        score_cols.append(score.alias(f"s_{qi}"))
        stack_args.extend([f"'{qid}'", f"s_{qi}"])
    wide = tf_s.select("doc_id", *score_cols)
    scored = wide.select(
        "doc_id",
        F.expr(
            f"stack({len(BM25_QUERIES)}, {', '.join(stack_args)}) AS (query_id, score)"
        ),
    ).filter(F.col("score") > 0)
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), "doc_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _TOPK)
        .select("query_id", "rnk", "doc_id", F.round("score", 6).alias("score_r"))
        .orderBy("query_id", "rnk")
    )


# ---------------------------------------------------------------------------
# q204 — inverted-index builder with fingerprinted posting lists.
# ---------------------------------------------------------------------------
_IDX_TOP_TERMS = 50


@query(
    "q204_inverted_index",
    oracle=f"""
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
    SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
    FROM tok GROUP BY term, doc_id
),
stats AS (
    SELECT term, COUNT(*) AS df, CAST(SUM(tf) AS BIGINT) AS total_tf,
           MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc,
           string_agg(doc_id || ':' || tf, ',' ORDER BY doc_id) AS postings
    FROM tf GROUP BY term
),
top AS (
    SELECT *, row_number() OVER (ORDER BY df DESC, term) AS rnk
    FROM stats
)
SELECT term, df, total_tf, first_doc, last_doc,
       {md5_long_sql('postings')} AS postings_fp
FROM top WHERE rnk <= {_IDX_TOP_TERMS}
ORDER BY df DESC, term
""",
)
def q204_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction — the batch job behind every lexical
    retrieval system (q154's BM25 assumes this exists): per term, the
    document-ordered posting list with term frequencies. The driver gate
    can't haul corpus-sized postings through the comparator, so each
    list is verified by FINGERPRINT: the doc-ordered "doc:tf" string is
    md5-hashed on both engines (md5_long, the 60-bit convention) — one
    flipped tf, dropped doc, or misordered entry anywhere in any posting
    list changes the hash. Emitted for the top-50 terms by df
    (deterministic tie-break), alongside df / total_tf / first-last doc.

    Scale: tokenize-explode → (term, doc) count → per-term aggregation;
    the posting string is assembled per term with collect_list +
    array_sort (bounded by the term's df — at 100 TB the stop-term rows
    are exactly the ones a production index shards or skips, and the
    top-k here is a heap merge, not a global sort)."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("term", "doc_id").agg(F.count("*").alias("tf"))
    stats = tf.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("total_tf"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
        F.expr(
            "concat_ws(',', transform(array_sort(collect_list(struct(doc_id, tf))),"
            " s -> concat(s.doc_id, ':', s.tf)))"
        ).alias("postings"),
    )
    return (
        stats.select(
            "term",
            "df",
            "total_tf",
            "first_doc",
            "last_doc",
            md5_long(F.col("postings")).alias("postings_fp"),
        )
        .orderBy(F.col("df").desc(), "term")
        .limit(_IDX_TOP_TERMS)
    )


# ---------------------------------------------------------------------------
# q226 — reciprocal-rank fusion of two document rankings.
# ---------------------------------------------------------------------------
_RRF_K = 60
_RRF_TOP = 50


@query(
    "q226_rank_fusion",
    oracle=f"""
WITH ra AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS r
    FROM documents
),
rb AS (
    SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY len(list_distinct(string_split(text, ' '))) DESC,
                              doc_id) AS r
    FROM documents
),
fused AS (
    SELECT ra.doc_id,
           CAST(round(1.0 / ({_RRF_K} + ra.r), 6) AS DECIMAL(18,6))
         + CAST(round(1.0 / ({_RRF_K} + rb.r), 6) AS DECIMAL(18,6)) AS rrf,
           ra.r AS rank_chars, rb.r AS rank_vocab
    FROM ra JOIN rb ON ra.doc_id = rb.doc_id
)
SELECT doc_id, CAST(CAST(rrf AS VARCHAR) AS DOUBLE) AS rrf, rank_chars, rank_vocab
FROM fused
ORDER BY rrf DESC, doc_id
LIMIT {_RRF_TOP}
""",
)
def q226_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. SIGIR'09) of two document
    rankings — the standard way a retrieval pipeline merges BM25-style
    and embedding-style result lists without score calibration: rrf(d) =
    sum over rankings of 1/(k + rank_d), k=60. Here the two rankings are
    length-by-chars and vocabulary-size (self-contained stand-ins with
    the same shape as q154/q103 outputs). Each reciprocal is one double
    division quantized round(.,6) -> DECIMAL, so the fusion sum is exact
    in any order.

    Scale: each ranking is a window over the corpus (at true scale a
    top-k per ranking bounds the fused set); the fusion join is
    doc-keyed, one shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    ra = docs.select(
        "doc_id",
        F.row_number()
        .over(W.orderBy(F.col("n_chars").desc(), "doc_id"))
        .alias("rank_chars"),
    )
    rb = docs.select(
        "doc_id",
        F.row_number()
        .over(
            W.orderBy(
                F.size(F.array_distinct(F.split("text", " "))).desc(), "doc_id"
            )
        )
        .alias("rank_vocab"),
    )
    def recip(rank_col):
        return F.round(F.lit(1.0) / (F.lit(_RRF_K) + F.col(rank_col)), 6).cast(
            "decimal(18,6)"
        )
    return (
        ra.join(rb, "doc_id")
        .select(
            "doc_id",
            (recip("rank_chars") + recip("rank_vocab"))
            .cast("double")
            .alias("rrf"),
            "rank_chars",
            "rank_vocab",
        )
        .orderBy(F.col("rrf").desc(), "doc_id")
        .limit(_RRF_TOP)
    )


# ---------------------------------------------------------------------------
# q308 — phrase-query consistency: positional index == boundary scan.
# ---------------------------------------------------------------------------
_PHRASE_TOP = 5


@query(
    "q308_phrase_index_consistency",
    oracle=f"""
WITH toks AS (
    SELECT doc_id, i AS pos, string_split(text, ' ')[i] AS tok
    FROM documents, (SELECT unnest(range(1, 129)) AS i) idx
    WHERE i <= len(string_split(text, ' '))
),
big AS (
    SELECT doc_id, tok AS tok1,
           LEAD(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS tok2
    FROM toks
),
pairs AS (SELECT doc_id, tok1, tok2 FROM big WHERE tok2 IS NOT NULL),
top AS (
    SELECT tok1, tok2, CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs GROUP BY 1, 2
    ORDER BY n_pairs DESC, tok1, tok2 LIMIT {_PHRASE_TOP}
),
via_index AS (
    SELECT t.tok1, t.tok2, CAST(COUNT(DISTINCT p.doc_id) AS BIGINT)
             AS n_docs_index
    FROM top t JOIN pairs p ON p.tok1 = t.tok1 AND p.tok2 = t.tok2
    GROUP BY 1, 2
),
via_scan AS (
    SELECT t.tok1, t.tok2, CAST(COUNT(*) AS BIGINT) AS n_docs_scan
    FROM top t JOIN documents d
      ON regexp_matches(d.text, '(^| )' || t.tok1 || ' ' || t.tok2 || '( |$)')
    GROUP BY 1, 2
)
SELECT t.tok1, t.tok2, t.n_pairs, i.n_docs_index, s.n_docs_scan,
       i.n_docs_index = s.n_docs_scan AS index_matches_scan
FROM top t
JOIN via_index i ON i.tok1 = t.tok1 AND i.tok2 = t.tok2
JOIN via_scan s ON s.tok1 = t.tok1 AND s.tok2 = t.tok2
ORDER BY t.n_pairs DESC, t.tok1, t.tok2
""",
)
def q308_phrase_index_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """An index is only as good as its agreement with the scan it
    replaces. For the corpus's top-5 bigrams, phrase-match documents
    two independent ways — (1) the POSITIONAL-INDEX plan: adjacent-
    position token pairs (the q204 posting list plus positions), an
    equi-join on the phrase terms, COUNT(DISTINCT doc); (2) the SCAN
    plan: a word-boundary regex over the raw text — and emit both counts
    plus their equality. The flag is COMPUTED in both engines (not
    pinned), so the law is checked twice independently AND cross-engine
    hash-gated; any tokenizer/boundary drift between index build and
    query rewrite breaks it loudly.

    This is the audit that guards an index-accelerated query rewrite at
    100 TB: the optimizer may only substitute the index plan if the two
    are provably interchangeable on live data.

    Scale: positions come from one window LEAD over the exploded corpus
    (a single doc-keyed shuffle, no position self-join); the index probe
    is an equi-join against the 5-row phrase set (broadcast); the
    regex scan — the expensive plan the index replaces — touches each
    document once per phrase."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    pairs = (
        toks.select("doc_id", F.col("tok").alias("tok1"), F.lead("tok").over(w).alias("tok2"))
        .filter(F.col("tok2").isNotNull())
    )
    top = (
        pairs.groupBy("tok1", "tok2")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), "tok1", "tok2")
        .limit(_PHRASE_TOP)
    )
    via_index = (
        pairs.join(F.broadcast(top.select("tok1", "tok2")), ["tok1", "tok2"])
        .groupBy("tok1", "tok2")
        .agg(F.countDistinct("doc_id").alias("n_docs_index"))
    )
    pattern = F.concat(
        F.lit("(^| )"), F.col("tok1"), F.lit(" "), F.col("tok2"), F.lit("( |$)")
    )
    via_scan = (
        docs.select("text")
        .join(F.broadcast(top.select("tok1", "tok2")))
        .filter(F.expr("text rlike concat('(^| )', tok1, ' ', tok2, '( |$)')"))
        .groupBy("tok1", "tok2")
        .agg(F.count("*").alias("n_docs_scan"))
    )
    return (
        top.join(via_index, ["tok1", "tok2"])
        .join(via_scan, ["tok1", "tok2"])
        .select(
            "tok1",
            "tok2",
            "n_pairs",
            "n_docs_index",
            "n_docs_scan",
            (F.col("n_docs_index") == F.col("n_docs_scan")).alias(
                "index_matches_scan"
            ),
        )
        .orderBy(F.desc("n_pairs"), "tok1", "tok2")
    )
