"""Multimodal-column plumbing — north-star LLM-pipeline surface.

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct; decode / feature-extraction runs as Arrow-batched pandas UDFs via
``mapInPandas``. The real decoders (PIL / libav / librosa) are not in this
container, so the decode step is a clearly-marked deterministic stub — the
Spark-side plumbing (schema, batch iteration, partitioning, UDF signature)
is real and oracle-checked: the stub's features (byte length, additive
checksum, head bytes) are recomputable in SQL.

Scale: mapInPandas streams Arrow batches — constant memory per task, no
driver involvement; binary payloads never shuffle (features are extracted
before any wide operation).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_sample_spark.catalog import load_table
from kinesis_sample_spark.queries import query

try:  # real decoders, if ever present in the image
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False

FEATURE_SCHEMA = (
    "doc_id bigint, fmt string, width int, height int, "
    "byte_len int, checksum bigint, head_hex string"
)


def decode_media(data: bytes, fmt: str) -> dict:
    """Stub decoder. With a real imaging lib this would open ``data`` and
    return pixel-level features; here it computes deterministic byte-level
    features so the pipeline is testable end-to-end."""
    if HAVE_PIL and fmt.startswith("image/"):  # pragma: no cover — not in container
        raise NotImplementedError("real image decode not wired in this environment")
    return {
        "byte_len": len(data),
        "checksum": sum(data) % 997,
        "head_hex": data[:8].hex(),
    }


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        feats = [decode_media(d, f) for d, f in zip(pdf["media"], pdf["fmt"])]
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "fmt": pdf["fmt"].values,
                "width": pdf["width"].values,
                "height": pdf["height"].values,
                "byte_len": [f["byte_len"] for f in feats],
                "checksum": [f["checksum"] for f in feats],
                "head_hex": [f["head_hex"] for f in feats],
            }
        )
        yield out


@query(
    "q50_media_features",
    oracle="""
SELECT doc_id,
       'fake/text' AS fmt,
       CAST(n_chars % 640 AS INTEGER) AS width,
       CAST(doc_id % 480 AS INTEGER) AS height,
       CAST(length(text) AS INTEGER) AS byte_len,
       list_aggregate(list_transform(range(1, length(text) + 1),
                                     i -> ascii(substring(text, i, 1))), 'sum') % 997 AS checksum,
       lower(to_hex(encode(substring(text, 1, 8)))) AS head_hex
FROM documents
ORDER BY doc_id
""",
)
def q50_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media ingestion pipeline: build the binary envelope (media bytes +
    typed metadata), then feature-extract through an Arrow-batched
    ``mapInPandas``. The oracle recomputes the stub features in SQL, so the
    whole UDF exchange (schema, batching, binary round trip) is
    value-checked — not just smoke-tested."""
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("media"),  # opaque bytes stand-in
        F.lit("fake/text").alias("fmt"),
        (F.col("n_chars") % 640).cast("int").alias("width"),
        (F.col("doc_id") % 480).cast("int").alias("height"),
    )
    return media.mapInPandas(_extract_features, FEATURE_SCHEMA).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q65 — scalar pandas UDF (Arrow-vectorized) with exact oracle parity.
# ---------------------------------------------------------------------------
def _make_vector_norm_udf():
    """L2 norm with explicit sequential accumulation — NumPy's sum uses
    pairwise summation whose float result differs from the oracle's
    sequential fold; the per-element loop keeps the UDF bit-identical to
    sqrt(list_dot_product(v,v)). (For throughput-first production use
    np.linalg.norm and drop oracle exactness.)

    Built lazily: decorating with a DDL return type at import time needs
    an active SparkSession, and query modules import session-free.
    """

    @F.pandas_udf("double")
    def _vector_norm(embs: pd.Series) -> pd.Series:
        import math

        out = []
        for v in embs:
            acc = 0.0
            for x in v:
                xd = float(x)
                acc += xd * xd
            out.append(math.sqrt(acc))
        return pd.Series(out)

    return _vector_norm


@query(
    "q65_pandas_vector_norm",
    oracle="""
SELECT vec_id, label,
       sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
FROM embeddings
ORDER BY vec_id
""",
)
def q65_pandas_vector_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar-pandas-UDF path (Arrow batches, vectorized transport):
    per-row embedding norms, hash-matched against the SQL oracle — proving
    the Python exchange preserves values exactly, not just approximately."""
    from kinesis_sample_spark.catalog import load_table as _lt

    emb = _lt(spark, sf_dir, "embeddings").repartition(
        spark.sparkContext.defaultParallelism
    )
    vector_norm = _make_vector_norm_udf()
    return (
        emb.select("vec_id", "label", vector_norm("embedding").alias("norm"))
        .orderBy("vec_id")
    )
