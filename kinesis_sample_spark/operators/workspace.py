"""Materialized pipeline workspace — the cross-job form of ``persist()``.

In-session ``persist()`` (q30/q31/q130…) dies with the session; a 100 TB
corpus pipeline runs as *separate jobs* that hand each other parquet
relations. This module is that contract: each stage writes its output
once under a workspace directory and later runs (or later stages) read
the parquet back instead of recomputing — the same reason warehouses
materialize signature stores, candidate-pair relations, and cluster
assignments as tables (operators/incremental.py already does this for
the ingest-dedup store).

Atomicity: Spark's parquet committer only leaves ``_SUCCESS`` after a
complete job, so a crashed write (no marker) is recomputed, never
half-read — the same crash-safety argument as operators/upsert.py.

``prepare_corpus`` chains the dedup stages end-to-end: verified near-dup
pairs → connected components → canonical selection (keep-longest, q127's
policy) → kept-document manifest. Every stage is an operator already
value-gated as a registry query; this runner adds only the
materialization seams, so its results inherit the gates.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def materialize(df: DataFrame, path: str) -> DataFrame:
    """Write ``df`` to ``path`` once (skipped if a completed write is
    already there) and return the parquet-backed relation. Reading back
    — rather than returning ``df`` — cuts the lineage: downstream stages
    plan against the materialized footprint, exactly like a separate job
    would."""
    spark = df.sparkSession
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def prepare_corpus(spark: SparkSession, sf_dir: str, workdir: str) -> dict[str, DataFrame]:
    """Run (or resume) the dedup pipeline, materializing each stage under
    ``workdir``. Returns the stage relations keyed by name. A re-run with
    an intact workspace reads every stage from parquet and recomputes
    nothing."""
    from kinesis_sample_spark.catalog import load_table
    from kinesis_sample_spark.operators.components import connected_components
    from kinesis_sample_spark.queries.dedup import q31_minhash_lsh
    from pyspark.sql import Window as W

    pairs = materialize(
        q31_minhash_lsh(spark, sf_dir).select("doc_a", "doc_b", "jaccard"),
        os.path.join(workdir, "pairs"),
    )
    clusters = materialize(
        connected_components(pairs, "doc_a", "doc_b"),
        os.path.join(workdir, "clusters"),
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    members = clusters.select(F.col("node").alias("doc_id"), "component").join(
        docs, "doc_id"
    )
    w = W.partitionBy("component").orderBy(F.desc("n_chars"), "doc_id")
    canonical = materialize(
        members.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("component", F.col("doc_id").alias("canonical_doc")),
        os.path.join(workdir, "canonical"),
    )
    # keep = everything not in a cluster, plus each cluster's canonical
    drop = (
        members.join(
            canonical,
            (members.component == canonical.component)
            & (members.doc_id == canonical.canonical_doc),
            "left_anti",
        )
        .select("doc_id")
    )
    kept = materialize(
        docs.join(drop, "doc_id", "left_anti"),
        os.path.join(workdir, "kept"),
    )
    manifest = materialize(
        kept.groupBy("source").agg(
            F.count("*").alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
        ),
        os.path.join(workdir, "manifest"),
    )
    return {
        "pairs": pairs,
        "clusters": clusters,
        "canonical": canonical,
        "kept": kept,
        "manifest": manifest,
    }
