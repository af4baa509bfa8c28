"""Property-based checks of the two cross-engine primitives every
hash-gated oracle rests on:

- ``functions/hashing.py``: the md5-derived 60-bit integer must be
  byte-identical across Spark, DuckDB, and a plain-Python reference for
  ARBITRARY unicode input (minhash/simhash/fingerprints/splits all hash
  user text, not just fixture ASCII);
- ``functions/vectors.py``: the sequential double dot-product fold must
  be bit-identical between Spark's zip_with/aggregate and DuckDB's
  list_dot_product for arbitrary float32 vectors (the docstring's
  "verified empirically" claim, made adversarial).

``derandomize=True`` keeps the example stream fixed — a future failure
means a code change broke parity, never hypothesis drawing a fresh seed.
The quick CI lane runs 8 deterministic examples per property; export
``SPARK_GRAFT_PROPERTY_EXAMPLES=64`` (or higher) for the deep lane — the
stream stays derandomized, so a bigger budget is a strict prefix-superset
of the quick run, and any failure it finds is replayable at the same
budget.
"""

from __future__ import annotations

import hashlib
import os

import duckdb
import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesis_sample_spark.functions.hashing import md5_long, md5_long_sql
from kinesis_sample_spark.functions.vectors import dot, sql_dot

# no surrogates (not encodable to UTF-8); include plenty of non-ASCII
texts_strategy = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        min_size=0,
        max_size=40,
    ),
    min_size=1,
    max_size=24,
    unique=True,
)


MAX_EXAMPLES = int(os.environ.get("SPARK_GRAFT_PROPERTY_EXAMPLES", "8"))


def _py_md5_60bit(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


@pytest.mark.slow
@given(texts=texts_strategy)
@settings(
    max_examples=MAX_EXAMPLES,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_md5_long_three_way_parity(spark, texts):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(texts)], "i int, s string")
    got_spark = {
        r["i"]: r["h"]
        for r in df.select("i", md5_long("s").alias("h")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INTEGER, s TEXT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    got_duck = dict(con.execute(f"SELECT i, {md5_long_sql('s')} FROM t").fetchall())
    expected = {i: _py_md5_60bit(s) for i, s in enumerate(texts)}
    assert got_spark == expected
    assert got_duck == expected


vecs_strategy = st.integers(min_value=1, max_value=12).flatmap(
    lambda dim: st.lists(
        st.tuples(
            st.lists(
                st.floats(
                    width=32,
                    allow_nan=False,
                    allow_infinity=False,
                    min_value=-1e6,
                    max_value=1e6,
                ),
                min_size=dim,
                max_size=dim,
            ),
            st.lists(
                st.floats(
                    width=32,
                    allow_nan=False,
                    allow_infinity=False,
                    min_value=-1e6,
                    max_value=1e6,
                ),
                min_size=dim,
                max_size=dim,
            ),
        ),
        min_size=1,
        max_size=10,
    )
)


@pytest.mark.slow
@given(pairs=vecs_strategy)
@settings(
    max_examples=MAX_EXAMPLES,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_dot_product_fold_parity(spark, pairs):
    # width=32 floats are exactly representable as float32: both engines
    # then fold the IDENTICAL doubles, so equality must be exact
    schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("a", T.ArrayType(T.FloatType())),
            T.StructField("b", T.ArrayType(T.FloatType())),
        ]
    )
    rows = [(i, list(a), list(b)) for i, (a, b) in enumerate(pairs)]
    df = spark.createDataFrame(rows, schema)
    got_spark = {
        r["i"]: r["d"]
        for r in df.select("i", dot(F.col("a"), F.col("b")).alias("d")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE v (i INTEGER, a DOUBLE[], b DOUBLE[])")
    con.executemany(
        "INSERT INTO v VALUES (?, ?, ?)",
        [
            (
                i,
                [float(np.float32(x)) for x in a],
                [float(np.float32(x)) for x in b],
            )
            for i, (a, b) in enumerate(pairs)
        ],
    )
    got_duck = dict(
        con.execute(f"SELECT i, {sql_dot('a', 'b')} FROM v").fetchall()
    )
    assert got_spark == got_duck
