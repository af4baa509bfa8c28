"""Deterministic, engine-portable hashing.

MinHash / SimHash / fingerprint operators need a hash function that the
DuckDB oracle can reproduce *exactly*. Spark's ``F.hash`` (Murmur3) and
DuckDB's ``hash()`` are different algorithms, so instead we derive 60-bit
integers from ``md5`` — identical in both engines:

- Spark : ``conv(substring(md5(s), 1, 15), 16, 10)`` cast to bigint
- DuckDB: ``('0x' || substring(md5(s), 1, 15))::BIGINT``

15 hex digits = 60 bits, always non-negative, no overflow. md5 is
overkill cryptographically but it is the one hash both engines share; at
100 TB the cost is one md5 per token — still JVM-side, codegen'd, no
Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def seeded_md5_long(col: Column | str, seed: int) -> Column:
    """Family of independent hash functions h_seed(x) = md5(seed || ':' || x)."""
    c = F.col(col) if isinstance(col, str) else col
    return md5_long(F.concat(F.lit(f"{seed}:"), c))


def md5_long_sql(expr: str) -> str:
    """DuckDB rendering of :func:`md5_long` over SQL expression ``expr``."""
    return f"(('0x' || substring(md5({expr}), 1, 15))::BIGINT)"


def seeded_md5_long_sql(expr: str, seed: int) -> str:
    return md5_long_sql(f"'{seed}:' || {expr}")
