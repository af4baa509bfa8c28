"""Vector expressions over ``array<float>`` embedding columns.

Dot products are computed with ``zip_with`` + ``aggregate`` — element-wise
multiply then a strict left-to-right fold, all JVM-side. Elements are cast
float→double *before* multiplying so the arithmetic is double throughout;
DuckDB's ``list_dot_product`` over ``DOUBLE[]`` performs the identical
sequential double accumulation (verified empirically), which makes cosine
values bit-identical between engine and oracle.

Scale: these are per-row expressions (no shuffle, no Python). For 100 TB
corpora the brute-force path is one broadcast of the query set; the LSH
path prunes candidates by bucket equality before any dot product runs.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential double-precision dot product of two float arrays."""
    products = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(products, F.lit(0.0), lambda acc, v: acc + v)


def cosine(a: Column, b: Column) -> Column:
    """cos(a,b) = dot/(|a|·|b|) with the exact expression shape the oracle
    mirrors: sqrt of self-dot per side, multiplied, then one division."""
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def sql_dot(a: str, b: str) -> str:
    """DuckDB rendering of :func:`dot` (inputs cast to DOUBLE[])."""
    return f"list_dot_product(({a})::DOUBLE[], ({b})::DOUBLE[])"


def sql_cosine(a: str, b: str) -> str:
    return f"({sql_dot(a, b)} / (sqrt({sql_dot(a, a)}) * sqrt({sql_dot(b, b)})))"


# ---------------------------------------------------------------------------
# Deterministic random hyperplanes for LSH bucketing. Computed in *Python*
# with the same md5→int derivation both engines use elsewhere, then embedded
# as plain literals in both the Spark plan and the oracle SQL — no engine
# hash evaluation, so the planes are identical by construction.
# ---------------------------------------------------------------------------

def hyperplanes(n_planes: int, dim: int) -> list[list[float]]:
    out = []
    for j in range(n_planes):
        plane = []
        for d in range(dim):
            h = int(hashlib.md5(f"{j}:{d}".encode()).hexdigest()[:15], 16)
            plane.append((h % 2001 - 1000) / 1000.0)
        out.append(plane)
    return out


def plane_lit(plane: list[float]) -> Column:
    return F.array(*[F.lit(x) for x in plane])


def sql_plane_lit(plane: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in plane) + "]"
