"""Skew-resilient join — explicit salting.

AQE's skew-join splitting (on by default in session.py) handles most skew
at runtime; explicit salting remains the tool when one join key dominates
so badly that even split partitions bottleneck, or when AQE is unavailable
(streaming joins). Mechanism: spread each hot left-side key across
``salt_buckets`` sub-keys; replicate the right side once per bucket; join
on (key, salt). Result set is provably identical to the plain join — the
right-side replication exactly undoes the left-side spread.

Cost model: right side inflates ×salt_buckets, so salt the side whose
*other* side is small(ish), and keep salt_buckets ≈ ceil(hot-key rows /
target-partition rows). For broadcastable right sides prefer broadcast —
salting is for the mid-size case between broadcast and well-behaved SMJ.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt_buckets: int = 16,
) -> DataFrame:
    """Equi-join with left-side salting. Supported ``how``: inner/left —
    semantics where every left row must appear exactly once per match."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    # deterministic spread: hash of the full left row — uniform across the
    # hot key's rows, reproducible across retries (no rand()).
    lsalt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(salt_buckets))
    l = left.withColumn("__salt", lsalt)
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    joined = l.join(r, keys + ["__salt"], how)
    return joined.drop("__salt")
