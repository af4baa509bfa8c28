"""O(n) shingling expressions.

The naive shingle expression ``transform(sequence(1, n-2), i ->
concat_ws(' ', slice(toks, i, 3)))`` re-evaluates ``slice`` (and, after
projection collapsing, the underlying ``split``) per element — O(tokens²)
per row, which is what turns a 5k-doc corpus into seconds of CPU and a
100 TB corpus into a non-starter.

Instead, zip the token array against its off-by-1 and off-by-2 shifted
selves: each ``slice``/``zip_with`` is evaluated once per row, O(tokens)
total. ``zip_with`` pads the shorter side with null and ``concat``
propagates it, so the trailing incomplete shingles drop out in one
``filter``. Produces byte-identical shingle strings to the naive form —
the DuckDB oracles keep the straightforward rendering.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def shingle_array(toks: Column, k: int = 3) -> Column:
    """Word k-shingles ("w1 w2 w3") of a token array, in order, O(n)."""
    sh = toks
    for off in range(2, k + 1):
        shifted = F.slice(toks, off, F.size(toks))
        sh = F.zip_with(sh, shifted, lambda x, y: F.concat(x, F.lit(" "), y))
    return F.filter(sh, lambda x: x.isNotNull())
