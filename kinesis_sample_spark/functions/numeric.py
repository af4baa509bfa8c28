"""Oracle-exact numeric aggregation helpers.

Problem: the fixtures store money as ``double``; a parallel Spark ``SUM``
adds in partition order while a single-threaded oracle adds in row order —
float addition is not associative, so the two differ in the low bits and an
exact value-hash comparison fails (and at 100 TB, results would be
non-reproducible run to run).

Fix: cast each operand to an exact DECIMAL before aggregating. Decimal
arithmetic is exact and associative (as long as intermediate precision stays
within 38 digits), so any summation order — 32 local threads or 1000
executors — yields the *same* decimal, and the final cast back to double is
deterministic. The oracle SQL applies the identical casts, so both engines
produce bit-identical doubles.

Scale choices (see FIXTURES.md: prices ≤ ~1.1e5 with 2-decimal semantics,
rates < 1 with ≤2-decimal semantics):

- prices/quantities: DECIMAL(12,2)
- discount/tax rates: DECIMAL(6,4)
- ``(1 ± rate)`` built against an explicit DECIMAL(2,0) literal so the
  product chain ``price * (1-d) * (1+t)`` peaks at DECIMAL(28,10) in Spark
  (Spark multiply precision = p1+p2+1) — safely ≤ 38, no precision loss.

Rounding a double into a decimal is engine-independent: a binary double can
never be exactly on a decimal midpoint, so HALF_UP (Spark) and HALF_EVEN
agree.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: default scales, mirrored verbatim in every oracle_sql string.
MONEY = "decimal(12,2)"
RATE = "decimal(6,4)"
ONE = "cast(1 as decimal(2,0))"


def dec(col: Column | str, typ: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def one_minus(rate_col: str) -> Column:
    """(1 - rate) as exact decimal; oracle: (cast(1 as decimal(2,0)) - cast(r as decimal(6,4)))."""
    return F.expr(f"{ONE} - cast({rate_col} as {RATE})")


def one_plus(rate_col: str) -> Column:
    return F.expr(f"{ONE} + cast({rate_col} as {RATE})")


def dsum(expr: Column, alias: str) -> Column:
    """Exact decimal SUM surfaced as double."""
    return F.sum(expr).cast("double").alias(alias)


def davg(expr: Column, count_col: str, alias: str) -> Column:
    """Deterministic AVG: exact decimal sum cast to double, divided by count.

    (Plain AVG would divide per-engine in different intermediate types.)
    """
    return (F.sum(expr).cast("double") / F.count(count_col)).alias(alias)


# ---------------------------------------------------------------------------
# SQL emitters — the DuckDB-oracle renderings of the expressions above.
# Keeping both dialect halves in this one module is what guarantees the
# Spark plan and the oracle stay cast-for-cast identical.
# ---------------------------------------------------------------------------

def sql_dec(expr: str, typ: str = MONEY) -> str:
    return f"CAST({expr} AS {typ})"


def sql_one_minus(rate_col: str) -> str:
    return f"({ONE} - CAST({rate_col} AS {RATE}))"


def sql_one_plus(rate_col: str) -> str:
    return f"({ONE} + CAST({rate_col} AS {RATE}))"


def sql_double(expr: str) -> str:
    """Correctly-rounded decimal→double for DuckDB.

    DuckDB's direct ``CAST(decimal AS DOUBLE)`` double-rounds (int128→double,
    then ÷10^scale) and can be 1 ulp off from the correctly-rounded value
    Spark produces via Java BigDecimal. Routing through VARCHAR forces a
    correctly-rounded strtod parse, bit-identical to Spark.
    """
    return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"


def sql_dsum(expr: str, alias: str) -> str:
    return f"{sql_double(f'SUM({expr})')} AS {alias}"


def sql_davg(expr: str, count_col: str, alias: str) -> str:
    return f"{sql_double(f'SUM({expr})')} / COUNT({count_col}) AS {alias}"
