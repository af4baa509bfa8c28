"""Physical-plan introspection — the engine's scale guardrails.

`.explain()` is a debugging aid; these helpers turn it into *assertions*
so tests fail when a plan regresses (a filter stops pushing down, a
broadcast becomes a shuffle join, an aggregate loses its partial phase).
That is how "would this survive 100 TB?" stays checked in CI rather than
reviewed once and forgotten.
"""

from kinesis_sample_spark.plans.inspect import (
    formatted_plan,
    pushed_filters,
    has_broadcast_join,
    has_partial_aggregate,
    exchange_count,
    scan_columns,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "has_broadcast_join",
    "has_partial_aggregate",
    "exchange_count",
    "scan_columns",
]
