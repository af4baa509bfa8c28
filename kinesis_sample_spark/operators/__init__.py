"""Custom operators Spark lacks as built-ins, composed from DataFrame ops.

Preference order per the engine rules: (1) composition of built-in ops,
(2) Arrow-batched pandas UDFs, (3) mapPartitions. Everything in this
package is category (1) unless its docstring says otherwise.
"""

from kinesis_sample_spark.operators.asof import asof_join
from kinesis_sample_spark.operators.skew import salted_join

__all__ = ["asof_join", "salted_join"]
