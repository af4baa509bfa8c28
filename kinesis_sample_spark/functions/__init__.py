"""Scalar/expression helpers shared by operators and queries."""

from kinesis_sample_spark.functions.numeric import dec, dsum, davg
from kinesis_sample_spark.functions.hashing import md5_long, seeded_md5_long

__all__ = ["dec", "dsum", "davg", "md5_long", "seeded_md5_long"]
