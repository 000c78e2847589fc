"""Scalar function library (SURVEY.md §2.10).

Every function the reference applies to values, re-expressed as
Catalyst `Column` expressions (JVM-side, codegen'd — never Python UDFs).
"""

from distributed_mapreduce_spark.functions.strings import (
    normalize_empty,
    pct_of_total_str,
    sanitize_key,
)

__all__ = ["normalize_empty", "sanitize_key", "pct_of_total_str"]
