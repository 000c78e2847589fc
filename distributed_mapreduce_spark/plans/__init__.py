"""Plan inspection utilities (scale-posture checks)."""

from distributed_mapreduce_spark.plans.checks import (
    exchange_count,
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
    wholestage_codegen_count,
)

__all__ = [
    "exchange_count",
    "explain_str",
    "pushed_filters",
    "read_schema_columns",
    "has_broadcast_join",
    "wholestage_codegen_count",
]
