"""Plan inspection helpers (used by tests to keep plans honest)."""

from real_time_data_analytics_cassandra_spark.plans.checks import (
    broadcast_scanned_tables,
    explain_str,
    has_broadcast_join,
    operator_count,
    pushed_filters,
    python_eval_free,
    scan_count,
    unpartitioned_window_count,
    wholestage_codegen_count,
)

__all__ = [
    "broadcast_scanned_tables",
    "explain_str",
    "has_broadcast_join",
    "operator_count",
    "pushed_filters",
    "python_eval_free",
    "scan_count",
    "unpartitioned_window_count",
    "wholestage_codegen_count",
]
