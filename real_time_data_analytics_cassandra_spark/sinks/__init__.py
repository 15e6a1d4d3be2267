"""Batch/storage sinks (partitioned + bucketed parquet layouts)."""

from real_time_data_analytics_cassandra_spark.sinks.layout import (
    write_bucketed_table,
    write_partitioned,
)

__all__ = ["write_bucketed_table", "write_partitioned"]
