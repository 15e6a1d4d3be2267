"""Batch/storage sinks (partitioned + bucketed parquet layouts,
keyed MERGE upsert)."""

from real_time_data_analytics_cassandra_spark.sinks.layout import (
    write_bucketed_table,
    write_partitioned,
)
from real_time_data_analytics_cassandra_spark.sinks.merge import (
    merge_upsert,
    merge_upsert_foreach_batch,
)

__all__ = [
    "merge_upsert",
    "merge_upsert_foreach_batch",
    "write_bucketed_table",
    "write_partitioned",
]
