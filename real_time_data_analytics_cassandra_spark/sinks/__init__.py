"""Batch/storage sinks (partitioned + bucketed parquet layouts,
keyed MERGE upsert, snapshot-versioned tables)."""

from real_time_data_analytics_cassandra_spark.sinks.layout import (
    write_bucketed_table,
    write_partitioned,
)
from real_time_data_analytics_cassandra_spark.sinks.merge import (
    merge_upsert,
    merge_upsert_foreach_batch,
)
from real_time_data_analytics_cassandra_spark.sinks.snapshots import (
    expire_snapshots,
    read_snapshot,
    snapshot_versions,
    write_snapshot,
)

__all__ = [
    "expire_snapshots",
    "merge_upsert",
    "merge_upsert_foreach_batch",
    "read_snapshot",
    "snapshot_versions",
    "write_bucketed_table",
    "write_partitioned",
    "write_snapshot",
]
