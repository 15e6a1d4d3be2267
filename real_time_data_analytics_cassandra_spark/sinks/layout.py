"""Storage layout sinks: partitioned and bucketed parquet.

The reference's five Cassandra tables ARE storage layouts — partition
key + clustering order chosen per read pattern (README.md:216-289,
"query-first modeling" README.md:135-141).  The Spark-native analogs:

- ``write_partitioned``: hive-style directory partitioning on the
  filter column(s) a read pattern uses, so those predicates become
  *partition pruning* (directories never listed) instead of row
  filters — the equivalent of Cassandra's partition-key point read.
  ``sortWithinPartitions`` reproduces clustering order inside each
  file (README.md:270, 282 ``CLUSTERING ORDER BY ... DESC``): rowgroup
  min/max stats then let parquet skip pages for top-N-by-time reads.

- ``write_bucketed_table``: hash-bucketing both sides of a recurring
  big x big join key.  Bucketed scans co-locate matching keys, so the
  sort-merge join needs NO shuffle exchange — at 100 TB the dominant
  cost of a fact-fact join.  This is the Spark analog of the
  reference's denormalization (pre-join at write time,
  cassandra_subscriber.py:133-160): pay once at write, every read is
  cheap.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    sort_cols: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Write hive-partitioned parquet; one shuffle to co-locate each
    partition's rows (avoids the many-small-files explosion of
    writing P partitions from every input task), optional clustering
    order within files."""
    out = df.repartition(*[df[c] for c in partition_cols])
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write an external bucketed table (metastore-registered; bucket
    layout only exists through the catalog).  Join two tables bucketed
    on the same key with the same bucket count -> shuffle-free
    sort-merge join."""
    writer = df.write.mode(mode).option("path", path).bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)
