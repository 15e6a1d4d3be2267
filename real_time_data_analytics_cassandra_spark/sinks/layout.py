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


def compact_partitions(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_col: str | None = None,
) -> dict:
    """Small-file compaction: rewrite a parquet location so every
    output file approaches ``target_file_bytes`` — the maintenance
    pass every streaming/incremental sink needs (micro-batch appends
    and MERGE write-backs accrete small files; at 100 TB the file
    count, not the byte count, is what kills scan planning and
    shuffle-map overhead).

    File count is sized from the location's actual bytes
    (filesystem metadata only — no data read), then rows are
    round-robin repartitioned into exactly that many files
    (per-partition-directory when ``partition_col`` is given, so
    hive pruning survives).  Returns {files_before, files_after,
    bytes} from the filesystem, letting callers assert the
    compaction actually happened.  The rewrite stages into the same
    directory via overwrite — on object storage use a
    format with atomic commit (the operation is a pure rewrite, so
    any snapshot/commit protocol slots in unchanged).
    """
    import glob
    import os

    def _stats():
        files = [
            f
            for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
            if os.path.isfile(f)
        ]
        return len(files), sum(os.path.getsize(f) for f in files)

    files_before, total_bytes = _stats()
    df = spark.read.parquet(path)
    n_files = max(1, -(-total_bytes // target_file_bytes))  # ceil
    if partition_col is not None:
        out = df.repartition(n_files, partition_col)
        (
            out.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(path + "__compact")
        )
    else:
        out = df.repartition(n_files)
        out.write.mode("overwrite").parquet(path + "__compact")
    # atomic-ish local swap; object stores swap via their commit protocol
    import shutil

    shutil.rmtree(path)
    os.rename(path + "__compact", path)
    files_after, _ = _stats()
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": total_bytes,
    }
