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
from pyspark.sql import functions as F


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


def zorder_key(
    df: DataFrame, cols: Sequence[str], bits: int = 16
) -> tuple[DataFrame, str]:
    """Append a Morton (Z-order) key column interleaving the bit
    patterns of ``cols`` — the multi-dimensional clustering key behind
    Delta/Iceberg's OPTIMIZE ZORDER, built from plain JVM expressions.

    Each column is first min-max normalized to a ``bits``-bit integer
    rank (the (min, max) pair is ONE broadcast aggregate row — no
    window, no sort), then the ranks' bits interleave:
    bit i of column j lands at position i * n_cols + j.  Sorting by
    the interleaved key clusters rows that are close in EVERY
    dimension, so per-file min/max spans shrink on all of them at
    once and parquet row-group/file skipping works for predicates on
    any single column — where a plain sort clusters only its leading
    column.  Everything is codegen'd integer arithmetic; NULLs rank
    as 0 (cluster together at the low end).

    Returns (df_with_key, key_column_name).
    """
    stats = df.agg(
        *[
            f
            for c in cols
            for f in (
                F.min(F.col(c).cast("double")).alias(f"__min_{c}"),
                F.max(F.col(c).cast("double")).alias(f"__max_{c}"),
            )
        ]
    )
    out = df.crossJoin(F.broadcast(stats))
    max_rank = (1 << bits) - 1
    rank_cols = []
    for c in cols:
        span = F.col(f"__max_{c}") - F.col(f"__min_{c}")
        norm = F.when(span > 0,
                      (F.col(c).cast("double") - F.col(f"__min_{c}")) / span
                      ).otherwise(F.lit(0.0))
        rank_cols.append(
            F.coalesce(
                F.floor(norm * max_rank).cast("long"), F.lit(0)
            ).alias(f"__rank_{c}")
        )
    out = out.select(*df.columns, *rank_cols)
    n = len(cols)
    terms = []
    for i in range(bits):
        for j, c in enumerate(cols):
            terms.append(
                f"shiftleft(shiftright(__rank_{c}, {i}) & 1, {i * n + j})"
            )
    key = "__zorder"
    out = out.withColumn(key, F.expr(" + ".join(terms)).cast("long"))
    return out.drop(*[f"__rank_{c}" for c in cols]), key


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: Sequence[str],
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on a Z-order key over ``zorder_cols``:
    range-partition by the key (co-locates key ranges per file), sort
    within partitions (orders row groups inside each file), drop the
    key.  Readers filtering on ANY of the z-ordered columns skip
    files/row-groups via parquet min/max stats — the layout analog of
    a composite clustering index for multi-predicate scan patterns
    (tests assert per-file spans shrink on every dimension
    simultaneously)."""
    keyed, key = zorder_key(df, zorder_cols)
    (
        keyed.repartitionByRange(n_files, F.col(key))
        .sortWithinPartitions(key)
        .drop(key)
        .write.mode(mode)
        .parquet(path)
    )


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

    File counts are sized from the location's actual bytes
    (filesystem metadata only — no data read).  Without
    ``partition_col``, rows are repartitioned into
    ceil(total_bytes / target) files.  With it, each hive partition
    DIRECTORY is sized independently from its own bytes, and rows are
    hashed on (partition value, salt) with the salt bounded by that
    directory's file count — so a large partition still splits into
    ~target-sized files instead of collapsing to one file per
    distinct partition value, and hive pruning survives.  Returns
    {files_before, files_after, bytes} from the filesystem, letting
    callers assert the compaction actually happened.

    Swap protocol (crash-safe on a rename-atomic filesystem): write
    to ``path__compact``, rename the live dir aside to ``path__old``,
    rename the compacted dir in, then delete the old dir.  A crash
    between the two renames leaves the original intact at
    ``path__old`` (recoverable by hand); the unrecoverable window of
    the previous delete-then-rename protocol is gone.  On object
    storage use a table format with an atomic commit protocol — the
    operation is a pure rewrite, so any snapshot mechanism slots in
    unchanged.
    """
    import glob
    import os
    import shutil

    def _stats(root=None):
        files = [
            f
            for f in glob.glob(
                os.path.join(root or path, "**", "*.parquet"), recursive=True
            )
            if os.path.isfile(f)
        ]
        return len(files), sum(os.path.getsize(f) for f in files)

    def _ceil_files(nbytes: int) -> int:
        return max(1, -(-nbytes // target_file_bytes))

    files_before, total_bytes = _stats()
    df = spark.read.parquet(path)
    compact = path + "__compact"
    if partition_col is not None:
        # per-directory file counts from per-directory bytes; the
        # literal map is bounded by the table's partition count (the
        # same bound hive pruning itself relies on)
        per_dir = []
        for d in glob.glob(os.path.join(path, f"{partition_col}=*")):
            if not os.path.isdir(d):
                continue
            val = os.path.basename(d).split("=", 1)[1]
            per_dir.append((val, _ceil_files(_stats(d)[1])))
        n_total = max(1, sum(n for _, n in per_dir))
        fmap = F.create_map(
            *[x for val, n in per_dir for x in (F.lit(val), F.lit(n))]
        )
        salted = df.withColumn(
            "__nf",
            F.coalesce(fmap[F.col(partition_col).cast("string")], F.lit(1)),
        ).withColumn(
            "__salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.col("__nf")),
        )
        out = salted.repartition(n_total, partition_col, "__salt").drop(
            "__nf", "__salt"
        )
        out.write.mode("overwrite").partitionBy(partition_col).parquet(compact)
    else:
        out = df.repartition(_ceil_files(total_bytes))
        out.write.mode("overwrite").parquet(compact)
    # rename-aside swap: the live data is never in a deleted-only state
    old = path + "__old"
    shutil.rmtree(old, ignore_errors=True)  # leftover of a prior crash
    os.rename(path, old)
    os.rename(compact, path)
    shutil.rmtree(old)
    files_after, _ = _stats()
    return {
        "files_before": files_before,
        "files_after": files_after,
        "bytes": total_bytes,
    }
