"""Storage-layout invariants: partition pruning and shuffle-free
bucketed joins — the write-once/read-cheap half of the 100 TB posture
(the read-side plan checks live in test_plans.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from real_time_data_analytics_cassandra_spark.catalog import table
from real_time_data_analytics_cassandra_spark.plans import explain_str, operator_count
from real_time_data_analytics_cassandra_spark.sinks import (
    write_bucketed_table,
    write_partitioned,
)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events_by_type(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("layout") / "events_by_type")
    events = table(spark, SF_SMOKE, "events")
    write_partitioned(events, path, ["event_type"], sort_cols=["ts"])
    return path


def test_partition_filter_prunes_directories(spark, events_by_type):
    df = spark.read.parquet(events_by_type).filter(F.col("event_type") == "signup")
    plan = explain_str(df)
    assert "PartitionFilters" in plan
    # the predicate must appear as a partition filter, not a data filter
    part_section = plan.split("PartitionFilters")[1].split("]")[0]
    assert "event_type" in part_section, plan


def test_partitioned_roundtrip_preserves_rows(spark, events_by_type):
    orig = table(spark, SF_SMOKE, "events")
    back = spark.read.parquet(events_by_type)
    assert back.count() == orig.count()
    assert back.filter(F.col("event_type") == "signup").count() == orig.filter(
        F.col("event_type") == "signup"
    ).count()


def test_bucketed_join_is_shuffle_free(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    orders = table(spark, SF_SMOKE, "orders")
    lineitem = table(spark, SF_SMOKE, "lineitem")
    write_bucketed_table(
        orders, "orders_b", str(base / "orders_b"), "o_orderkey", 8, "o_orderkey"
    )
    write_bucketed_table(
        lineitem, "lineitem_b", str(base / "lineitem_b"), "l_orderkey", 8, "l_orderkey"
    )
    try:
        # the MERGE hint stands in for big-x-big sizes (at smoke scale
        # the optimizer would rightly broadcast; at 100 TB it cannot)
        joined = (
            spark.table("lineitem_b")
            .hint("merge")
            .join(
                spark.table("orders_b"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # the join itself must not exchange either side; the only
        # shuffle allowed is the final small groupBy
        assert operator_count(joined, "SortMergeJoin") == 1, explain_str(joined)
        assert operator_count(joined, "Exchange") <= 1, explain_str(joined)
        # and it still computes the right thing
        plain = (
            lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_dim_filter_triggers_dynamic_partition_pruning(spark, events_by_type):
    """A selective filter on a joined dim must prune the fact's hive
    partitions at RUNTIME (dynamic partition pruning): the fact scan
    carries a dynamicpruning subquery on the partition column, so at
    100 TB only the dim-selected partitions are ever listed."""
    fact = spark.read.parquet(events_by_type)
    dim = spark.createDataFrame(
        [("signup", 1), ("purchase", 2), ("click", 3)],
        ["event_type", "type_rank"],
    ).filter(F.col("type_rank") == 1)
    joined = fact.join(F.broadcast(dim), "event_type").groupBy("event_type").count()
    plan = explain_str(joined).lower()
    assert "dynamicpruning" in plan, plan


def test_compact_partitions_reduces_files_preserves_data(spark, tmp_path_factory):
    """Small-file compaction: a fragmented partitioned location (64
    input tasks x partitions) compacts to ~1 file per partition dir,
    byte-identical data, hive pruning intact."""
    from real_time_data_analytics_cassandra_spark.sinks.layout import (
        compact_partitions,
    )

    path = str(tmp_path_factory.mktemp("compact") / "events_frag")
    events = table(spark, SF_SMOKE, "events")
    # fragment on purpose: every one of 64 tasks writes into every
    # partition directory (the streaming-append pathology)
    events.repartition(64).write.partitionBy("event_type").parquet(path)

    before = spark.read.parquet(path)
    n_rows = before.count()
    checksum = before.agg(F.sum(F.hash("event_id", "user_id"))).collect()[0][0]
    n_purchase = before.filter(F.col("event_type") == "purchase").count()

    stats = compact_partitions(
        spark, path, target_file_bytes=256 * 1024 * 1024, partition_col="event_type"
    )
    assert stats["files_before"] > 5 * stats["files_after"], stats

    after = spark.read.parquet(path)
    assert after.count() == n_rows
    assert after.agg(F.sum(F.hash("event_id", "user_id"))).collect()[0][0] == checksum
    # hive layout survived -> partition filter still prunes
    assert after.filter(F.col("event_type") == "purchase").count() == n_purchase
    # swap protocol leaves no staging or aside directories behind
    import os

    assert not os.path.exists(path + "__compact")
    assert not os.path.exists(path + "__old")


def test_zorder_layout_clusters_all_dimensions(spark, tmp_path_factory):
    """Z-ordered files must shrink per-file min/max spans on EVERY
    z-ordered dimension simultaneously (that is the point: parquet
    file/row-group skipping then works for predicates on any of
    them), while a time-sorted layout leaves uncorrelated columns at
    ~full span per file."""
    import glob

    import pyarrow.parquet as pq

    from real_time_data_analytics_cassandra_spark.sinks.layout import (
        write_zordered,
    )

    events = table(spark, SF_SMOKE, "events")
    base = str(tmp_path_factory.mktemp("zorder"))
    zpath, spath = base + "/z", base + "/bytime"
    write_zordered(events, zpath, ["user_id", "value"], n_files=8)
    (
        events.repartitionByRange(8, "ts")
        .sortWithinPartitions("ts")
        .write.parquet(spath)
    )

    def mean_file_span(path, col):
        spans = []
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    cc = md.row_group(rg).column(ci)
                    if cc.path_in_schema == col and cc.statistics is not None:
                        mins.append(cc.statistics.min)
                        maxs.append(cc.statistics.max)
            if mins:
                spans.append(float(max(maxs)) - float(min(mins)))
        return sum(spans) / len(spans)

    g = events.agg(
        (F.max("user_id") - F.min("user_id")).cast("double").alias("u"),
        (F.max("value") - F.min("value")).alias("v"),
    ).collect()[0]
    # time-sorted baseline: time-uncorrelated columns stay near-full
    # span per file (mild ts/value drift keeps this above 0.6x global)
    assert mean_file_span(spath, "user_id") > 0.6 * g.u
    assert mean_file_span(spath, "value") > 0.6 * g.v
    # z-order: BOTH dimensions shrink per file, well below the
    # single-column-sort layout (measured ~0.4x at this fixture)
    assert mean_file_span(zpath, "user_id") < 0.6 * mean_file_span(spath, "user_id")
    assert mean_file_span(zpath, "value") < 0.6 * mean_file_span(spath, "value")
    # and the data survives the round trip
    assert spark.read.parquet(zpath).count() == events.count()


def test_compact_partitions_splits_large_partitions(spark, tmp_path_factory):
    """A hive partition bigger than target_file_bytes must compact to
    MULTIPLE ~target-sized files, not collapse to one file per
    partition value (the salt bounds per-directory file counts from
    per-directory bytes)."""
    import glob
    import os

    from real_time_data_analytics_cassandra_spark.sinks.layout import (
        compact_partitions,
    )

    path = str(tmp_path_factory.mktemp("compact") / "events_big")
    events = table(spark, SF_SMOKE, "events")
    events.repartition(16).write.partitionBy("event_type").parquet(path)
    n_rows = spark.read.parquet(path).count()

    # tiny target: every partition dir holds several targets' worth
    compact_partitions(
        spark, path, target_file_bytes=64 * 1024, partition_col="event_type"
    )
    for d in glob.glob(os.path.join(path, "event_type=*")):
        files = glob.glob(os.path.join(d, "*.parquet"))
        nbytes = sum(os.path.getsize(f) for f in files)
        if nbytes > 2 * 64 * 1024:
            assert len(files) > 1, (d, len(files), nbytes)
    assert spark.read.parquet(path).count() == n_rows
