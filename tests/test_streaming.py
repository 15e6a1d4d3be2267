"""Streaming semantics: batch-equivalence (SURVEY.md §5.2) — the
streaming pipelines over a bounded replay with availableNow must
produce exactly the batch result — plus the foreachBatch multicast
fan-out (ST7).
"""

from __future__ import annotations

import tempfile

from real_time_data_analytics_cassandra_spark.catalog import table
from real_time_data_analytics_cassandra_spark.sources.streams import bounded_event_stream
from real_time_data_analytics_cassandra_spark.streaming.pipelines import (
    hourly_type_counts,
    multicast_foreach_batch,
    run_available_now,
)
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_batch_equivalence_hourly_counts(spark):
    stream = bounded_event_stream(spark, SF_SMOKE)
    with tempfile.TemporaryDirectory() as ckpt:
        streamed = run_available_now(
            hourly_type_counts(stream), "hourly_counts_stream_test", ckpt
        )
        batch = hourly_type_counts(table(spark, SF_SMOKE, "events"))
        assert _rows(streamed) == _rows(batch)


def test_multicast_foreach_batch_writes_all_views(spark):
    stream = bounded_event_stream(spark, SF_SMOKE)
    with tempfile.TemporaryDirectory() as out, tempfile.TemporaryDirectory() as ckpt:
        query = multicast_foreach_batch(stream, out, ckpt)
        query.awaitTermination()

        event_log = spark.read.parquet(f"{out}/event_log")
        assert event_log.count() == table(spark, SF_SMOKE, "events").count()

        latest = spark.read.parquet(f"{out}/latest_delta")
        # per-batch deltas: at most one row per user per micro-batch
        users = table(spark, SF_SMOKE, "events").select("user_id").distinct().count()
        assert latest.count() >= users

        buckets = spark.read.parquet(f"{out}/bucket_count_delta")
        assert buckets.filter(buckets.time_bucket.startswith("daily:")).count() > 0
