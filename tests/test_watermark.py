"""ST3 late-data semantics, made executable: the batch view accepts
late events forever (like the reference's counters, which derive the
bucket from event time with no cutoff — cassandra_subscriber.py:170,
211); the WATERMARKED streaming view drops events that arrive after
the watermark has passed their bucket.  This is the one documented
semantic deviation (SURVEY.md ST3) — this test pins it down.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

import pytest

from real_time_data_analytics_cassandra_spark.streaming.pipelines import (
    hourly_type_counts,
)


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, ["event_id", "t", "user_id", "event_type"]).select(
        "event_id", F.timestamp_seconds("t").alias("ts"), "user_id", "event_type"
    )
    df.coalesce(1).write.mode("append").parquet(path)
    return df


@pytest.mark.slow
def test_watermark_drops_late_event_batch_keeps_it(spark):
    hour = 3600
    on_time = [(1, 10 * hour, 1, "signup"), (2, 10 * hour + 30, 2, "signup")]
    # arrives in a later micro-batch, 5 hours older than the max seen
    # event time -> beyond the 1-hour watermark
    late = [(3, 5 * hour, 3, "signup")]

    with tempfile.TemporaryDirectory() as src, tempfile.TemporaryDirectory() as ckpt, tempfile.TemporaryDirectory() as out:
        schema = None

        def run_stream():
            # parquet sink: append-only (finalized windows), and —
            # unlike the memory sink — recoverable from the checkpoint
            stream = spark.readStream.schema(schema).option(
                "maxFilesPerTrigger", "1"
            ).parquet(src)
            counts = hourly_type_counts(stream, watermark="1 hour")
            q = (
                counts.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        # first pass: establishes watermark state at max(ts) - 1h
        _write_batch(spark, src, on_time)
        schema = spark.read.parquet(src).schema
        run_stream()

        # late file lands; the resumed query's watermark is already
        # past the late event's window
        _write_batch(spark, src, late)
        run_stream()

        streamed = {
            (r.hour_bucket, r.cnt) for r in spark.read.parquet(out).collect()
        }

        batch_df = spark.read.parquet(src)
        batch = {
            (r.hour_bucket, r.cnt)
            for r in hourly_type_counts(batch_df, watermark=None).collect()
        }

        # batch sees the late event's 05-hour bucket; the watermarked
        # stream finalized past it and never emitted it
        late_bucket = "1970010105"
        assert any(hb == late_bucket for hb, _ in batch)
        assert not any(hb == late_bucket for hb, _ in streamed), streamed
