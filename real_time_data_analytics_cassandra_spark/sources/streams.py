"""Stream sources.

The reference consumes a durable RabbitMQ fanout queue
(cassandra_subscriber.py:237-287; SURVEY.md S1).  The engine's stream
abstraction is a Structured Streaming DataFrame; in production that
is a Kafka/file source — here, a deterministic bounded replay of the
``events`` parquet table (the driver's stand-in for the message bus,
FIXTURES.md §3) processed with an ``availableNow`` trigger, which
yields exactly the batch result and lets tests assert
stream/batch equivalence (SURVEY.md §5.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def bounded_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet with its batch-inferred
    schema (streaming sources require an explicit schema)."""
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).parquet(path)
