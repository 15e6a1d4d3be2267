"""Custom Python Data Source: replay of an AMQP message dump.

The reference consumes JSON messages from a RabbitMQ fanout exchange
(cassandra_subscriber.py:237-287) with per-message AMQP metadata —
the epoch ``timestamp`` property is the event time
(cassandra_subscriber.py:113) and ``message_id`` the dedup key.  A
recorded dump of that bus (one JSON line per message, the standard
replay/backfill artifact) becomes a first-class Spark table through
the Spark 4 Python Data Source API: schema-on-read of the envelope,
one input partition per dump file (partition-parallel scan), rows
streamed lazily per partition — no driver materialization.

This is the engine's "custom connector" seam: the same DataSource
shape (partitions() enumerating units of parallelism, read() yielding
tuples) is how a real bus snapshot (Kafka segment files, S3 message
archives) would plug in.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

ENVELOPE_SCHEMA = "message_id string, ts_epoch bigint, body string"


class AmqpDumpDataSource(DataSource):
    """``spark.read.format("amqp_dump").option("path", dir)`` over a
    directory of JSON-lines dump files, each line
    ``{"message_id": ..., "ts_epoch": ..., "body": ...}``."""

    @classmethod
    def name(cls) -> str:
        return "amqp_dump"

    def schema(self) -> str:
        return ENVELOPE_SCHEMA

    def reader(self, schema) -> "AmqpDumpReader":
        return AmqpDumpReader(self.options)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class AmqpDumpReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("amqp_dump requires option 'path'")

    def partitions(self):
        # accept hand-rolled .jsonl shards and Spark-written
        # part-*.json files alike; skip markers (_SUCCESS, _complete)
        # and hidden checksum files (.part-*.crc)
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith((".jsonl", ".json"))
            and not f.startswith(("_", "."))
        )
        # one unit of parallelism per dump file — executors read files
        # independently, like parquet splits
        return [_FilePartition(f) for f in files]

    def read(self, partition: _FilePartition):
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                msg = json.loads(line)
                yield (
                    str(msg["message_id"]),
                    int(msg["ts_epoch"]),
                    json.dumps(msg["body"], sort_keys=True),
                )


def register(spark) -> None:
    """Idempotent registration of the data source with a session."""
    spark.dataSource.register(AmqpDumpDataSource)
