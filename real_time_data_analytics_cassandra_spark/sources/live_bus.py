"""Live AMQP bus consumer with the reference's resilience semantics.

The reference's subscriber (cassandra_subscriber.py:236-329) is a
pika BlockingConnection consume loop with:

- heartbeat 600 s / blocked_connection_timeout 300 s on the
  connection (cassandra_subscriber.py:246-251);
- a durable fanout exchange, a durable named queue bound to it, and
  ``prefetch_count=1`` QoS (cassandra_subscriber.py:254-281);
- manual ack AFTER the downstream write; nack+requeue on processing
  failure (at-least-once, cassandra_subscriber.py:225-231);
- an outer reconnect loop: broker/channel errors retry after a fixed
  5 s delay, unexpected errors close and retry after the same delay,
  KeyboardInterrupt closes cleanly and exits
  (cassandra_subscriber.py:238-244, 289-329).

This module reproduces those semantics Spark-side-out: the consumer
is a thin Python client whose only job is to land each message in a
durable JSON-lines shard (the dump format of sources/amqp_dump.py) —
Spark then reads the shards as a table or tails them as a file
stream.  That split is the idiomatic Spark integration: the cluster
never holds bus connections; one (or a few, one per queue) small
consumer processes feed an append-only archive that every executor
can scan in parallel, and redelivered messages (the at-least-once
window between write and ack) are dropped downstream by
``streaming.pipelines.dedup_events`` keyed on message_id.

pika is OPTIONAL (absent in this environment): construction of the
default connection factory is import-gated exactly like the Flask
facade in api.py, and every piece of the resilience logic accepts an
injected factory so tests drive it with a fake channel.  When the
client library is missing, ``replay_or_live`` falls back to the
recorded-dump DataSource.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable
from dataclasses import dataclass

try:  # import-gated optional dependency, like Flask in api.py
    import pika  # type: ignore
except ImportError:  # pragma: no cover - absent in this environment
    pika = None


class ConnectionLost(Exception):
    """Raised by a connection/channel when the broker link drops —
    the library-neutral stand-in for pika's
    ConnectionClosedByBroker/AMQPChannelError family."""


def _reconnect_errors() -> tuple[type[BaseException], ...]:
    """Error classes that mean "broker link dropped, retry":
    always our neutral ConnectionLost; plus pika's when present
    (the classes the reference's loop catches,
    cassandra_subscriber.py:289)."""
    errs: tuple[type[BaseException], ...] = (ConnectionLost,)
    if pika is not None:  # pragma: no cover
        errs += (
            pika.exceptions.ConnectionClosedByBroker,
            pika.exceptions.AMQPChannelError,
        )
    return errs


@dataclass
class BusConfig:
    """Connection/topology parameters, defaults = the reference's
    (cassandra_subscriber.py:238-281)."""

    host: str = "localhost"
    exchange: str = "events_fanout_durable"
    queue: str = "spark_ingest_queue_durable"
    heartbeat: int = 600
    blocked_connection_timeout: int = 300
    prefetch_count: int = 1
    retry_delay: float = 5.0


def _pika_connection_factory(config: BusConfig):  # pragma: no cover
    """Default factory: a real pika BlockingConnection with the
    reference's keepalive parameters.  Only reachable when pika is
    installed."""
    if pika is None:
        raise ImportError(
            "pika is not installed: LiveBusConsumer needs a connection "
            "factory (pass one explicitly, or use the recorded-dump "
            "replay path via sources/amqp_dump.py)"
        )
    return pika.BlockingConnection(
        pika.ConnectionParameters(
            host=config.host,
            heartbeat=config.heartbeat,
            blocked_connection_timeout=config.blocked_connection_timeout,
        )
    )


class LiveBusConsumer:
    """Resilient consume loop: connect → declare topology → consume;
    on link loss, back off ``retry_delay`` seconds and reconnect; on
    KeyboardInterrupt, close cleanly and stop.

    ``on_message(message: dict) -> None`` is the durable write; a
    raise inside it nacks the delivery with requeue (at-least-once,
    same as the reference's ack-after-Cassandra-write).

    ``max_messages`` bounds the DELIVERIES handled (ack + nack), not
    the connection attempts: once the budget is met the channel stops
    consuming and ``run`` returns — the stop condition an inline
    bounded drain needs, since against a healthy broker
    ``start_consuming()`` otherwise blocks until the link drops.
    None (default) consumes forever, the sidecar/production posture.
    """

    def __init__(
        self,
        on_message: Callable[[dict], None],
        config: BusConfig | None = None,
        connection_factory: Callable[[BusConfig], object] | None = None,
        sleep: Callable[[float], None] = time.sleep,
        max_messages: int | None = None,
    ) -> None:
        self.on_message = on_message
        self.config = config or BusConfig()
        self._connect = connection_factory or _pika_connection_factory
        self._sleep = sleep
        self.max_messages = max_messages
        # observability counters (and the hooks the tests assert on)
        self.connects = 0
        self.reconnects = 0
        self.processed = 0
        self.nacked = 0

    def _budget_met(self) -> bool:
        return (
            self.max_messages is not None
            and self.processed + self.nacked >= self.max_messages
        )

    # -- per-delivery callback (reference callback(), lines 95-231) --
    def _handle(self, channel, method, properties, body) -> None:
        try:
            message = json.loads(body if isinstance(body, str) else body.decode())
            self.on_message(message)
            channel.basic_ack(delivery_tag=method.delivery_tag)
            self.processed += 1
        except Exception:
            # processing failed: requeue for redelivery — downstream
            # dedup (dedup_events on message_id) absorbs the replays
            channel.basic_nack(delivery_tag=method.delivery_tag, requeue=True)
            self.nacked += 1
        if self._budget_met():
            try:
                channel.stop_consuming()
            except Exception:
                pass

    def _consume_once(self) -> None:
        connection = self._connect(self.config)
        self.connects += 1
        channel = connection.channel()
        try:
            channel.exchange_declare(
                exchange=self.config.exchange,
                exchange_type="fanout",
                durable=True,
            )
            channel.queue_declare(queue=self.config.queue, durable=True)
            channel.queue_bind(
                exchange=self.config.exchange, queue=self.config.queue
            )
            channel.basic_qos(prefetch_count=self.config.prefetch_count)
            channel.basic_consume(
                queue=self.config.queue,
                on_message_callback=self._handle,
                auto_ack=False,
            )
            channel.start_consuming()
        finally:
            for closer in (channel, connection):
                try:
                    closer.close()
                except Exception:
                    pass

    def run(self, max_attempts: int | None = None) -> None:
        """The reference's ``start_subscriber`` loop
        (cassandra_subscriber.py:238-329).  ``max_attempts`` bounds
        the number of connection attempts (None = run forever, the
        production posture)."""
        attempts = 0
        while (
            max_attempts is None or attempts < max_attempts
        ) and not self._budget_met():
            attempts += 1
            try:
                self._consume_once()
                # start_consuming returned without raising: the only
                # non-exception exit is a deliberate stop_consuming
                # (message budget met) — done, not a link loss
                return
            except KeyboardInterrupt:
                return
            except _reconnect_errors():
                self.reconnects += 1
                self._sleep(self.config.retry_delay)
            except Exception:
                # unexpected error: same close-sleep-retry posture
                self.reconnects += 1
                self._sleep(self.config.retry_delay)


class DumpShardWriter:
    """The durable write target: appends messages as JSON lines in
    the envelope schema of sources/amqp_dump.py, rotating to a new
    shard every ``rotate_every`` messages so the archive stays
    partition-parallel for Spark (one input partition per shard).

    Flush-per-message keeps the at-least-once contract honest: a
    message is only acked after its bytes reached the OS."""

    def __init__(self, dump_dir: str, rotate_every: int = 10000) -> None:
        self.dump_dir = dump_dir
        self.rotate_every = rotate_every
        self._count = 0
        self._fh = None
        os.makedirs(dump_dir, exist_ok=True)

    def _shard_path(self) -> str:
        return os.path.join(
            self.dump_dir, f"shard-{self._count // self.rotate_every:06d}.jsonl"
        )

    def __call__(self, message: dict) -> None:
        if self._fh is None or self._count % self.rotate_every == 0:
            if self._fh is not None:
                self._fh.close()
            self._fh = open(self._shard_path(), "a", encoding="utf-8")
        self._fh.write(
            json.dumps(
                {
                    "message_id": message["message_id"],
                    "ts_epoch": int(message["ts_epoch"]),
                    "body": message.get("body", {}),
                },
                sort_keys=True,
            )
            + "\n"
        )
        self._fh.flush()
        self._count += 1

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None


def replay_or_live(
    spark,
    dump_dir: str,
    config: BusConfig | None = None,
    connection_factory: Callable[[BusConfig], object] | None = None,
    max_attempts: int | None = 1,
    max_messages: int | None = 10_000,
):
    """The deployment seam, deciding BOTH ways (tests drive each with
    a fake connection factory):

    - LIVE: when a connection factory is INJECTED, a
      ``LiveBusConsumer(DumpShardWriter(dump_dir))`` drains up to
      ``max_messages`` deliveries into the archive first
      (ack-after-write, ``max_attempts`` connection attempts), then
      the archive is scanned.  The drain is BOUNDED by default:
      against a healthy broker an unbounded ``start_consuming()``
      blocks until the link drops, so a function that must return a
      DataFrame never runs one — continuous consumption belongs to a
      sidecar ``LiveBusConsumer(...).run()`` process (the reference's
      subscriber daemon), not inside a query.  For that reason pika
      being importable does NOT auto-select live mode here; only an
      explicit factory does.
    - REPLAY: without a factory (this environment), the recorded dump
      is read directly.

    Either way the Spark-side plan is identical — a scan of the
    envelope table; the live branch only *extends* the archive before
    the scan."""
    from real_time_data_analytics_cassandra_spark.sources.amqp_dump import register

    if connection_factory is not None:
        writer = DumpShardWriter(dump_dir)
        consumer = LiveBusConsumer(
            writer,
            config=config,
            connection_factory=connection_factory,
            max_messages=max_messages,
        )
        try:
            consumer.run(max_attempts=max_attempts)
        finally:
            writer.close()

    register(spark)
    return spark.read.format("amqp_dump").option("path", dump_dir).load()
