"""Live bus consumer resilience semantics (SURVEY.md S1 seam).

The reference subscriber's reconnect loop / heartbeat / nack-requeue
behavior (cassandra_subscriber.py:225-329) is reproduced by
sources/live_bus.py with an injected connection factory, so these
tests drive broker-link failures, redeliveries, and clean shutdown
with a fake channel — no pika, no broker.
"""

from __future__ import annotations

import json

from real_time_data_analytics_cassandra_spark.sources.live_bus import (
    BusConfig,
    ConnectionLost,
    DumpShardWriter,
    LiveBusConsumer,
    replay_or_live,
)


class _Method:
    def __init__(self, tag):
        self.delivery_tag = tag


class FakeChannel:
    """Scripted channel: on start_consuming, deliver the scripted
    messages then raise the scripted exit."""

    def __init__(self, deliveries, exit_exc):
        self.deliveries = deliveries
        self.exit_exc = exit_exc
        self.acked: list[int] = []
        self.nacked: list[tuple[int, bool]] = []
        self.declared = {}
        self.qos = None
        self._callback = None

    def exchange_declare(self, exchange, exchange_type, durable):
        self.declared["exchange"] = (exchange, exchange_type, durable)

    def queue_declare(self, queue, durable):
        self.declared["queue"] = (queue, durable)

    def queue_bind(self, exchange, queue):
        self.declared["bind"] = (exchange, queue)

    def basic_qos(self, prefetch_count):
        self.qos = prefetch_count

    def basic_consume(self, queue, on_message_callback, auto_ack):
        assert auto_ack is False, "manual ack is the contract"
        self._callback = on_message_callback

    def basic_ack(self, delivery_tag):
        self.acked.append(delivery_tag)

    def basic_nack(self, delivery_tag, requeue):
        self.nacked.append((delivery_tag, requeue))

    def stop_consuming(self):
        self._stopped = True

    def start_consuming(self):
        self._stopped = False
        for tag, body in enumerate(self.deliveries):
            if self._stopped:
                return
            self._callback(self, _Method(tag), None, body)
        if not self._stopped:
            raise self.exit_exc

    def close(self):
        pass


class FakeConnection:
    def __init__(self, channel):
        self._channel = channel
        self.closed = False

    def channel(self):
        return self._channel

    def close(self):
        self.closed = True


def _msg(i, body=None):
    return json.dumps(
        {"message_id": f"msg-{i}", "ts_epoch": 1700000000 + i, "body": body or {"type": "signup"}}
    )


def test_reconnect_backoff_then_clean_shutdown():
    """Two broker drops -> two fixed-delay sleeps and reconnects;
    KeyboardInterrupt -> clean exit.  Messages from every session are
    processed and acked."""
    channels = [
        FakeChannel([_msg(0)], ConnectionLost("drop 1")),
        FakeChannel([], ConnectionLost("drop 2")),
        FakeChannel([_msg(1), _msg(2)], KeyboardInterrupt()),
    ]
    connections = [FakeConnection(ch) for ch in channels]
    it = iter(connections)
    sleeps: list[float] = []
    got: list[dict] = []

    consumer = LiveBusConsumer(
        got.append,
        config=BusConfig(retry_delay=5.0),
        connection_factory=lambda cfg: next(it),
        sleep=sleeps.append,
    )
    consumer.run()

    assert sleeps == [5.0, 5.0], "fixed retry delay per drop"
    assert consumer.connects == 3 and consumer.reconnects == 2
    assert [m["message_id"] for m in got] == ["msg-0", "msg-1", "msg-2"]
    assert channels[0].acked == [0] and channels[2].acked == [0, 1]
    assert all(c.closed for c in connections), "connections closed on exit"
    # topology declared per (re)connect, reference shape
    ex, typ, durable = channels[2].declared["exchange"]
    assert typ == "fanout" and durable is True
    assert channels[2].declared["queue"][1] is True
    assert channels[2].qos == 1


def test_processing_failure_nacks_with_requeue():
    """A raising on_message nacks (requeue=True) and keeps consuming —
    the at-least-once window downstream dedup absorbs."""
    ch = FakeChannel([_msg(0), _msg(1), _msg(2)], KeyboardInterrupt())

    def flaky(message):
        if message["message_id"] == "msg-1":
            raise RuntimeError("downstream write failed")

    consumer = LiveBusConsumer(
        flaky,
        connection_factory=lambda cfg: FakeConnection(ch),
        sleep=lambda s: None,
    )
    consumer.run()
    assert ch.acked == [0, 2]
    assert ch.nacked == [(1, True)]
    assert consumer.processed == 2 and consumer.nacked == 1


def test_unexpected_error_also_retries():
    """A non-link error (reference's generic except) closes, sleeps,
    and retries rather than crashing the consumer."""
    channels = [
        FakeChannel([], RuntimeError("boom")),
        FakeChannel([_msg(0)], KeyboardInterrupt()),
    ]
    it = iter(channels)
    sleeps: list[float] = []
    consumer = LiveBusConsumer(
        lambda m: None,
        connection_factory=lambda cfg: FakeConnection(next(it)),
        sleep=sleeps.append,
    )
    consumer.run()
    assert sleeps == [5.0]
    assert consumer.connects == 2


def test_max_attempts_bounds_the_loop():
    consumer = LiveBusConsumer(
        lambda m: None,
        connection_factory=lambda cfg: FakeConnection(
            FakeChannel([], ConnectionLost("always down"))
        ),
        sleep=lambda s: None,
    )
    consumer.run(max_attempts=3)
    assert consumer.connects == 3 and consumer.reconnects == 3


def test_dump_writer_feeds_spark_replay(spark, tmp_path):
    """End-to-end seam: consumer lands messages in rotating shards ->
    replay_or_live reads them back as the envelope table with one
    input partition per shard."""
    dump = str(tmp_path / "dump")
    writer = DumpShardWriter(dump, rotate_every=2)
    ch = FakeChannel([_msg(i, {"type": "t", "user_id": i}) for i in range(5)],
                     KeyboardInterrupt())
    LiveBusConsumer(
        writer, connection_factory=lambda cfg: FakeConnection(ch),
        sleep=lambda s: None,
    ).run()
    writer.close()

    df = replay_or_live(spark, dump)
    assert df.rdd.getNumPartitions() == 3  # ceil(5/2) shards
    rows = {r.message_id: r.ts_epoch for r in df.collect()}
    assert rows == {f"msg-{i}": 1700000000 + i for i in range(5)}


def test_replay_or_live_decides_both_ways(spark, tmp_path):
    """The deployment seam's DECISION logic, both branches: with a
    connection factory (the live deployment, faked here) the bus is
    drained into the archive ack-after-write BEFORE the scan; without
    one (this environment), the recorded dump is read as-is and no
    consumer ever runs."""
    dump = str(tmp_path / "dump")

    # live branch: the factory's fake bus holds 3 messages; the scan
    # must see them because replay_or_live consumed them first
    ch = FakeChannel(
        [_msg(i, {"type": "t", "user_id": i}) for i in range(3)],
        KeyboardInterrupt(),
    )
    df_live = replay_or_live(
        spark, dump, connection_factory=lambda cfg: FakeConnection(ch)
    )
    assert ch.acked == [0, 1, 2], "ack AFTER the durable write"
    assert {r.message_id for r in df_live.collect()} == {
        "msg-0",
        "msg-1",
        "msg-2",
    }

    # replay branch: no factory (and no pika here) -> the exact same
    # archive is served with no consumption attempt; a poisoned
    # factory proves it is never called
    df_replay = replay_or_live(spark, dump)
    assert {r.message_id for r in df_replay.collect()} == {
        "msg-0",
        "msg-1",
        "msg-2",
    }
    assert df_live.schema == df_replay.schema


def test_message_budget_stops_a_healthy_broker_drain():
    """Against a HEALTHY broker start_consuming() never returns, so an
    inline drain must stop itself: with max_messages=N the consumer
    handles exactly N deliveries, stops the channel, and run() returns
    instead of blocking or burning reconnect attempts."""
    seen = []
    ch = FakeChannel(
        [_msg(i) for i in range(100)],  # "endless" healthy stream
        AssertionError("budget must stop consumption before exit_exc"),
    )
    consumer = LiveBusConsumer(
        seen.append,
        connection_factory=lambda cfg: FakeConnection(ch),
        max_messages=5,
    )
    consumer.run(max_attempts=None)  # production posture, still returns
    assert consumer.processed == 5
    assert [m["message_id"] for m in seen] == [f"msg-{i}" for i in range(5)]
    assert ch.acked == [0, 1, 2, 3, 4]

    # a replay with the budget already met must not reconnect at all
    consumer.run(max_attempts=None)
    assert consumer.connects == 1


def test_replay_or_live_never_autoselects_live_without_factory(
    spark, tmp_path, monkeypatch
):
    """pika being importable must NOT flip the seam to live mode: an
    inline query cannot run an unbounded consumer (sidecar contract).
    Simulate 'pika installed' and assert no connection is attempted."""
    import real_time_data_analytics_cassandra_spark.sources.live_bus as lb

    dump = str(tmp_path / "dump")
    DumpShardWriter(dump)(
        {"message_id": "m0", "ts_epoch": 1700000000, "body": {}}
    )

    class _Boom:
        def __getattr__(self, name):  # any pika use would explode
            raise AssertionError("replay path must never touch pika")

    monkeypatch.setattr(lb, "pika", _Boom())
    df = replay_or_live(spark, dump)
    assert [r.message_id for r in df.collect()] == ["m0"]
