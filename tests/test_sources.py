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


def test_amqp_dump_datasource_roundtrip(spark, tmp_path):
    """The custom Python Data Source reads a multi-file JSON-lines
    message dump with one input partition per file and the envelope
    parsed to the declared schema."""
    import json

    from pyspark.sql import functions as F

    from real_time_data_analytics_cassandra_spark.sources.amqp_dump import register

    register(spark)
    want = []
    for fidx in range(3):
        with open(tmp_path / f"dump_{fidx}.jsonl", "w") as fh:
            for i in range(10):
                msg = {
                    "message_id": f"m{fidx}-{i}",
                    "ts_epoch": 1_700_000_000 + fidx * 100 + i,
                    "body": {"type": "customer" if i % 2 else "product", "k": i},
                }
                fh.write(json.dumps(msg) + "\n")
                want.append(
                    (
                        msg["message_id"],
                        msg["ts_epoch"],
                        json.dumps(msg["body"], sort_keys=True),
                    )
                )

    df = spark.read.format("amqp_dump").option("path", str(tmp_path)).load()
    assert df.rdd.getNumPartitions() == 3
    got = sorted(map(tuple, df.collect()))
    assert got == sorted(want)
    # the envelope feeds the normal JSON decode path (S2)
    typed = df.select(
        F.get_json_object("body", "$.type").alias("type")
    ).groupBy("type").count()
    assert {r["type"] for r in typed.collect()} == {"customer", "product"}


def test_quarantine_split_keeps_raw_bytes(spark):
    """Malformed payloads must land in quarantine with their ORIGINAL
    bytes (for offline inspection/replay) while valid rows decode
    losslessly — never all-NULL ghost rows, never a job failure."""
    from real_time_data_analytics_cassandra_spark.sources.streams import (
        parse_event_json_quarantine,
    )

    good = (
        '{"event_id":1,"ts":"2024-01-02T03:04:05.000006Z","user_id":7,'
        '"event_type":"signup","value":1.5,"props":"{}"}'
    )
    bad = '{"event_id":2,"ts":'
    raw = spark.createDataFrame([(good,), (bad,)], "raw_json string")
    valid, quar = parse_event_json_quarantine(raw)
    vrows = valid.collect()
    assert len(vrows) == 1
    assert vrows[0]["event_id"] == 1 and vrows[0]["event_type"] == "signup"
    assert vrows[0]["ts"].microsecond == 6  # lossless micros
    qrows = quar.collect()
    assert [r["raw_json"] for r in qrows] == [bad]  # original bytes


def test_evolved_read_refuses_narrowing(spark, tmp_path):
    """A generation stored WIDER than the declared column must refuse
    at plan time (silent narrowing is corruption), while widening and
    missing columns read cleanly."""
    import pytest
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from real_time_data_analytics_cassandra_spark.sources.evolution import (
        evolved_read,
    )

    d = str(tmp_path / "gens")
    spark.createDataFrame([(1, "a")], "id int, text string").write.mode(
        "overwrite"
    ).parquet(d)
    spark.createDataFrame(
        [(2, "b", "fr")], "id long, text string, lang string"
    ).write.mode("append").parquet(d)

    target = StructType(
        [
            StructField("id", LongType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
        ]
    )
    rows = {r["id"]: r for r in evolved_read(spark, d, target).collect()}
    assert rows[1]["lang"] is None and rows[2]["lang"] == "fr"

    narrow = StructType([StructField("id", IntegerType())])
    with pytest.raises(ValueError, match="does not losslessly widen"):
        evolved_read(spark, d, narrow)


def test_sharded_stream_produces_batches(spark):
    """The sharded replay staging must actually deliver MULTIPLE
    micro-batches (n_shards files, maxFilesPerTrigger=1) — the
    property every per-batch fold test (streaming observe metrics,
    index appends, merge sinks) relies on to be non-vacuous."""
    from real_time_data_analytics_cassandra_spark.sources.streams import (
        sharded_table_stream,
    )

    stream = sharded_table_stream(
        spark, SF_SMOKE, "events", n_shards=4, time_cols=("ts",)
    )
    ckpt = tempfile.mkdtemp(prefix="rtdac_ckpt_shard_gate_")
    q = (
        stream.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    fed = [p for p in q.recentProgress if p["numInputRows"] > 0]
    assert len(fed) == 4, [p["numInputRows"] for p in q.recentProgress]
    total = sum(p["numInputRows"] for p in fed)
    n_events = table(spark, SF_SMOKE, "events").count()
    assert total == n_events
