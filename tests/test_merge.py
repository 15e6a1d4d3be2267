"""MERGE INTO (keyed upsert) sink invariants.

The incremental materialization of the reference's upsert table
(``customer_latest_info``, reference cassandra_subscriber.py:124-144):
each merge must (a) agree exactly with the batch latest-per-key
recompute over the full history, and (b) rewrite ONLY the partitions
the batch touches — the property that makes it viable against a
100 TB target.
"""

from __future__ import annotations

import os
import tempfile

import pytest

from pyspark.sql import functions as F

from real_time_data_analytics_cassandra_spark.catalog import table
from real_time_data_analytics_cassandra_spark.operators.latest import latest_per_key
from real_time_data_analytics_cassandra_spark.sinks.merge import (
    counter_foreach_batch,
    merge_add,
    merge_upsert,
    merge_upsert_foreach_batch,
)
from tests.conftest import SF_SMOKE

KEYS, TS, PART = ["user_id"], "ts", "part"


def _signups(spark, sf_dir):
    """Keyed event slice with a key-derived (hence batch-stable)
    partition column."""
    return (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select(
            "user_id", "ts", "value", (F.col("user_id") % 8).alias(PART)
        )
    )


def _rows(df):
    return sorted(map(tuple, df.select("user_id", "ts", "value").collect()))


def test_merge_matches_batch_recompute(spark):
    events = _signups(spark, SF_SMOKE).cache()
    # split by time: old half first, new half merged on top
    cut = events.selectExpr(f"timestamp_micros(cast(percentile(unix_micros({TS}), 0.5) as long)) as c").collect()[0][0]
    old, new = events.filter(F.col(TS) <= cut), events.filter(F.col(TS) > cut)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "latest")
        merge_upsert(spark, old, path, KEYS, TS, PART, tiebreak=["value"])
        merge_upsert(spark, new, path, KEYS, TS, PART, tiebreak=["value"])
        got = spark.read.parquet(path)
        want = latest_per_key(events, KEYS, TS, tiebreak=["value"])
        assert _rows(got) == _rows(want)
        # exactly one row per key
        assert got.count() == got.select("user_id").distinct().count()
    events.unpersist()


def test_merge_rewrites_only_touched_partitions(spark):
    events = _signups(spark, SF_SMOKE).cache()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "latest")
        merge_upsert(spark, events, path, KEYS, TS, PART)

        untouched_dir = os.path.join(path, f"{PART}=3")
        before = {
            f: os.path.getmtime(os.path.join(untouched_dir, f))
            for f in os.listdir(untouched_dir)
        }

        batch = events.filter(F.col(PART) == 5).withColumn(
            TS, F.col(TS) + F.expr("INTERVAL 1000 DAYS")
        )
        merge_upsert(spark, batch, path, KEYS, TS, PART)

        after = {
            f: os.path.getmtime(os.path.join(untouched_dir, f))
            for f in os.listdir(untouched_dir)
        }
        assert before == after, "untouched partition was rewritten"
        # and the touched partition did take the newer rows
        got = spark.read.parquet(path).filter(F.col(PART) == 5)
        assert _rows(got) == _rows(latest_per_key(batch, KEYS, TS))
    events.unpersist()


def _counts(df):
    return sorted(map(tuple, df.collect()))


def test_merge_add_matches_batch_recompute(spark):
    events = _signups(spark, SF_SMOKE).cache()
    cut = events.selectExpr(f"timestamp_micros(cast(percentile(unix_micros({TS}), 0.5) as long)) as c").collect()[0][0]
    halves = [events.filter(F.col(TS) <= cut), events.filter(F.col(TS) > cut)]
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "counts")
        for half in halves:
            deltas = half.groupBy(PART, "user_id").agg(
                F.count(F.lit(1)).alias("cnt")
            )
            merge_add(spark, deltas, path, ["user_id"], "cnt", PART)
        got = spark.read.parquet(path).select("user_id", "cnt")
        want = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
        assert _counts(got) == _counts(want)
    events.unpersist()


def test_merge_add_rewrites_only_touched_partitions(spark):
    events = _signups(spark, SF_SMOKE).cache()
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "counts")
        base = events.groupBy(PART, "user_id").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        merge_add(spark, base, path, ["user_id"], "cnt", PART)

        untouched_dir = os.path.join(path, f"{PART}=3")
        before = {
            f: os.path.getmtime(os.path.join(untouched_dir, f))
            for f in os.listdir(untouched_dir)
        }
        delta = base.filter(F.col(PART) == 5)
        merge_add(spark, delta, path, ["user_id"], "cnt", PART)
        after = {
            f: os.path.getmtime(os.path.join(untouched_dir, f))
            for f in os.listdir(untouched_dir)
        }
        assert before == after, "untouched partition was rewritten"
        # touched partition doubled
        got = spark.read.parquet(path).filter(F.col(PART) == 5)
        want = delta.withColumn("cnt", F.col("cnt") * 2)
        assert _counts(got.select("user_id", "cnt")) == _counts(
            want.select("user_id", "cnt")
        )
    events.unpersist()


def test_merge_add_replayed_batch_is_noop(spark):
    """foreachBatch is at-least-once: a batch replayed after merge_add
    completed but before the checkpoint commit must NOT double-count —
    the batch id recorded inside the written partitions makes the
    replay a no-op (per touched partition)."""
    events = _signups(spark, SF_SMOKE).cache()
    deltas = events.groupBy(PART, "user_id").agg(F.count(F.lit(1)).alias("cnt"))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "counts")
        merge_add(spark, deltas, path, ["user_id"], "cnt", PART, batch_id=0)
        once = _counts(spark.read.parquet(path).select("user_id", "cnt"))
        # replay of batch 0: identical deltas, same batch id
        merge_add(spark, deltas, path, ["user_id"], "cnt", PART, batch_id=0)
        assert _counts(spark.read.parquet(path).select("user_id", "cnt")) == once
        # a genuinely new batch still folds
        merge_add(spark, deltas, path, ["user_id"], "cnt", PART, batch_id=1)
        doubled = _counts(
            spark.read.parquet(path).select("user_id", F.col("cnt"))
        )
        assert doubled == _counts(
            deltas.groupBy("user_id")
            .agg(F.sum("cnt").alias("cnt"))
            .withColumn("cnt", F.col("cnt") * 2)
            .select("user_id", "cnt")
        )
    events.unpersist()


def test_merge_join_pruning_path_matches_literal_path(spark):
    """Over MAX_LITERAL_PARTITIONS touched partitions, the pruned
    read switches from the collected `isin` list to a broadcast semi
    join — the two paths must merge identically.  Exercised by
    shrinking the cap so the semi-join path runs on the normal
    fixture sizes."""
    from real_time_data_analytics_cassandra_spark.sinks import merge as M

    events = _signups(spark, SF_SMOKE).cache()
    cut = events.selectExpr(
        f"timestamp_micros(cast(percentile(unix_micros({TS}), 0.5) as long)) as c"
    ).collect()[0][0]
    old, new = events.filter(F.col(TS) <= cut), events.filter(F.col(TS) > cut)
    saved = M.MAX_LITERAL_PARTITIONS
    M.MAX_LITERAL_PARTITIONS = 2  # 8 touched partitions > cap -> join path
    try:
        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "latest")
            merge_upsert(spark, old, path, KEYS, TS, PART, tiebreak=["value"])
            merge_upsert(spark, new, path, KEYS, TS, PART, tiebreak=["value"])
            got = spark.read.parquet(path)
            want = latest_per_key(events, KEYS, TS, tiebreak=["value"])
            assert _rows(got) == _rows(want)
            # merge_add's replay protection through the join path too
            deltas = events.groupBy(PART, "user_id").agg(
                F.count(F.lit(1)).alias("cnt")
            )
            cpath = os.path.join(d, "counts")
            merge_add(spark, deltas, cpath, ["user_id"], "cnt", PART, batch_id=0)
            once = _counts(spark.read.parquet(cpath).select("user_id", "cnt"))
            merge_add(spark, deltas, cpath, ["user_id"], "cnt", PART, batch_id=0)
            assert (
                _counts(spark.read.parquet(cpath).select("user_id", "cnt")) == once
            )
    finally:
        M.MAX_LITERAL_PARTITIONS = saved
    events.unpersist()


@pytest.mark.slow
def test_merge_add_thousand_plus_touched_partitions(spark):
    """A hot batch touching >1k partitions (over the literal cap at
    its production value) must still fold correctly — the driver
    never materializes the partition list."""
    src = (
        spark.range(2200)
        .select(
            F.col("id").alias("user_id"),
            (F.col("id") % 1100).alias(PART),
            F.lit(1).alias("cnt"),
        )
        .cache()
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "counts")
        merge_add(spark, src, path, ["user_id"], "cnt", PART, batch_id=0)
        merge_add(spark, src, path, ["user_id"], "cnt", PART, batch_id=1)
        got = spark.read.parquet(path)
        assert got.count() == 2200
        assert got.agg(F.sum("cnt")).collect()[0][0] == 4400
    src.unpersist()


def test_merge_add_mixed_batch_id_usage_raises(spark):
    """A target written WITH batch ids refuses a fold without one —
    silently dropping the replay markers (and per-partition schema)
    is worse than failing."""
    import pytest

    events = _signups(spark, SF_SMOKE).cache()
    deltas = events.groupBy(PART, "user_id").agg(F.count(F.lit(1)).alias("cnt"))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "counts")
        merge_add(spark, deltas, path, ["user_id"], "cnt", PART, batch_id=0)
        with pytest.raises(ValueError, match="_applied_batch_id"):
            merge_add(spark, deltas, path, ["user_id"], "cnt", PART)
    events.unpersist()


def test_merge_add_replay_protection_survives_mixed_schema(spark):
    """Replay-idempotence must survive a MIXED write sequence: a
    target first written WITHOUT batch ids (no replay markers), then
    folded WITH one.  The partitions are then mixed-schema (old files
    lack _applied_batch_id), and naive parquet schema inference can
    sample an old file and silently DROP the markers from the read —
    degrading replay protection without error.  merge_add must read
    with schema merging so the marker column always survives."""
    events = _signups(spark, SF_SMOKE).cache()
    deltas = events.groupBy(PART, "user_id").agg(F.count(F.lit(1)).alias("cnt"))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "counts")
        # era 1: no replay protection (no marker column anywhere)
        merge_add(spark, deltas, path, ["user_id"], "cnt", PART)
        # era 2: turn on batch ids, touching ONE partition
        delta5 = deltas.filter(F.col(PART) == 5)
        merge_add(spark, delta5, path, ["user_id"], "cnt", PART, batch_id=7)
        once = _counts(spark.read.parquet(path).select("user_id", "cnt"))
        # replay of batch 7 must be a no-op even though most files
        # carry no marker column
        merge_add(spark, delta5, path, ["user_id"], "cnt", PART, batch_id=7)
        assert (
            _counts(spark.read.parquet(path).select("user_id", "cnt")) == once
        ), "replay double-counted: marker column lost to schema inference"
        # and a genuinely newer batch still folds
        merge_add(spark, delta5, path, ["user_id"], "cnt", PART, batch_id=8)
        tripled = _counts(spark.read.parquet(path).select("user_id", "cnt"))
        assert tripled != once
    events.unpersist()


def test_streaming_counter_matches_batch(spark):
    events = _signups(spark, SF_SMOKE).cache()
    cut = events.selectExpr(f"timestamp_micros(cast(percentile(unix_micros({TS}), 0.5) as long)) as c").collect()[0][0]
    halves = [events.filter(F.col(TS) <= cut), events.filter(F.col(TS) > cut)]
    with (
        tempfile.TemporaryDirectory() as src,
        tempfile.TemporaryDirectory() as d,
        tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as ckpt,
    ):
        path = os.path.join(d, "counts")
        schema = events.schema
        for half in halves:
            half.write.mode("append").parquet(src)
            stream = spark.readStream.schema(schema).parquet(src)
            q = counter_foreach_batch(stream, path, ["user_id"], PART, ckpt)
            q.awaitTermination()
        got = spark.read.parquet(path).select("user_id", "cnt")
        want = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
        assert _counts(got) == _counts(want)
    events.unpersist()


def test_streaming_benford_drift_matches_batch_recompute(spark):
    """The stream-maintained per-type Benford monitor (merge_add
    counter family) must equal an INDEPENDENT batch recompute:
    first-digit counts are additive, so however the replay is
    micro-batched, the merged counter table — and the micro-unit
    readout over it — matches the one-shot aggregation (Python-int
    arithmetic here, so any BIGINT overflow would also diverge)."""
    from real_time_data_analytics_cassandra_spark import queries as q

    rows = q.queries()["streaming_benford_drift"](spark, SF_SMOKE).collect()
    ev = (
        table(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.expr(
                "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"
            ).alias("cents"),
        )
        .filter(F.col("cents") > 0)
        .select(
            "event_type",
            F.substring(F.col("cents").cast("string"), 1, 1)
            .cast("long")
            .alias("digit"),
        )
    )
    want = {
        (r.event_type, r.digit): r.n
        for r in ev.groupBy("event_type", "digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    types = {t for t, _ in want}
    assert len(rows) == 9 * len(types)  # densified digit spine
    totals: dict = {}
    for (t, _d), n in want.items():
        totals[t] = totals.get(t, 0) + n
    for r in rows:
        assert r.n_obs == want.get((r.event_type, r.digit), 0)
        assert r.share_micro == (1_000_000 * r.n_obs) // totals[r.event_type]
        assert r.dev_micro == r.share_micro - r.benford_micro


def test_streaming_merge_matches_batch(spark):
    events = _signups(spark, SF_SMOKE).cache()
    cut = events.selectExpr(f"timestamp_micros(cast(percentile(unix_micros({TS}), 0.5) as long)) as c").collect()[0][0]
    halves = [events.filter(F.col(TS) <= cut), events.filter(F.col(TS) > cut)]
    with (
        tempfile.TemporaryDirectory() as src,
        tempfile.TemporaryDirectory() as d,
        tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as ckpt,
    ):
        path = os.path.join(d, "latest")
        schema = events.schema
        for half in halves:
            half.write.mode("append").parquet(src)
            stream = spark.readStream.schema(schema).parquet(src)
            q = merge_upsert_foreach_batch(stream, path, KEYS, TS, PART, ckpt)
            q.awaitTermination()
        got = spark.read.parquet(path)
        want = latest_per_key(events, KEYS, TS)
        assert got.count() == want.count()
        assert _rows(got) == _rows(want)
    events.unpersist()


def test_streaming_topn_matches_batch(spark):
    """The bounded recent-list equals the batch top-N recompute after
    incremental folds, and a replayed fold changes nothing."""
    from real_time_data_analytics_cassandra_spark.operators.topk import global_top_n
    from real_time_data_analytics_cassandra_spark.sinks.merge import (
        merge_topn,
        topn_foreach_batch,
    )

    events = (
        table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type") == "signup")
        .select("event_id", TS, "user_id")
        .cache()
    )

    def _r(df):
        return sorted(map(tuple, df.select("event_id", TS, "user_id").collect()))

    cut = events.selectExpr(f"timestamp_micros(cast(percentile(unix_micros({TS}), 0.5) as long)) as c").collect()[0][0]
    halves = [events.filter(F.col(TS) <= cut), events.filter(F.col(TS) > cut)]
    with (
        tempfile.TemporaryDirectory() as src,
        tempfile.TemporaryDirectory() as d,
        tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as ckpt,
    ):
        path = os.path.join(d, "recent")
        schema = events.schema
        for half in halves:
            half.write.mode("append").parquet(src)
            stream = spark.readStream.schema(schema).parquet(src)
            q = topn_foreach_batch(stream, path, TS, 20, ["event_id"], ckpt)
            q.awaitTermination()
        got = spark.read.parquet(path)
        want = global_top_n(events, TS, 20, ["event_id"])
        assert _r(got) == _r(want)
        # idempotence: re-merging an already-folded half is a no-op
        merge_topn(spark, halves[1], path, TS, 20, ["event_id"])
        assert _r(spark.read.parquet(path)) == _r(want)
    events.unpersist()


def test_streaming_topk_per_group_matches_batch(spark):
    """The per-group bounded recent-list equals the batch per-group
    top-K recompute after incremental folds; replay is a no-op."""
    from real_time_data_analytics_cassandra_spark.operators.topk import (
        top_k_per_group,
    )
    from real_time_data_analytics_cassandra_spark.sinks.merge import (
        merge_topk_per_group,
        topk_per_group_foreach_batch,
    )

    events = (
        table(spark, SF_SMOKE, "events")
        .select("event_id", TS, "user_id", "event_type")
        .cache()
    )

    def _r(df):
        return sorted(
            map(tuple, df.select("event_id", TS, "user_id", "event_type").collect())
        )

    cut = events.selectExpr(f"timestamp_micros(cast(percentile(unix_micros({TS}), 0.5) as long)) as c").collect()[0][0]
    halves = [events.filter(F.col(TS) <= cut), events.filter(F.col(TS) > cut)]
    with (
        tempfile.TemporaryDirectory() as src,
        tempfile.TemporaryDirectory() as d,
        tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as ckpt,
    ):
        path = os.path.join(d, "trends")
        schema = events.schema
        for half in halves:
            half.write.mode("append").parquet(src)
            stream = spark.readStream.schema(schema).parquet(src)
            q = topk_per_group_foreach_batch(
                stream, path, ["event_type"], TS, 10, ["event_id"], ckpt
            )
            q.awaitTermination()
        got = spark.read.parquet(path)
        want = top_k_per_group(events, ["event_type"], TS, 10, ["event_id"]).drop("rn")
        assert _r(got) == _r(want)
        merge_topk_per_group(
            spark, halves[0], path, ["event_type"], TS, 10, ["event_id"]
        )
        assert _r(spark.read.parquet(path)) == _r(want)
    events.unpersist()


def test_merge_sketches_incremental_equals_single_pass_and_is_idempotent(spark):
    """Incremental HLL sketch table: two half-batches folded via
    merge_sketches must estimate exactly what one single-pass sketch
    build estimates (register-max union is deterministic), and
    replaying a batch must leave the estimates unchanged (union is
    idempotent — no batch-id bookkeeping needed, unlike merge_add)."""
    from real_time_data_analytics_cassandra_spark.sinks.merge import merge_sketches

    events = table(spark, SF_SMOKE, "events").select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyyMMdd").alias("day_bucket"),
    )
    half_a = events.filter(F.col("user_id") % 2 == 0)
    half_b = events.filter(F.col("user_id") % 2 == 1)

    path = os.path.join(tempfile.mkdtemp(prefix="rtdac_sketch_tbl_"), "t")
    for batch in (half_a, half_b):
        merge_sketches(
            spark, batch, path,
            keys=["event_type"], id_col="user_id", partition_col="day_bucket",
        )

    def estimates(df):
        # str() normalizes hive partition-dir type inference (the
        # yyyyMMdd string comes back as int from the directory names)
        return {
            (str(r["day_bucket"]), r["event_type"]): r["est"]
            for r in df.groupBy("day_bucket", "event_type")
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"))
            .collect()
        }

    single = events.groupBy("day_bucket", "event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch")
    )
    got = estimates(spark.read.parquet(path))
    want = estimates(single)
    assert got == want

    # replay half_b: register-max union makes it a no-op
    merge_sketches(
        spark, half_b, path,
        keys=["event_type"], id_col="user_id", partition_col="day_bucket",
    )
    assert estimates(spark.read.parquet(path)) == want

    # the rolled-up estimate tracks the true distinct count
    exact = events.select("user_id").distinct().count()
    merged_total = (
        spark.read.parquet(path)
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("e"))
        .collect()[0]["e"]
    )
    assert abs(merged_total - exact) / exact < 0.05


def test_sketch_foreach_batch_matches_batch_build(spark):
    """Streaming sketch maintenance: the availableNow replay folded
    through sketch_foreach_batch must estimate exactly what the
    single-pass batch sketch build estimates."""
    from real_time_data_analytics_cassandra_spark.sinks.merge import (
        sketch_foreach_batch,
    )
    from real_time_data_analytics_cassandra_spark.sources.streams import (
        bounded_event_stream,
    )

    base = tempfile.mkdtemp(prefix="rtdac_sketch_stream_")
    path = os.path.join(base, "t")
    stream = bounded_event_stream(spark, SF_SMOKE).select(
        "user_id",
        "event_type",
        F.date_format("ts", "yyyyMMdd").alias("day_bucket"),
    )
    q = sketch_foreach_batch(
        stream, path,
        keys=["event_type"], id_col="user_id", partition_col="day_bucket",
        checkpoint=os.path.join(base, "ckpt"),
    )
    q.awaitTermination()

    def estimates(df):
        return {
            (str(r["day_bucket"]), r["event_type"]): r["est"]
            for r in df.groupBy("day_bucket", "event_type")
            .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"))
            .collect()
        }

    events = table(spark, SF_SMOKE, "events").select(
        "user_id", "event_type", F.date_format("ts", "yyyyMMdd").alias("day_bucket")
    )
    single = events.groupBy("day_bucket", "event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch")
    )
    assert estimates(spark.read.parquet(path)) == estimates(single)


def test_merge_kmv_is_idempotent_and_equals_full_sketch(spark, tmp_path):
    """Folding batches into the KMV table must (1) equal the sketch of
    the full data regardless of batch split, and (2) be replay-proof:
    re-merging an already-folded batch changes nothing."""
    from pyspark.sql import functions as F

    from real_time_data_analytics_cassandra_spark.operators.sketches import (
        kmv_hash,
    )
    from real_time_data_analytics_cassandra_spark.sinks.merge import merge_kmv

    path = str(tmp_path / "kmv")
    k = 16
    full = spark.range(0, 600).select(
        F.concat(F.lit("g"), (F.col("id") % 3)).alias("g"),
        F.col("id").alias("uid"),
    )
    b1 = full.filter(F.col("uid") < 250)
    b2 = full.filter(F.col("uid") >= 250)
    merge_kmv(spark, b1, path, ["g"], "uid", k=k)
    merge_kmv(spark, b2, path, ["g"], "uid", k=k)

    def snap():
        return sorted(
            (r.g, r.h) for r in spark.read.parquet(path).collect()
        )

    got = snap()
    # expected: bottom-k per group of the FULL data's hashes
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy("h")
    want = sorted(
        (r.g, r.h)
        for r in full.select("g", kmv_hash("uid").alias("h"))
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .collect()
    )
    assert got == want
    assert all(
        len([1 for g, _ in got if g == grp]) == k for grp in ("g0", "g1", "g2")
    )
    # replay: fold b1 again — byte-identical table
    merge_kmv(spark, b1, path, ["g"], "uid", k=k)
    assert snap() == got


def test_cents_counter_average_equals_davg_under_splits(spark, tmp_path):
    """The streaming-CUSUM claim: value sums accumulated as integer
    CENTS across arbitrary micro-batch splits reproduce the davg
    (decimal-exact) hourly average bit-for-bit."""
    from pyspark.sql import functions as F

    from real_time_data_analytics_cassandra_spark.functions.numeric import davg
    from real_time_data_analytics_cassandra_spark.sinks.merge import merge_add

    path = str(tmp_path / "c")
    rows = [
        ("a", i % 5, 0.01 * (7 * i % 997) + (i % 13)) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "g string, h long, value double")
    parts = [
        df.filter(F.pmod(F.xxhash64("value"), F.lit(3)) == i)
        for i in range(3)
    ]
    for bid, b in enumerate(parts):
        deltas = b.groupBy("g", "h").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("value").cast("decimal(12,2)") * 100).cast("long")
            ).alias("cents"),
        ).selectExpr("g", "h", "stack(2, 'n', n, 'cents', cents) AS (metric, val)")
        merge_add(spark, deltas, path, keys=["h", "metric"],
                  count_col="val", partition_col="g", batch_id=bid)
    merged = (
        spark.read.parquet(path)
        .groupBy("g", "h")
        .pivot("metric", ["n", "cents"])
        .agg(F.sum("val"))
        .select(
            "g", "h",
            F.round((F.col("cents").cast("double") / 100) / F.col("n"), 6)
            .alias("avg_value"),
        )
    )
    want = df.groupBy("g", "h").agg(
        davg(F.col("value").cast("decimal(12,2)"), "avg_value")
    )
    got = {(r.g, r.h): r.avg_value for r in merged.collect()}
    exp = {(r.g, r.h): r.avg_value for r in want.collect()}
    assert got == exp


def test_merge_min_idempotent_and_split_invariant(spark, tmp_path):
    """min-merge: any batch split reaches the same first-seen table,
    and replaying a batch changes nothing (idempotent min)."""
    from pyspark.sql import functions as F

    from real_time_data_analytics_cassandra_spark.sinks.merge import merge_min

    path = str(tmp_path / "m")
    full = spark.createDataFrame(
        [(u, d, f"b{u % 3}") for u in range(40) for d in (u % 5, u % 7, 3)],
        "user long, day long, bucket string",
    )
    parts = [full.filter(F.pmod(F.xxhash64("day"), F.lit(2)) == i) for i in range(2)]
    for b in parts:
        merge_min(spark, b, path, ["user"], "day", "bucket")

    def snap():
        return sorted((r.user, r.day) for r in spark.read.parquet(path).collect())

    got = snap()
    want = sorted(
        (r.user, r.day)
        for r in full.groupBy("user").agg(F.min("day").alias("day")).collect()
    )
    assert got == want
    merge_min(spark, parts[0], path, ["user"], "day", "bucket")  # replay
    assert snap() == got


def test_merge_min_add_matches_recompute_and_replay_is_noop(spark):
    """The combined MIN+ADD merge must (a) land on the batch
    recompute for BOTH columns regardless of the batch split, (b)
    make a replayed batch a per-partition no-op, and (c) keep
    folding genuinely new batches."""
    from real_time_data_analytics_cassandra_spark.sinks.merge import (
        merge_min_add,
    )

    events = _signups(spark, SF_SMOKE).cache()
    first = (
        events.filter(F.col("user_id") % 2 == 0)
        .withColumn("one", F.lit(1).cast("long"))
    )
    second = (
        events.filter(F.col("user_id") % 2 == 1)
        .withColumn("one", F.lit(1).cast("long"))
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "clusters")
        merge_min_add(
            spark, first, path, ["user_id"], "ts", "one", PART, batch_id=0
        )
        merge_min_add(
            spark, second, path, ["user_id"], "ts", "one", PART, batch_id=1
        )
        want = sorted(
            map(
                tuple,
                events.groupBy("user_id")
                .agg(
                    F.min("ts").alias("ts"),
                    F.count(F.lit(1)).alias("one"),
                )
                .collect(),
            )
        )
        got = sorted(
            map(
                tuple,
                spark.read.parquet(path)
                .select("user_id", "ts", "one")
                .collect(),
            )
        )
        assert got == want
        # replay of batch 1: per-partition no-op
        merge_min_add(
            spark, second, path, ["user_id"], "ts", "one", PART, batch_id=1
        )
        again = sorted(
            map(
                tuple,
                spark.read.parquet(path)
                .select("user_id", "ts", "one")
                .collect(),
            )
        )
        assert again == want
        # a genuinely new batch still folds (counts double, mins hold)
        merge_min_add(
            spark, second, path, ["user_id"], "ts", "one", PART, batch_id=2
        )
        tripled = {
            r["user_id"]: (r["ts"], r["one"])
            for r in spark.read.parquet(path).collect()
        }
        for r in second.groupBy("user_id").agg(
            F.min("ts").alias("ts"), F.count(F.lit(1)).alias("one")
        ).collect():
            assert tripled[r["user_id"]] == (r["ts"], 2 * r["one"])
    events.unpersist()
