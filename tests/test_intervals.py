"""Bucketed interval join (operators/intervals.py): semantics vs the
naive non-equi join, and the plan shape that justifies it (equi-join,
no nested loop).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_analytics_cassandra_spark.catalog import table
from real_time_data_analytics_cassandra_spark.operators import intervals
from real_time_data_analytics_cassandra_spark.operators import sessions
from real_time_data_analytics_cassandra_spark.plans.checks import explain_str
from tests.conftest import SF_SMOKE


def _parts(spark):
    events = table(spark, SF_SMOKE, "events")
    sess = sessions.sessionize(events, "user_id", "ts", 30).select(
        "user_id", "session_idx", "session_start", "session_end"
    )
    points = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return points, sess


def test_interval_join_matches_naive_nonequi_join(spark):
    """The bucketed equi-join + residual filter must produce exactly
    the pairs of the direct non-equi join (including a point on an
    interval boundary, and points matching several intervals if any
    overlapped)."""
    points, sess = _parts(spark)
    fast = intervals.interval_join(
        points,
        sess,
        key="user_id",
        ts_col="ts",
        start_col="session_start",
        end_col="session_end",
    )
    naive = (
        points.alias("p")
        .join(
            sess.alias("s"),
            (F.col("p.user_id") == F.col("s.user_id"))
            & (F.col("p.ts") >= F.col("s.session_start"))
            & (F.col("p.ts") <= F.col("s.session_end")),
        )
        .select("p.event_id", "s.session_idx")
    )
    a = sorted(
        (r.event_id, r.session_idx)
        for r in fast.select("event_id", "session_idx").collect()
    )
    b = sorted((r.event_id, r.session_idx) for r in naive.collect())
    assert a == b
    assert a, "fixture must contain purchases inside sessions"
    # every purchase helped FORM the sessions, so each matches exactly one
    assert len(a) == points.count()


def test_interval_join_plans_as_equi_join(spark):
    """The whole point of the bucket trick: the physical plan must be
    a hash/sort-merge EQUI-join — no BroadcastNestedLoopJoin, no
    CartesianProduct (what the naive non-equi form degenerates to)."""
    points, sess = _parts(spark)
    plan = explain_str(
        intervals.interval_join(
            points,
            sess,
            key="user_id",
            ts_col="ts",
            start_col="session_start",
            end_col="session_end",
        )
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
