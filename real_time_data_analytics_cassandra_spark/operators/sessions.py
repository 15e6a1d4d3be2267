"""Gap-based sessionization.

Standard behavioral-analytics operator (absent from the reference —
superset capability): split each user's event stream into sessions
separated by inactivity gaps.

Spark-first: two windows over one shuffle on the key — lag() marks
session starts, a running sum numbers them; a grouped aggregation
folds each session.  The streaming analog is
``F.session_window(ts, gap)`` (see streaming/pipelines.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_minutes: int = 30,
    tiebreak: str = "event_id",
) -> DataFrame:
    """Sessions per key: (key, session_idx, session_start, session_end,
    n_events, duration_micros)."""
    order = Window.partitionBy(key).orderBy(F.col(ts), F.col(tiebreak))
    gap_us = gap_minutes * 60 * 1_000_000
    # diff >= gap starts a new session — the same boundary rule as
    # Spark's streaming session_window (interval [start, start+gap)),
    # so the batch and streaming forms agree exactly
    flagged = df.withColumn(
        "__new_session",
        F.when(
            F.lag(ts).over(order).isNull()
            | (
                F.unix_micros(F.col(ts)) - F.unix_micros(F.lag(ts).over(order))
                >= gap_us
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    numbered = flagged.withColumn(
        "session_idx",
        F.sum("__new_session")
        .over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return (
        numbered.groupBy(key, "session_idx")
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            (F.unix_micros(F.max(ts)) - F.unix_micros(F.min(ts))).alias(
                "duration_micros"
            ),
        )
    )
