"""Keyed interval (range) join via bucketed equi-join.

"Which interval contains this point?" is a non-equi join predicate
(``start <= ts <= end``); expressed directly, Spark plans it as a
broadcast-nested-loop / cartesian per key — quadratic pair work and
the classic range-join trap at scale.  The scale-safe shape quantizes
time into fixed-width buckets: every interval row is exploded to the
bucket ids it overlaps, every point row computes its single bucket id,
and the join becomes a plain shuffled (or bucketed-layout) EQUI-join
on (key, bucket) with the exact ``between`` predicate as a residual
filter.  Interval replication is bounded by
``len(interval)/bucket + 1`` rows, so picking the bucket width near
the typical interval length keeps the blowup ~2x while the equi-join
hashes instead of looping — the same binning trick Spark's own
stream-stream interval join and Databricks' range-join hints use.

Not in the reference (its data model answers only pre-materialized
questions); this generalizes the as-of join (operators/asof.py) from
"latest at-or-before" to "all containing/overlapping intervals".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts_col: str = "ts",
    start_col: str = "session_start",
    end_col: str = "session_end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """All (point, containing-interval) pairs with equal ``key`` and
    ``start <= ts <= end`` (inclusive), as an equi-join.

    Output: every points column + every intervals column except its
    key (the join key appears once).  A point inside two overlapping
    intervals matches twice — interval semantics, not as-of semantics.
    Timestamps must be non-negative epochs (bucket ids use integer
    division; the testdata's 2024+ event times always are).
    """
    b_us = bucket_seconds * 1_000_000
    pts = points.withColumn(
        "__b", F.expr(f"unix_micros({ts_col}) div {b_us}")
    )
    spans = intervals.withColumn(
        "__b",
        F.explode(
            F.expr(
                f"sequence(unix_micros({start_col}) div {b_us}, "
                f"unix_micros({end_col}) div {b_us})"
            )
        ),
    )
    joined = pts.join(spans, [key, "__b"]).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    )
    return joined.drop("__b")
