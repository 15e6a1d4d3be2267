"""Event-time bucket functions.

The reference derives string time buckets from the event timestamp:
hour ``%Y%m%d%H`` (cassandra_subscriber.py:90), day ``%Y%m%d`` (:91),
5-minute floor then ``%Y%m%d%H%M`` (:92-93), and prefixes them with
``hourly:`` / ``daily:`` / ``5min:`` labels (:95-98).  All of these
are pure column expressions — they stay inside whole-stage codegen
and, when a table is partitioned by the bucket column, Catalyst prunes
partitions on bucket equality predicates.

Session timezone must be UTC (session.ensure_query_confs) so that
``date_format`` renders the tz-naive parquet timestamps verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hour_bucket(ts: Column | str) -> Column:
    """``yyyyMMddHH`` — cassandra_subscriber.py:90, realtime_api.py:66-68."""
    return F.date_format(ts, "yyyyMMddHH")


def day_bucket(ts: Column | str) -> Column:
    """``yyyyMMdd`` — cassandra_subscriber.py:91, realtime_api.py:76-78."""
    return F.date_format(ts, "yyyyMMdd")


def five_min_bucket(ts: Column | str) -> Column:
    """Floor minutes to the 5-minute grid, format ``yyyyMMddHHmm``.

    Mirrors ``(minute // 5) * 5`` + strftime at
    cassandra_subscriber.py:92-93 / realtime_api.py:70-74.  Built from
    minute arithmetic (not epoch division) so the DuckDB oracle can
    use the identical timezone-free formula.
    """
    floored = (F.floor(F.minute(ts) / F.lit(5)) * F.lit(5)).cast("int")
    return F.concat(
        F.date_format(ts, "yyyyMMddHH"),
        F.lpad(floored.cast("string"), 2, "0"),
    )


def labeled_bucket(prefix: str, bucket: Column) -> Column:
    """``'hourly:' + bucket`` label concat — cassandra_subscriber.py:95-98."""
    return F.concat(F.lit(prefix + ":"), bucket)
