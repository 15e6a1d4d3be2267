"""Last-value-per-key (upsert / last-write-wins view).

Reference semantics: Cassandra INSERT into ``customer_latest_info`` is
an upsert keyed on ``customer_alternate_key`` — re-inserting the same
key overwrites, so the table always holds the latest row per key
(reference README.md:216-248 PK; cassandra_subscriber.py:124-144
insert).  SURVEY.md §2.4 A5 / §2.7 ST6.

Spark-first: ranking window (argmax by event time with a
deterministic tie-break mirroring the clustering key, reference
README.md:281).  At scale this is one shuffle on the key — the same
cost as any keyed dedup — and AQE handles key skew.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    ts: str,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Keep only the newest row per key; ties broken descending on
    ``tiebreak`` columns so the result is unique and deterministic."""
    order: list[Column] = [F.desc(ts)] + [F.desc(c) for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
