"""Top-N / per-group top-K by recency.

Reference semantics: ``CLUSTERING ORDER BY ts DESC`` + ``LIMIT n``
slices (reference README.md:270, 282; realtime_api.py:143-149,
282-288).  SURVEY.md §2.5 T1-T3.

Spark-first:
- global top-N: ``orderBy().limit()`` compiles to the
  TakeOrderedAndProject physical operator — each partition keeps only
  its local top-N, the driver merges N*partitions rows; no global
  sort, no single hot partition (the reference needed a
  fixed_partition_key hack for this, README.md:117-118).
- per-group top-K: ranking window, one shuffle on the group key.

Tie-break columns mirror the reference's clustering keys
(README.md:269, 281) and make results deterministic for the oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _order(ts: str, tiebreak: Sequence[str]) -> list[Column]:
    return [F.desc(ts)] + [F.asc(c) for c in tiebreak]


def global_top_n(df: DataFrame, ts: str, n: int, tiebreak: Sequence[str] = ()) -> DataFrame:
    return df.orderBy(*_order(ts, tiebreak)).limit(n)


def top_k_per_group(
    df: DataFrame,
    group: Sequence[str],
    ts: str,
    k: int,
    tiebreak: Sequence[str] = (),
    rank_col: str = "rn",
) -> DataFrame:
    w = Window.partitionBy(*group).orderBy(*_order(ts, tiebreak))
    return df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
