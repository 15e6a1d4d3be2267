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


def bounded_topk_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order: Sequence[Column],
    k: int,
    salt_on: Sequence[str],
    buckets: int = 32,
    rank_col: str = "rank",
) -> DataFrame:
    """Two-phase exact top-k per key with a bounded final exchange.

    A single ``Window.partitionBy(keys)`` over a large scored set is a
    skew funnel when |keys| is small (e.g. 5 query vectors ranking the
    whole corpus): every scored row shuffles into |keys| tasks.  This
    splits the rank into:

    1. a SALTED partial window over (keys..., pmod(xxhash64(salt_on),
       buckets)) — the scored set still crosses one exchange, but
       spread over |keys| * ``buckets`` reducers, each keeping only its
       local top-k;
    2. the final per-key window, which now reads at most
       |keys| * ``buckets`` * k rows instead of the full scored set.

    Bit-identical to the single window PROVIDED ``order`` is a total
    order (callers pass a unique tiebreak column): every global top-k
    row is beaten by < k rows overall, hence by < k rows inside its own
    salt bucket, so phase 1 never drops a global winner.  The salt is a
    deterministic hash of data columns (never ``spark_partition_id``,
    which is retry/AQE-unstable), so recomputation under speculative
    execution is safe.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_on]), F.lit(buckets))
    w1 = Window.partitionBy(*keys, "_tk_salt").orderBy(*order)
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_tk_salt", salt)
        .withColumn("_tk_prank", F.row_number().over(w1))
        .filter(F.col("_tk_prank") <= k)
        .drop("_tk_salt", "_tk_prank")
        .withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= k)
    )
