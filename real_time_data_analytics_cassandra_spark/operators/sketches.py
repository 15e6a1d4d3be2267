"""Mergeable frequency sketches: Misra-Gries heavy hitters.

The third sketch family next to HLL (cardinality, sinks/merge.py +
hll_reaggregated_users) and quantile summaries
(approx_value_percentiles): FREQUENCY estimation with bounded state —
"which tokens/keys dominate this corpus" without a full groupBy of
the key space.

Why not just groupBy().count().orderBy().limit()?  That is exact and
fine when the key space fits a shuffle (and it is the cross-check in
tests) — but its shuffle is O(distinct keys).  The Misra-Gries
summary is O(k) state per partition, ships k rows per partition
total, and is MERGEABLE (Agarwal et al., "Mergeable Summaries",
PODS'12): summing per-partition summaries preserves the error bound
with NO second pass over data.  At 100 TB / web-scale vocabularies,
this is the difference between shuffling the vocabulary and shipping
kilobytes.

Guarantees (merged summary, n = total rows, err = Σ per-partition
subtracted mass ≤ n/(k+1)):
- every reported estimate is a LOWER bound: est(v) ≤ true(v);
- the undercount is bounded: true(v) - est(v) ≤ err;
- completeness: any value with true(v) > err appears in the summary.
All three are asserted against exact counts in tests/test_crossval.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mg_partition_summaries(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """Per-partition Misra-Gries summaries over ``df[col]``.

    One Arrow pass per partition: batch value_counts fold into a
    counter dict; whenever it exceeds ``k`` entries, the (k+1)-th
    largest count is subtracted from every counter (the MG decrement,
    vectorized per batch, never per row) and non-positive counters
    drop.  Emits ≤ k rows (value, cnt) per partition plus ONE
    bookkeeping row (value=NULL, cnt=subtracted mass) carrying the
    partition's error term.
    """

    def run(batches):
        import pandas as pd

        counts: dict = {}
        err = 0
        for pdf in batches:
            if not len(pdf):
                continue
            for v, c in pdf[col].value_counts().items():
                counts[v] = counts.get(v, 0) + int(c)
            if len(counts) > k:
                delta = sorted(counts.values(), reverse=True)[k]
                err += delta
                counts = {v: c - delta for v, c in counts.items() if c > delta}
        out = pd.DataFrame(
            {
                "value": list(counts.keys()) + [None],
                "cnt": list(counts.values()) + [err],
            }
        )
        yield out

    return df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        run, "value string, cnt long"
    )


def heavy_hitters(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """Merged Misra-Gries heavy-hitter summary of ``df[col]``.

    Output: (value, est_count, max_err) — est_count is a lower bound
    on the true count, true ≤ est_count + max_err, and every value
    whose true count exceeds max_err is present.  The merge is a plain
    sum of the per-partition summaries (mergeable-summaries property);
    max_err is the summed per-partition subtracted mass, a scalar
    broadcast onto the ≤ k·P-row result.
    """
    summaries = mg_partition_summaries(df, col, k)
    err_row = summaries.filter(F.col("value").isNull()).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).alias("max_err")
    )
    merged = (
        summaries.filter(F.col("value").isNotNull())
        .groupBy("value")
        .agg(F.sum("cnt").alias("est_count"))
    )
    return merged.crossJoin(F.broadcast(err_row))


def top_heavy_hitters(
    df: DataFrame, col: str, k: int = 64, top: int = 20
) -> DataFrame:
    """Reporting form: the ``top`` largest estimates with deterministic
    (est desc, value) ranking — TakeOrdered over the ≤ k·P-row merged
    summary, never over the data."""
    w = Window.orderBy(F.desc("est_count"), F.asc("value"))
    return (
        heavy_hitters(df, col, k)
        .orderBy(F.desc("est_count"), F.asc("value"))
        .limit(top)
        .withColumn("rank", F.row_number().over(w).cast("long"))
    )
