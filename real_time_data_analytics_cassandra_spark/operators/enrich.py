"""Broadcast dimension enrichment (lookup joins with defaults).

Reference semantics: per-event dict lookups with a miss default —
``GEOGRAPHY_MAP.get(k)`` -> "Unknown" (cassandra_subscriber.py:81-84,
118) and ``PRODUCT_SUBCATEGORIES_MAP.get(k, ...)``
(realtime_api.py:59-63, 292, 317).  SURVEY.md §2.3 J1/J2.

Spark-first: LEFT broadcast-hash join + coalesce.  ``F.broadcast``
pins the strategy so the plan never degenerates to a shuffle join on
the fact side — the dimension ships once per executor, the 100 TB
fact table never moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def broadcast_lookup(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    defaults: dict[str, str],
) -> DataFrame:
    """Left-join ``dim`` (broadcast) onto ``fact``; for each column ->
    default in ``defaults``, replace a miss (NULL) with the default."""
    joined = fact.join(F.broadcast(dim), fact[fact_key] == dim[dim_key], "left")
    out = joined
    for col_name, default in defaults.items():
        out = out.withColumn(col_name, F.coalesce(F.col(col_name), F.lit(default)))
    return out
