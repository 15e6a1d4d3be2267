"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over real_time_data_analytics_cassandra_spark.queries — see
that module for the per-query docs and determinism rules.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from real_time_data_analytics_cassandra_spark import queries as _q

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §7.1): the geo-distribution pipeline —
    signup events -> broadcast geo enrichment -> hourly bucket counts
    by (country, city) — on /root/testdata/sf0.001."""
    return _q.geo_hourly_counts(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 plus the
    training-data-pipeline extensions."""
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; the
    non-portable ones (Spark-side hashing / approximate algorithms)
    are intentionally absent -> rows-only checks."""
    return _q.oracle_sql()
