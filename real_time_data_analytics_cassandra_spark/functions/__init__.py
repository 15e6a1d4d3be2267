"""Scalar/aggregate function helpers shared by operators and queries."""

from real_time_data_analytics_cassandra_spark.functions.buckets import (
    day_bucket,
    five_min_bucket,
    hour_bucket,
    labeled_bucket,
)
from real_time_data_analytics_cassandra_spark.functions.numeric import davg, dsum
from real_time_data_analytics_cassandra_spark.functions.textfns import (
    norm_text,
    tokens,
    word_ngrams,
)
from real_time_data_analytics_cassandra_spark.functions.vectors import (
    cosine_expr,
    dot_expr,
)

__all__ = [
    "hour_bucket",
    "day_bucket",
    "five_min_bucket",
    "labeled_bucket",
    "dsum",
    "davg",
    "tokens",
    "word_ngrams",
    "norm_text",
    "dot_expr",
    "cosine_expr",
]
