"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference real-time-analytics pipeline
(vfd003-ual/real-time-data-analytics-cassandra).

The reference pre-computes five materialized access patterns at write
time via Cassandra data modeling (see SURVEY.md §1-2).  This engine
re-expresses the same semantics Spark-first: declarative DataFrame
plans optimized by Catalyst, streaming variants via Structured
Streaming, plus the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) the
reference lacks.

Layout:
    session.py    SparkSession factory (AQE, UTC, sized shuffles)
    catalog.py    testdata parquet -> named DataFrames / temp views
    functions/    scalar helpers: time buckets, exact-decimal aggs,
                  text tokenization, vector math
    operators/    reusable operator implementations (latest-per-key,
                  top-k, bucket counts, enrichment joins, dedup,
                  similarity, text analysis, multimodal)
    sources/      batch + bounded-stream readers
    streaming/    Structured Streaming pipelines mirroring the
                  reference's write path (windowed counters, upsert
                  views, fan-out multicast)
    plans/        plan-inspection helpers used by tests to assert
                  pushdown / broadcast / codegen
    queries.py    the engine's public query registry (name ->
                  (spark, sf_dir) -> DataFrame) + DuckDB oracle SQL
"""

__version__ = "0.1.0"
