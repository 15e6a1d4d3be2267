"""Production-shaped Cassandra source (import-gated).

The reference serves every query from Cassandra tables
(realtime_api.py:99-100, 143-149, 207-208, 257-258, 282-288); the
Spark-native analytics path over the same live tables is the Spark
Cassandra connector (BASELINE.json "spark_approach"), which pushes
partition-key and clustering-key predicates down to CQL — the
connector-side analog of the reference's point/slice reads — and
scans token ranges in parallel for full-table analytics.

The connector jar is not installed in this environment, so
``read_cassandra_table`` only *builds* the reader (format + options —
cheap, jar-free); calling ``.load()`` without the jar raises Spark's
ClassNotFound.  Tests cover the option construction; the parquet
catalog (catalog.py) is the gated data path.

Deploying for real needs exactly one extra submit-time line (no code
change here)::

    spark-submit --packages \
        com.datastax.spark:spark-cassandra-connector_2.13:3.5.1 \
        --conf spark.cassandra.connection.host=<contact-points> ...

(connector 3.5.x tracks Spark 3.5/4.x and Scala 2.13; for catalog
SQL add ``spark.sql.catalog.cass=com.datastax.spark.connector.
datasource.CassandraCatalog`` and query ``cass.<ks>.<table>``
directly.)
"""

from __future__ import annotations

from pyspark.sql import DataFrameReader, SparkSession

CASSANDRA_FORMAT = "org.apache.spark.sql.cassandra"


def cassandra_options(
    keyspace: str,
    table: str,
    *,
    consistency: str = "LOCAL_ONE",
    splits_per_node: int | None = None,
) -> dict[str, str]:
    """Connector options for one table read.

    ``splits_per_node`` controls token-range parallelism (the
    connector's input-partition count — size it like
    files.maxPartitionBytes for parquet: enough splits that one
    Cassandra token range fits an executor core's memory).
    """
    opts = {
        "keyspace": keyspace,
        "table": table,
        "spark.cassandra.input.consistency.level": consistency,
    }
    if splits_per_node is not None:
        opts["spark.cassandra.input.split.sizeInMB"] = str(splits_per_node)
    return opts


def read_cassandra_table(
    spark: SparkSession, keyspace: str, table: str, **kwargs
) -> DataFrameReader:
    """Reader for a Cassandra table; caller chains ``.load()``.

    Equality predicates on partition-key columns push down to CQL
    (the reference's O(partition) point read); everything else runs
    as a parallel token-range scan feeding normal Catalyst plans.
    """
    return spark.read.format(CASSANDRA_FORMAT).options(
        **cassandra_options(keyspace, table, **kwargs)
    )
