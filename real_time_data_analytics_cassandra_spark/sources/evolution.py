"""Schema-evolution-tolerant reads.

A 100 TB table is never written by one schema: columns get added,
integral types get widened, and years of parquet generations coexist
under one path.  The reference sidesteps this with fixed CQL DDL
(README.md:216-289) — adding a column there means ALTER TABLE plus a
backfill.  The engine's contract instead: declare the CURRENT logical
schema and read every generation into it —

- columns a generation lacks surface as typed NULLs (parquet's own
  missing-column read semantics under a declared schema);
- lossless widenings (int -> bigint, float -> double) are served by
  Spark 4's parquet type-widening readers, vectorization intact;
- a generation whose stored type does NOT widen losslessly into the
  declared column is refused at PLAN time with the offending file
  named — never a mid-job SchemaColumnConvertNotSupported surprise,
  and never a silent narrowing.

(Spark's own ``mergeSchema=true`` cannot express this: it requires
byte-identical types per column across generations and fails the whole
read on an int/bigint pair.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# lossless widening chains (stored physical -> declared logical)
_WIDENS = {
    ("byte", "short"),
    ("byte", "integer"),
    ("byte", "long"),
    ("short", "integer"),
    ("short", "long"),
    ("integer", "long"),
    ("float", "double"),
}


def _generation_schemas(spark: SparkSession, path: str):
    """(file, schema) per parquet data file under ``path`` — a
    driver-side footer sweep.  At real scale generations live behind a
    manifest (one schema per ingest, not per file) and this validates
    the manifest entries instead; the per-file sweep is the
    manifest-less fallback."""
    from real_time_data_analytics_cassandra_spark.operators.index import _fs

    fs, _ = _fs(spark, path)
    glob = spark._jvm.org.apache.hadoop.fs.Path(f"{path}/*.parquet")
    for st in fs.globStatus(glob) or []:
        f = st.getPath().toString()
        yield f, spark.read.parquet(f).schema


def evolved_read(
    spark: SparkSession, path: str, target: StructType
) -> DataFrame:
    """Read every parquet generation under ``path`` into the declared
    ``target`` schema (missing columns -> typed NULLs, lossless
    widenings cast up in the reader, anything else refused at plan
    time with the file named)."""
    for f, schema in _generation_schemas(spark, path):
        have = {fld.name: fld.dataType for fld in schema.fields}
        for fld in target.fields:
            if fld.name not in have:
                continue  # missing column -> typed NULL, always fine
            got = have[fld.name]
            if got == fld.dataType:
                continue
            if (got.typeName(), fld.dataType.typeName()) in _WIDENS:
                continue
            raise ValueError(
                f"{f}: column {fld.name} stored as {got.simpleString()} "
                f"does not losslessly widen to declared "
                f"{fld.dataType.simpleString()} — refusing a narrowing "
                "read; migrate that generation explicitly"
            )
    return spark.read.schema(target).parquet(path)
