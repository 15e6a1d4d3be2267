"""Persisted inverted text index: build-once / search-many BM25.

The reference recomputes nothing at query time either — its tables ARE
the precomputed answers (SURVEY.md §1.2, query-first keyed layout).
This module gives the lexical-retrieval operators the same shape the
ANN family already has (similarity.py::ann_index_build/probe): a
one-scan BUILD that persists the index as hive-partitioned parquet,
and a SEARCH that touches only the partitions its query terms live in.

Layout under ``path``:

- ``postings/``  (term, doc_id, tf), hive-partitioned by
  ``bucket = hash_bucket(term) % n_buckets`` — a query's terms map to
  a handful of buckets, so the scan partition-prunes to those
  directories: the parquet analog of an inverted-list seek.  Within a
  bucket the term IN-list still pushes into the scan.
- ``termstats/`` (term, dfreq), same bucketing, same pruning.
- ``docstats/``  (doc_id, dl) — one row per document.
- ``stats/``     exactly one row (n_docs, avgdl).

Search parity: search reads these four tables into the SAME
``bm25_rank`` the fresh ``bm25_topk`` path uses, so a persisted-index
search is bit-identical to scoring the corpus from scratch (asserted
in tests/test_index.py).  At 100 TB the difference is the point: build
pays the corpus scan once; every search afterwards reads a few
megabytes of postings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from real_time_data_analytics_cassandra_spark.operators.sampling import (
    hash_bucket,
)
from real_time_data_analytics_cassandra_spark.operators.text import bm25_rank
from real_time_data_analytics_cassandra_spark.functions.textfns import tokens

N_BUCKETS = 64


def build_text_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> dict:
    """ONE corpus scan feeds all four tables: the token explode is
    aggregated map-side into (doc, term, tf); dfreq re-aggregates the
    postings (never the corpus); doc lengths are a pure projection.
    The postings/termstats writes repartition by bucket so each hive
    directory is a few co-written files.  Returns {n_docs, n_terms,
    n_buckets}."""
    postings = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .withColumn("bucket", hash_bucket("term", n_buckets))
    )
    (
        postings.repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{path}/postings")
    )
    spark = df.sparkSession
    saved = spark.read.parquet(f"{path}/postings")
    termstats = (
        saved.groupBy("term", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("dfreq"))
    )
    (
        termstats.repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(f"{path}/termstats")
    )
    dl = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("dl"),
    )
    dl.write.mode("overwrite").parquet(f"{path}/docstats")
    dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/stats")
    n_docs = spark.read.parquet(f"{path}/stats").collect()[0]["n_docs"]
    n_terms = termstats.count()
    return {"n_docs": int(n_docs), "n_terms": int(n_terms),
            "n_buckets": n_buckets}


def bm25_search_index(
    spark: SparkSession,
    path: str,
    query_terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 10,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Search the persisted index.  The query's terms are hashed to
    their buckets DRIVER-side (a few md5 calls on literals), so the
    postings/termstats scans carry both a partition filter (bucket IN
    ...) and a pushed term IN-list — the plan reads only the touched
    hive directories.  Scoring and ranking are ``bm25_rank``:
    bit-identical to the fresh path."""
    import hashlib

    want = sorted(
        {
            int(hashlib.md5(t.encode()).hexdigest()[:4], 16) % n_buckets
            for t in query_terms
        }
    )
    m = (
        spark.read.parquet(f"{path}/postings")
        .filter(F.col("bucket").isin(want))
        .filter(F.col("term").isin(*query_terms))
        .select("doc_id", "term", "tf")
    )
    dfreq = (
        spark.read.parquet(f"{path}/termstats")
        .filter(F.col("bucket").isin(want))
        .filter(F.col("term").isin(*query_terms))
        .select("term", "dfreq")
    )
    dl = spark.read.parquet(f"{path}/docstats")
    stats = spark.read.parquet(f"{path}/stats")
    return bm25_rank(m, dl, dfreq, stats, k1=k1, b=b, top_k=top_k)


def append_text_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> dict:
    """INCREMENTALLY add a batch of documents to an existing index —
    the build-once / APPEND-INCREMENT / search-many lifecycle.  At
    100 TB the point is O(batch), never O(corpus): a new crawl slice
    must not trigger an index rebuild.

    Mechanics, per table:

    - already-indexed doc_ids are dropped first (anti-join against
      ``docstats``), so REPLAYING a batch is a no-op — the same
      idempotency discipline as the merge sinks;
    - ``postings``: new (term, doc_id, tf) rows simply APPEND into
      their hive bucket directories (tf is per-document, so rows for
      new docs never collide with old rows);
    - ``termstats``: document frequency is additive — the affected
      buckets (<= n_buckets) are read back, unioned with the batch's
      per-term counts, re-summed, and DYNAMICALLY overwritten; only
      touched bucket directories rewrite, O(vocab slice) work;
    - ``docstats``: append; ``stats``: recomputed exactly from the
      appended docstats (a 2-column table scan, trivially cheap, and
      avgdl stays the exact sum/count — no drifting incremental
      average).

    Search afterwards is bit-identical to an index built fresh over
    old+new (asserted in tests/test_index.py) because every stored
    table equals its full-rebuild value row-for-row.  Returns
    {n_new_docs, n_docs}."""
    from real_time_data_analytics_cassandra_spark.sinks.merge import _conf

    spark = df.sparkSession
    known = spark.read.parquet(f"{path}/docstats").select("doc_id")
    fresh = df.join(
        known, df[id_col] == known.doc_id, "left_anti"
    ).localCheckpoint(eager=True)
    n_new = fresh.count()
    if n_new == 0:
        n_docs = spark.read.parquet(f"{path}/stats").collect()[0]["n_docs"]
        return {"n_new_docs": 0, "n_docs": int(n_docs)}

    postings = (
        fresh.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .withColumn("bucket", hash_bucket("term", n_buckets))
        .localCheckpoint(eager=True)
    )
    (
        postings.repartition("bucket")
        .write.mode("append")
        .partitionBy("bucket")
        .parquet(f"{path}/postings")
    )
    new_counts = postings.groupBy("term", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("dfreq")
    )
    affected = [
        r["bucket"] for r in new_counts.select("bucket").distinct().collect()
    ]
    old = (
        spark.read.parquet(f"{path}/termstats")
        .filter(F.col("bucket").isin(affected))
        .select("term", "bucket", "dfreq")
    )
    merged = (
        old.unionByName(new_counts)
        .groupBy("term", "bucket")
        .agg(F.sum("dfreq").cast("bigint").alias("dfreq"))
        .localCheckpoint(eager=True)
    )
    with _conf(spark, "spark.sql.sources.partitionOverwriteMode", "dynamic"):
        (
            merged.repartition("bucket")
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{path}/termstats")
        )
    dl = fresh.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).cast("bigint").alias("dl"),
    )
    dl.write.mode("append").parquet(f"{path}/docstats")
    all_dl = spark.read.parquet(f"{path}/docstats").localCheckpoint(eager=True)
    (
        all_dl.agg(F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl"))
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(f"{path}/stats")
    )
    n_docs = spark.read.parquet(f"{path}/stats").collect()[0]["n_docs"]
    return {"n_new_docs": int(n_new), "n_docs": int(n_docs)}
