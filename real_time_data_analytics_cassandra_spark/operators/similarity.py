"""Similarity search over embedding columns (array<float>).

Training-data-pipeline extension (BASELINE.json north star); the
reference has no vector operations.

Two strategies:
- ``brute_force_topk``: exact cosine top-k.  The query set is small
  and explicitly broadcast, so the corpus (the 100 TB side) is scanned
  once in place with no shuffle of the embeddings themselves; ranking
  shuffles only (query_id, candidate, sim) tuples.  Baseline + oracle.
- ``ivf_topk``: IVF-style approximate search.  A deterministic subset
  of vectors acts as coarse centroids; every vector is assigned to its
  nearest centroid (broadcast centroid table), queries probe the
  ``nprobe`` nearest centroid cells only.  This is the scale path: the
  per-query candidate set shrinks from |corpus| to ~nprobe/|cells|.

All vector math is JVM-side higher-order functions (functions/
vectors.py) — no Python UDF in the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from real_time_data_analytics_cassandra_spark.functions.vectors import cosine_expr


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k neighbours for each query vector.

    Output: (q_vec_id, n_vec_id, sim, rank) — sim rounded to 6dp and
    used (with the neighbour id) as the ranking key so results are
    deterministic under float summation.
    """
    q = queries.select(
        F.col(id_col).alias("q_vec_id"), F.col(vec_col).alias("q_emb")
    )
    c = corpus.select(
        F.col(id_col).alias("n_vec_id"), F.col(vec_col).alias("n_emb")
    )
    scored = (
        c.join(F.broadcast(q), F.col("n_vec_id") != F.col("q_vec_id"))
        .withColumn("sim", F.round(cosine_expr("q_emb", "n_emb"), 6))
    )
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("sim"), F.asc("n_vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_vec_id", "n_vec_id", "sim", "rank")
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, sim) for
    every pair with cosine >= threshold.

    This is the exact all-pairs form (O(n^2) dot products, but linear
    shuffle: the self-join is a broadcast when one side fits, else a
    blocked cartesian — Spark's CartesianProduct streams partitions
    pairwise).  The 100 TB path bounds the pair space first: assign
    vectors to IVF cells (assign_to_centroids) or LSH sign-buckets and
    compare only within cells — same verify expression.
    """
    a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("emb_a"))
    b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("emb_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("sim", F.round(cosine_expr("emb_a", "emb_b"), 6))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def assign_to_centroids(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid assignment: (vec_id, embedding, cell)."""
    cent = centroids.select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("c_emb")
    )
    scored = corpus.join(F.broadcast(cent)).withColumn(
        "c_sim", cosine_expr(vec_col, "c_emb")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("c_sim"), F.asc("cell"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, vec_col, "cell")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    centroid_stride: int = 50,
    nprobe: int = 4,
) -> DataFrame:
    """IVF-lite ANN: probe the nprobe nearest centroid cells per query.

    Centroids are the deterministic subset ``vec_id % centroid_stride
    == 0`` (a real system would k-means; the *plan shape* — broadcast
    centroids, partition-pruned cell scan — is the point here).
    """
    centroids = corpus.filter((F.col(id_col) % centroid_stride) == 0)
    assigned = assign_to_centroids(corpus, centroids, id_col, vec_col)

    q = queries.select(F.col(id_col).alias("q_vec_id"), F.col(vec_col).alias("q_emb"))
    cent = centroids.select(F.col(id_col).alias("cell"), F.col(vec_col).alias("c_emb"))
    qcells = q.join(F.broadcast(cent)).withColumn("c_sim", cosine_expr("q_emb", "c_emb"))
    wq = Window.partitionBy("q_vec_id").orderBy(F.desc("c_sim"), F.asc("cell"))
    probes = (
        qcells.withColumn("__rn", F.row_number().over(wq))
        .filter(F.col("__rn") <= nprobe)
        .select("q_vec_id", "q_emb", "cell")
    )

    cand = assigned.join(
        F.broadcast(probes), ["cell"]
    ).filter(F.col(id_col) != F.col("q_vec_id"))
    scored = cand.withColumn("sim", F.round(cosine_expr("q_emb", vec_col), 6))
    w = Window.partitionBy("q_vec_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_vec_id", F.col(id_col).alias("n_vec_id"), "sim", "rank")
    )
