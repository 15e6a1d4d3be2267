"""operators/ranks.py::global_rank — the range-partitioned exact
global rank that replaces unpartitioned row_number windows."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from real_time_data_analytics_cassandra_spark.operators.ranks import (
    global_rank,
)
from real_time_data_analytics_cassandra_spark.plans import explain_str


def _fixture(spark, n=500):
    # non-uniform keys with ties: md5-derived doubles rounded to 2
    # decimals force duplicate sort keys across partition boundaries
    return spark.range(n).select(
        F.col("id"),
        F.round(
            (
                F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 6), 16, 10)
                .cast("long")
                .cast("double")
                / 16777215.0
            ),
            2,
        ).alias("v"),
    )


def test_global_rank_equals_unpartitioned_row_number(spark):
    df = _fixture(spark)
    got = {
        r["id"]: r["rank"]
        for r in global_rank(df, [F.asc("v"), F.asc("id")], num_partitions=7).collect()
    }
    w = Window.orderBy(F.asc("v"), F.asc("id"))
    want = {
        r["id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want


def test_global_rank_desc_and_partition_count_invariance(spark):
    df = _fixture(spark, 300)
    order = [F.desc("v"), F.asc("id")]
    a = {r["id"]: r["rank"] for r in global_rank(df, order, num_partitions=3).collect()}
    b = {r["id"]: r["rank"] for r in global_rank(df, order, num_partitions=13).collect()}
    assert a == b
    assert sorted(a.values()) == list(range(1, 301))


def test_global_rank_plan_has_no_unpartitioned_window(spark):
    """The data-volume sort must be a RANGE exchange + per-partition
    window; the only unpartitioned window sorts the <=n_partitions
    offset rows.  Assert the range exchange exists and the big-side
    window is keyed."""
    df = _fixture(spark)
    # materialize=False: the default eagerly checkpoints the ranged
    # pass, which hides its plan behind a checkpoint scan — the lazy
    # form exposes the full shape for assertion
    out = global_rank(
        df, [F.asc("v"), F.asc("id")], num_partitions=7, materialize=False
    )
    plan = explain_str(out)
    assert "rangepartitioning" in plan.lower(), plan
    # the per-row window is keyed on __pid (its sort spec carries the
    # partition id); offsets ride a broadcast join back
    assert "__pid" in plan, plan
    assert "BroadcastExchange" in plan or "broadcast" in plan.lower(), plan


def test_rrf_fuse_semantics(spark):
    """Both-arm candidates sum two reciprocals, single-arm candidates
    keep one, and the fused ranking orders by score then id."""
    from real_time_data_analytics_cassandra_spark.operators.ranks import rrf_fuse

    lex = spark.createDataFrame(
        [("q1", 10, 1), ("q1", 11, 2), ("q1", 12, 3)],
        "q string, id long, rnk long",
    )
    dense = spark.createDataFrame(
        [("q1", 11, 1), ("q1", 13, 2)], "q string, id long, rnk long"
    )
    out = {
        r["id"]: r
        for r in rrf_fuse(lex, dense, "q", "id", "rnk", k_rrf=60, top_k=10).collect()
    }
    assert out[11]["rrf_score"] == round(1 / 62 + 1 / 61, 6)  # both arms
    assert out[10]["rrf_score"] == round(1 / 61, 6)  # lex only
    assert out[13]["rrf_score"] == round(1 / 62, 6)  # dense only
    assert out[11]["fused_rank"] == 1  # two arms beat any single arm
    assert out[10]["lex_rank"] == 1 and out[10]["dense_rank"] is None
    # tie between 10 (lex rank 1) and 13? 1/61 > 1/62 -> 10 above 13
    assert out[10]["fused_rank"] < out[13]["fused_rank"]


def test_global_cumsum_equals_unpartitioned_running_sum(spark):
    from real_time_data_analytics_cassandra_spark.operators.ranks import (
        global_cumsum,
    )

    df = _fixture(spark).withColumn("w", (F.col("id") % 7 + 1).cast("long"))
    # unique order key: (v, id) — ties in v broken by id, exactly the
    # deterministic total order the registry queries use
    got = {
        r["id"]: (r["cum_w"], r["cum_id2"])
        for r in global_cumsum(
            df.withColumn("id2", F.col("id")),
            [F.asc("v"), F.asc("id")],
            ["w", "id2"],
            num_partitions=7,
        ).collect()
    }
    w = (
        Window.orderBy(F.asc("v"), F.asc("id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        r["id"]: (r["cw"], r["ci"])
        for r in df.withColumn("cw", F.sum("w").over(w))
        .withColumn("ci", F.sum("id").over(w))
        .collect()
    }
    assert got == want


def test_global_cumsum_partition_count_invariance(spark):
    from real_time_data_analytics_cassandra_spark.operators.ranks import (
        global_cumsum,
    )

    df = _fixture(spark, 300).withColumn("w", F.lit(1).cast("long"))
    order = [F.asc("v"), F.asc("id")]
    a = {
        r["id"]: r["cum_w"]
        for r in global_cumsum(df, order, ["w"], num_partitions=3).collect()
    }
    b = {
        r["id"]: r["cum_w"]
        for r in global_cumsum(df, order, ["w"], num_partitions=13).collect()
    }
    assert a == b
    assert sorted(a.values()) == list(range(1, 301))


def test_global_cumsum_single_row_and_column_passthrough(spark):
    """Degenerate shapes: a 1-row frame cumsums to itself, and input
    columns pass through unchanged next to the cum_ columns."""
    from real_time_data_analytics_cassandra_spark.operators.ranks import (
        global_cumsum,
    )

    df = spark.createDataFrame([(7, 3)], "k long, w long")
    out = global_cumsum(df, ["k"], ["w"], num_partitions=4).collect()
    assert [(r.k, r.w, r.cum_w) for r in out] == [(7, 3, 3)]
