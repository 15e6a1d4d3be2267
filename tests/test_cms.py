"""Count-min sketch guarantees (operators/sketches.py::cms_*):
overestimate-only, bounded error, exact mergeability, partition
invariance.  The registry gate (cms_token_counts) separately proves
the md5 hash family is engine-portable via a full DuckDB oracle."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from real_time_data_analytics_cassandra_spark.catalog import spread, table
from real_time_data_analytics_cassandra_spark.functions.textfns import tokens
from real_time_data_analytics_cassandra_spark.operators.sketches import (
    cms_estimate,
    cms_merge,
    cms_sketch,
)
from tests.conftest import SF_SMOKE

WIDTH, DEPTH = 2048, 4


def _tok(spark):
    docs = table(spark, SF_SMOKE, "documents")
    return spread(docs).select(F.explode(tokens(F.col("text"))).alias("term"))


def _exact(tok):
    return {
        r["term"]: r["n"]
        for r in tok.groupBy("term").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_cms_overestimates_within_bound(spark):
    tok = _tok(spark)
    exact = _exact(tok)
    n = sum(exact.values())
    sketch = cms_sketch(tok, "term", WIDTH, DEPTH)
    est = {
        r["value"]: r["est_count"]
        for r in cms_estimate(sketch, tok, "term", WIDTH, DEPTH).collect()
    }
    assert set(est) == set(exact)
    # guarantee 1: never underestimates
    assert all(est[v] >= c for v, c in exact.items())
    # guarantee 2: the classic eN/width bound holds for the vast
    # majority of values (per-value it is probabilistic at e^-depth)
    bound = math.e * n / WIDTH
    bad = sum(1 for v, c in exact.items() if est[v] - c > bound)
    assert bad / len(exact) <= math.exp(-DEPTH) + 0.02, (bad, len(exact))


def test_cms_merge_is_exact(spark):
    tok = _tok(spark)
    full = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_sketch(tok, "term", WIDTH, DEPTH).collect()
    }
    half_a = tok.filter(F.crc32(F.col("term")) % 2 == 0)
    half_b = tok.filter(F.crc32(F.col("term")) % 2 == 1)
    merged = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_merge(
            cms_sketch(half_a, "term", WIDTH, DEPTH),
            cms_sketch(half_b, "term", WIDTH, DEPTH),
        ).collect()
    }
    assert merged == full


def test_cms_partition_invariant(spark):
    tok = _tok(spark)
    a = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_sketch(tok, "term", WIDTH, DEPTH).collect()
    }
    b = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_sketch(tok.repartition(7), "term", WIDTH, DEPTH).collect()
    }
    assert a == b


def test_cms_sketch_tagged_matches_per_column_sketches(spark):
    """r13: the single-scan multi-column sketch builder must produce,
    per tagged slice, exactly the sketch cms_sketch builds from its
    own dedicated scan (join_size_estimate_cms relies on this to cut
    its two lineitem passes to one)."""
    from real_time_data_analytics_cassandra_spark.operators.sketches import (
        cms_sketch_tagged,
    )

    li = table(spark, SF_SMOKE, "lineitem")
    tagged = cms_sketch_tagged(
        li.select("l_partkey", "l_orderkey"),
        ["l_partkey", "l_orderkey"],
        WIDTH,
        DEPTH,
    )
    got = {
        col: {
            (r["row"], r["bucket"]): r["cnt"]
            for r in tagged.filter(F.col("tag") == col).collect()
        }
        for col in ("l_partkey", "l_orderkey")
    }
    for col in ("l_partkey", "l_orderkey"):
        solo = {
            (r["row"], r["bucket"]): r["cnt"]
            for r in cms_sketch(li.select(col), col, WIDTH, DEPTH).collect()
        }
        assert got[col] == solo, col


def test_cms_unseen_value_estimates_via_left_join(spark):
    tok = _tok(spark)
    sketch = cms_sketch(tok, "term", WIDTH, DEPTH)
    unseen = spark.createDataFrame(
        [("zz-never-in-corpus-zz",)], "term string"
    )
    [row] = cms_estimate(sketch, unseen, "term", WIDTH, DEPTH).collect()
    # an unseen value can still collide into non-empty counters, but
    # the estimate must be defined (no dropped row) and >= 0
    assert row["est_count"] >= 0
