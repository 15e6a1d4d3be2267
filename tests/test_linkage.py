"""Unit tests for operators/linkage.py edge behavior (the model-based
equivalence lives in tests/test_properties.py)."""

from __future__ import annotations

from real_time_data_analytics_cassandra_spark.operators.linkage import (
    fuzzy_match_pairs,
    sorted_neighborhood_pairs,
)


def test_fuzzy_match_max_block_drops_degenerate_blocks(spark):
    """A block larger than max_block is dropped entirely (loud
    absence, not a quadratic hang); small blocks still match."""
    rows = [(f"x{i:03d} common",) for i in range(8)] + [
        ("red bolt",),
        ("rod bolt",),
    ]
    df = spark.createDataFrame(rows, "name string")
    out = fuzzy_match_pairs(df, "name", max_distance=3, max_block=4).collect()
    blocks = {r.block for r in out}
    assert "common" not in blocks
    assert {(r.name_a, r.name_b) for r in out} == {("red bolt", "rod bolt")}


def test_sorted_neighborhood_window_bounds_comparisons(spark):
    """Only pairs within `window` sort positions of each other emerge:
    with window=1 the distance-1 chain a->b->c yields adjacent pairs
    only, never (a, c)."""
    df = spark.createDataFrame(
        [("red aaa",), ("red aab",), ("red aac",)], "name string"
    )
    out = sorted_neighborhood_pairs(
        df, "name", window=1, max_distance=3
    ).collect()
    pairs = {(r.name_a, r.name_b) for r in out}
    assert pairs == {("red aaa", "red aab"), ("red aab", "red aac")}
