"""Unit tests for operators/graph.py::pagerank — integer-exact
semantics, partitioning invariance, and O(1) lineage per iteration.
(connected_components is covered in test_plans.py and by the
dedup_clusters recursive-CTE oracle.)
"""

from __future__ import annotations

from real_time_data_analytics_cassandra_spark.operators.graph import pagerank


def _sym(pairs):
    out = []
    for a, b in pairs:
        out.append((a, b))
        out.append((b, a))
    return out


def test_pagerank_hand_computed_path_graph(spark):
    """Path 1-2-3 (symmetrized), 2 iterations, hand-computed in the
    exact integer model: outdeg 1/2/1, base = 150_000_000.

    iter1: s(2)=1e9+1e9, s(1)=s(3)=5e8
      -> r(2)=1_850_000_000, r(1)=r(3)=575_000_000
    iter2: s(2)=2*575_000_000, s(1)=s(3)=1_850_000_000 div 2
      -> r(2)=1_127_500_000, r(1)=r(3)=936_250_000
    """
    edges = spark.createDataFrame(_sym([(1, 2), (2, 3)]), "u long, v long")
    got = {
        r.id: r.rank_micro for r in pagerank(edges, iterations=2).collect()
    }
    assert got == {1: 936_250_000, 2: 1_127_500_000, 3: 936_250_000}


def test_pagerank_partitioning_invariant(spark):
    """BIGINT sums are exact in any order, so the result must be a
    pure function of the edge SET — identical under any repartition
    and under duplicate edge rows (distinct'd inside)."""
    pairs = _sym([(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (5, 1)])
    edges = spark.createDataFrame(pairs, "u long, v long")
    base = {r.id: r.rank_micro for r in pagerank(edges).collect()}
    shuffled = spark.createDataFrame(
        pairs * 3, "u long, v long"
    ).repartition(7)
    again = {r.id: r.rank_micro for r in pagerank(shuffled).collect()}
    assert base == again
    # mass conservation sanity: damped total stays below N*unit
    assert sum(base.values()) <= 5 * 10**9


def test_pagerank_plan_is_o1_not_o_iterations(spark):
    """Same lineage discipline as connected_components: each iteration
    localCheckpoints, so the returned frame plans against materialized
    leaves, not an unrolled O(iterations) join tree."""
    edges = spark.createDataFrame(
        _sym([(i, i + 1) for i in range(10)]), "u long, v long"
    )
    ranks = pagerank(edges, iterations=6)
    plan = ranks._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert plan.count("Exchange") // 2 <= 2, plan[:2000]
