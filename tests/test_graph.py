"""Unit tests for operators/graph.py::pagerank — integer-exact
semantics, partitioning invariance, and O(1) lineage per iteration —
and triangle_counts — hand-computed counts, orientation/multiplicity
invariance, and agreement with a brute-force model.
(connected_components is covered in test_plans.py and by the
dedup_clusters recursive-CTE oracle.)
"""

from __future__ import annotations

import itertools

from real_time_data_analytics_cassandra_spark.operators.graph import (
    pagerank,
    triangle_counts,
)


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

def _brute_triangles(pairs):
    """Reference model: per-vertex triangle membership by enumerating
    all vertex triples over the undirected simple graph."""
    es = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    verts = sorted({x for e in es for x in e})
    tri = {v: 0 for v in verts}
    for a, b, c in itertools.combinations(verts, 3):
        if (a, b) in es and (a, c) in es and (b, c) in es:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    deg = {v: sum(1 for e in es if v in e) for v in verts}
    return {v: (deg[v], tri[v]) for v in verts}


def test_triangle_counts_hand_computed(spark):
    """K4 minus one edge: vertices 1-2-3-4, edges all pairs except
    (1,4) — two triangles (1,2,3) and (2,3,4); vertices 1 and 4 sit
    in one each, 2 and 3 in both."""
    pairs = [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)]
    edges = spark.createDataFrame(pairs, "u long, v long")
    got = {
        r.id: (r.deg, r.triangles)
        for r in triangle_counts(edges).collect()
    }
    assert got == {1: (2, 1), 2: (3, 2), 3: (3, 2), 4: (2, 1)}


def test_triangle_counts_orientation_and_multiplicity_invariant(spark):
    """The count is a pure function of the undirected edge SET:
    reversed rows, duplicate rows, self-loops, and any repartitioning
    must not change it."""
    pairs = [
        (1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (3, 5), (5, 1), (2, 5),
    ]
    base_edges = spark.createDataFrame(pairs, "u long, v long")
    base = {
        r.id: (r.deg, r.triangles)
        for r in triangle_counts(base_edges).collect()
    }
    noisy = spark.createDataFrame(
        [(b, a) for a, b in pairs] * 2 + pairs + [(7, 7)],
        "u long, v long",
    ).repartition(5)
    again = {
        r.id: (r.deg, r.triangles)
        for r in triangle_counts(noisy).collect()
    }
    # the self-loop vertex 7 has no real edge, so it must be absent
    assert base == again
    assert _brute_triangles(pairs) == base


def test_triangle_counts_matches_brute_force_random_graph(spark):
    """Deterministic pseudo-random graph (md5-free: fixed congruential
    stream) vs the brute-force triple enumeration."""
    pairs = []
    x = 7
    for _ in range(120):
        x = (x * 1103515245 + 12345) % (2**31)
        a = x % 17
        x = (x * 1103515245 + 12345) % (2**31)
        b = x % 17
        if a != b:
            pairs.append((a, b))
    edges = spark.createDataFrame(pairs, "u long, v long")
    got = {
        r.id: (r.deg, r.triangles)
        for r in triangle_counts(edges).collect()
    }
    assert got == _brute_triangles(pairs)
