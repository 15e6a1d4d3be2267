"""Unit tests for operators/graph.py::pagerank — integer-exact
semantics, partitioning invariance, and O(1) lineage per iteration —
and triangle_counts — hand-computed counts, orientation/multiplicity
invariance, and agreement with a brute-force model.
(connected_components is covered in test_plans.py and by the
dedup_clusters recursive-CTE oracle.)
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from real_time_data_analytics_cassandra_spark.operators.graph import (
    pagerank,
    pagerank_weighted,
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

def _model_pagerank_weighted(wpairs, iterations, unit=10**9):
    """networkx-free reference model of the exact integer semantics:
    symmetrized weighted edges, contribution (r*w) // wout, damped
    update 0.15*unit + (85*s) // 100 — pure Python ints (arbitrary
    precision, so any overflow bug in the operator would diverge)."""
    edges = {}
    for a, b, w in wpairs:
        edges[(a, b)] = w
        edges[(b, a)] = w
    wout = {}
    for (a, _b), w in edges.items():
        wout[a] = wout.get(a, 0) + w
    r = {v: unit for v in wout}
    base = (unit * 15) // 100
    for _ in range(iterations):
        s = {v: 0 for v in wout}
        for (a, b), w in edges.items():
            s[b] += (r[a] * w) // wout[a]
        r = {v: base + (85 * s[v]) // 100 for v in wout}
    return r


def test_pagerank_weighted_matches_python_model(spark):
    """Property gate vs the pure-Python integer model on an irregular
    weighted graph (hub with one heavy edge, a pendant, a triangle)."""
    wpairs = [
        (1, 2, 50),
        (1, 3, 1),
        (2, 3, 7),
        (3, 4, 2),
        (4, 5, 1),
        (2, 5, 3),
    ]
    rows = [(a, b, w) for a, b, w in wpairs] + [
        (b, a, w) for a, b, w in wpairs
    ]
    edges = spark.createDataFrame(rows, "u long, v long, w long")
    for iters in (1, 3, 4):
        got = {
            r.id: r.rank_micro
            for r in pagerank_weighted(edges, iterations=iters).collect()
        }
        assert got == _model_pagerank_weighted(wpairs, iters), iters


def test_pagerank_weighted_uniform_weights_reduce_to_unweighted(spark):
    """w=1 everywhere must reproduce the unweighted operator
    bit-for-bit (wout == outdeg, (r*1) div wout == r div outdeg)."""
    pairs = _sym([(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (5, 1)])
    edges = spark.createDataFrame(pairs, "u long, v long")
    weighted = edges.withColumn("w", F.lit(1).cast("long"))
    base = {r.id: r.rank_micro for r in pagerank(edges).collect()}
    got = {r.id: r.rank_micro for r in pagerank_weighted(weighted).collect()}
    assert got == base


def test_pagerank_weighted_partitioning_invariant(spark):
    """BIGINT arithmetic only — the result is a pure function of the
    weighted edge set, identical under any repartitioning."""
    wpairs = [(1, 2, 9), (2, 3, 4), (3, 1, 2), (3, 4, 30), (4, 5, 1)]
    rows = [(a, b, w) for a, b, w in wpairs] + [
        (b, a, w) for a, b, w in wpairs
    ]
    edges = spark.createDataFrame(rows, "u long, v long, w long")
    base = {r.id: r.rank_micro for r in pagerank_weighted(edges).collect()}
    again = {
        r.id: r.rank_micro
        for r in pagerank_weighted(edges.repartition(7)).collect()
    }
    assert base == again
    assert sum(base.values()) <= 5 * 10**9  # damped mass conservation


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


def _index_rows(spark, path):
    from real_time_data_analytics_cassandra_spark.sinks.snapshots import (
        read_snapshot,
    )

    return {(r.id, r.component) for r in read_snapshot(spark, path).collect()}


@pytest.mark.slow
def test_cluster_index_append_equals_full_rebuild(spark, tmp_path):
    """build(batch1) + append(batch2) must land on exactly the labels
    of one star contraction over batch1 ∪ batch2 — including a merge
    that bridges two pre-existing components and must cascade-relabel
    the losing component's untouched members."""
    from real_time_data_analytics_cassandra_spark.operators.graph import (
        cluster_index_append,
        cluster_index_build,
        connected_components_star,
    )

    path = str(tmp_path / "clusters")
    # two separate components: {1,2,3} and {10,11,12}
    b1 = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12)], ["id_a", "id_b"]
    )
    cluster_index_build(spark, b1, path)
    assert _index_rows(spark, path) == {
        (1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (12, 10),
    }
    # bridge 3-10 (merges the two; members 11, 12 are NOT touched by
    # the batch and must cascade), plus a brand-new component {20,21}
    b2 = spark.createDataFrame([(3, 10), (20, 21)], ["id_a", "id_b"])
    cluster_index_append(spark, path, b2)
    got = _index_rows(spark, path)
    full = {
        (r.id, r.component)
        for r in connected_components_star(
            b1.unionByName(b2)
        ).collect()
    }
    assert got == full
    assert (11, 1) in got and (12, 1) in got  # the cascade itself


@pytest.mark.slow
def test_cluster_index_append_replay_is_content_idempotent(spark, tmp_path):
    """Re-appending a completed batch commits a new version whose
    rows are identical — replays never move any label."""
    from real_time_data_analytics_cassandra_spark.operators.graph import (
        cluster_index_append,
        cluster_index_build,
    )

    path = str(tmp_path / "clusters")
    cluster_index_build(
        spark, spark.createDataFrame([(1, 2), (5, 6)], ["id_a", "id_b"]), path
    )
    batch = spark.createDataFrame([(2, 5), (7, 8)], ["id_a", "id_b"])
    v1 = cluster_index_append(spark, path, batch)
    rows1 = _index_rows(spark, path)
    v2 = cluster_index_append(spark, path, batch)
    rows2 = _index_rows(spark, path)
    assert v2 == v1 + 1
    assert rows1 == rows2 == {
        (1, 1), (2, 1), (5, 1), (6, 1), (7, 7), (8, 7),
    }


@pytest.mark.slow
def test_cluster_index_random_splits_match_union_find(spark, tmp_path):
    """Any split of a random pair set into build + append must end at
    the union-find ground truth."""
    import random

    from real_time_data_analytics_cassandra_spark.operators.graph import (
        cluster_index_append,
        cluster_index_build,
    )

    rng = random.Random(42)
    for trial in range(3):
        pairs = [
            (rng.randrange(20), rng.randrange(20)) for _ in range(15)
        ]
        pairs = [(a, b) for a, b in pairs if a != b] or [(0, 1)]
        cut = rng.randrange(1, len(pairs) + 1)
        path = str(tmp_path / f"clusters_{trial}")
        cluster_index_build(
            spark, spark.createDataFrame(pairs[:cut], ["id_a", "id_b"]), path
        )
        if pairs[cut:]:
            cluster_index_append(
                spark,
                path,
                spark.createDataFrame(pairs[cut:], ["id_a", "id_b"]),
            )
        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        expected = {(n, find(n)) for n in parent}
        assert _index_rows(spark, path) == expected, (trial, pairs, cut)


@pytest.mark.slow
def test_cluster_index_append_empty_batch_is_noop_on_values(spark, tmp_path):
    """An empty pair batch must leave every label unchanged (the
    degenerate replay/quiet-crawl-slice case)."""
    from real_time_data_analytics_cassandra_spark.operators.graph import (
        cluster_index_append,
        cluster_index_build,
    )

    path = str(tmp_path / "clusters")
    cluster_index_build(
        spark, spark.createDataFrame([(1, 2)], ["id_a", "id_b"]), path
    )
    before = _index_rows(spark, path)
    cluster_index_append(
        spark,
        path,
        spark.createDataFrame([], "id_a long, id_b long"),
    )
    assert _index_rows(spark, path) == before == {(1, 1), (2, 1)}


@pytest.mark.slow
def test_star_components_raises_on_round_exhaustion(spark):
    """Exhausting max_rounds without reaching the small-star fixpoint
    must raise, not silently return unconverged (= wrong) labels that
    cluster_index_build would then persist."""
    from real_time_data_analytics_cassandra_spark.operators.graph import (
        connected_components_star,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="max_rounds"):
        connected_components_star(chain, max_rounds=1).collect()
    # an adequate budget on the same graph converges to one component
    labels = {
        (r.id, r.component)
        for r in connected_components_star(chain).collect()
    }
    assert labels == {(i, 0) for i in range(61)}


def test_triangle_counts_has_no_forced_broadcast_hint(spark):
    """The degree table derives from the (unbounded) input edge set —
    a forced broadcast hint would OOM on a billion-vertex graph.  The
    analyzed plan must carry NO broadcast hint; AQE alone decides."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], ["u", "v"]
    )
    df = triangle_counts(edges)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, analyzed
    assert "UnresolvedHint" not in analyzed, analyzed


def test_k_core_hand_computed_and_invariance(spark):
    """Triangle {1,2,3} with pendant chain 3-4-5: the 2-core is
    exactly the triangle (the chain peels over two rounds); output is
    invariant to edge orientation and duplicates."""
    from real_time_data_analytics_cassandra_spark.operators.graph import (
        k_core,
    )

    base = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    noisy = base + [(b, a) for a, b in base] + base  # flipped + dupes
    for pairs in (base, noisy):
        edges = spark.createDataFrame(pairs, ["u", "v"])
        got = {
            (r.id, r.core_deg) for r in k_core(edges, 2, "u", "v").collect()
        }
        assert got == {(1, 2), (2, 2), (3, 2)}
    # k above the max degree peels everything
    edges = spark.createDataFrame(base, ["u", "v"])
    assert k_core(edges, 5, "u", "v").count() == 0


@pytest.mark.slow
def test_k_core_raises_on_round_exhaustion(spark):
    """A long pendant chain needs one round per link — an undersized
    round budget must raise, not return an unconverged subgraph."""
    from real_time_data_analytics_cassandra_spark.operators.graph import (
        k_core,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], ["u", "v"]
    )
    with pytest.raises(RuntimeError, match="max_rounds"):
        k_core(chain, 2, "u", "v", max_rounds=2)
    # an adequate budget peels the whole chain away (a path has no
    # 2-core)
    assert k_core(chain, 2, "u", "v", max_rounds=16).count() == 0
    # boundary: max_rounds counts PEELS and the degree check runs
    # once more after the final peel, so a graph needing EXACTLY
    # max_rounds peels converges (the 11-vertex path needs 5: edge
    # counts 10 -> 8 -> 6 -> 4 -> 2 -> 0).  An oracle unrolled to N
    # rounds therefore pairs with max_rounds=N, not N+1.
    assert k_core(chain, 2, "u", "v", max_rounds=5).count() == 0
    with pytest.raises(RuntimeError, match="max_rounds"):
        k_core(chain, 2, "u", "v", max_rounds=4)


def test_copurchase_fixture_matches_direct_self_join(spark):
    """Fixture-integrity gate: the persisted co-purchase pair counts
    must equal the direct per-order self-join recomputed from
    lineitem — a stale or corrupted cache would silently skew all
    four part-graph queries."""
    from real_time_data_analytics_cassandra_spark import queries as q
    from real_time_data_analytics_cassandra_spark.catalog import table
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    fixture = {
        (r.u, r.v, r.n_orders)
        for r in q._copurchase_pairs(spark, SF_SMOKE).collect()
    }
    op = table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    direct = {
        (r.u, r.v, r.n)
        for r in op.select(F.col("l_orderkey"), F.col("l_partkey").alias("u"))
        .join(
            op.select(F.col("l_orderkey"), F.col("l_partkey").alias("v")),
            "l_orderkey",
        )
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .collect()
    }
    assert fixture == direct


@pytest.mark.slow
def test_k_core_matches_brute_force_random_graphs(spark):
    """Deterministic pseudo-random graphs vs a pure-Python peel for
    several k — the distributed fixpoint must equal the sequential
    model exactly, including core degrees."""
    from real_time_data_analytics_cassandra_spark.operators.graph import (
        k_core,
    )

    def brute_kcore(pairs, k):
        es = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
        while True:
            deg: dict = {}
            for a, b in es:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            bad = {v for v, d in deg.items() if d < k}
            if not bad:
                return {(v, d) for v, d in deg.items()}
            es = {e for e in es if e[0] not in bad and e[1] not in bad}

    x = 11
    pairs = []
    for _ in range(90):
        x = (x * 1103515245 + 12345) % (2**31)
        a = x % 23
        x = (x * 1103515245 + 12345) % (2**31)
        b = x % 23
        if a != b:
            pairs.append((a, b))
    edges = spark.createDataFrame(pairs, ["u", "v"])
    for k in (2, 3, 5):
        got = {
            (r.id, r.core_deg)
            for r in k_core(edges, k, "u", "v", max_rounds=30).collect()
        }
        assert got == brute_kcore(pairs, k), k


@pytest.mark.slow
def test_core_decomposition_matches_brute_force_random_graphs(spark):
    """The h-index fixpoint must equal the SEQUENTIAL min-degree peel
    coreness (the textbook definition) on deterministic pseudo-random
    graphs, and stay consistent with k_core membership: the vertices
    with coreness >= k are exactly the k-core."""
    from real_time_data_analytics_cassandra_spark.operators.graph import (
        core_decomposition,
        k_core,
    )

    def brute_coreness(pairs):
        es = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
        adj: dict = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        core, deg = {}, {v: len(ns) for v, ns in adj.items()}
        alive = set(adj)
        while alive:
            v = min(alive, key=lambda n: (deg[n], n))
            core[v] = max(deg[v], core.get(v, 0))
            # sequential peel: coreness(v) = max degree seen when
            # removed, propagated monotonically
            kv = core[v]
            alive.discard(v)
            for m in adj[v]:
                if m in alive:
                    deg[m] -= 1
                    adj[m].discard(v)
                    if deg[m] < kv:
                        deg[m] = kv  # never below current level
            adj[v] = set()
        return core

    for seed, nv, ne in ((7, 19, 70), (41, 29, 140), (97, 13, 25)):
        x = seed
        pairs = []
        for _ in range(ne):
            x = (x * 1103515245 + 12345) % (2**31)
            a = x % nv
            x = (x * 1103515245 + 12345) % (2**31)
            b = x % nv
            if a != b:
                pairs.append((a, b))
        edges = spark.createDataFrame(pairs, ["u", "v"])
        got = {
            (r.id, r.coreness)
            for r in core_decomposition(edges, "u", "v").collect()
        }
        want = set(brute_coreness(pairs).items())
        assert got == want, (seed, sorted(got ^ want))
        # cross-operator consistency at one k
        k = 1 + max(c for _, c in want) // 2
        in_core = {r.id for r in k_core(edges, k, "u", "v").collect()}
        assert in_core == {v for v, c in want if c >= k}, (seed, k)


@pytest.mark.slow
def test_core_decomposition_raises_on_round_exhaustion(spark):
    from real_time_data_analytics_cassandra_spark.operators.graph import (
        core_decomposition,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["u", "v"]
    )
    with pytest.raises(RuntimeError, match="max_rounds"):
        core_decomposition(chain, "u", "v", max_rounds=1)
    got = {
        (r.id, r.coreness)
        for r in core_decomposition(chain, "u", "v").collect()
    }
    assert got == {(i, 1) for i in range(31)}  # a path is all 1-core


def test_common_neighbor_counts_match_brute_force_random_graph(spark):
    """Capped common-neighbor counts vs a brute-force Python recount
    on a deterministic pseudo-random graph, at a cap that actually
    excludes some centers (hub_cap=3 on a 17-vertex graph) and at one
    that excludes none."""
    from real_time_data_analytics_cassandra_spark.operators.graph import (
        common_neighbor_counts,
    )

    pairs = []
    x = 11
    for _ in range(90):
        x = (x * 1103515245 + 12345) % (2**31)
        a = x % 17
        x = (x * 1103515245 + 12345) % (2**31)
        b = x % 17
        if a != b:
            pairs.append((a, b))
    edges = spark.createDataFrame(pairs, "u long, v long")

    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for cap in (3, 10_000):
        centers = {n for n, nb in adj.items() if len(nb) <= cap}
        expect: dict[tuple[int, int], int] = {}
        for c in centers:
            nb = sorted(adj[c])
            for i in range(len(nb)):
                for j in range(i + 1, len(nb)):
                    k = (nb[i], nb[j])
                    expect[k] = expect.get(k, 0) + 1
        got = {
            (r.u, r.v): r.cn
            for r in common_neighbor_counts(
                edges, hub_cap=cap
            ).collect()
        }
        assert got == expect, f"cap={cap}"


def _brute_bfs(pairs, sources, max_hops):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in sources}
    frontier = set(sources)
    for h in range(1, max_hops + 1):
        nxt = set()
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in dist:
                    dist[m] = h
                    nxt.add(m)
        frontier = nxt
        if not frontier:
            break
    return dist


@pytest.mark.slow
def test_bfs_hops_matches_brute_force_random_graph(spark):
    """bfs_hops vs a Python BFS on a deterministic pseudo-random
    graph with TWO components, from one and from two sources, at a
    bound that truncates and one that doesn't."""
    from real_time_data_analytics_cassandra_spark.operators.graph import (
        bfs_hops,
    )

    pairs = []
    x = 5
    for _ in range(40):
        x = (x * 1103515245 + 12345) % (2**31)
        a = x % 12
        x = (x * 1103515245 + 12345) % (2**31)
        b = x % 12
        if a != b:
            pairs.append((a, b))
    # second component, disjoint ids 100.. — a path so hops go deep
    pairs += [(100, 101), (101, 102), (102, 103), (103, 104)]
    edges = spark.createDataFrame(pairs, "u long, v long")
    for srcs, cap in [([100], 12), ([100], 2), ([0, 100], 3)]:
        sources = spark.createDataFrame(
            [(s,) for s in srcs], "id long"
        )
        got = {
            r.id: r.hops
            for r in bfs_hops(edges, sources, max_hops=cap).collect()
        }
        assert got == _brute_bfs(pairs, srcs, cap), (srcs, cap)


def _brute_bellman_ford(wpairs, sources, rounds):
    """Pure-Python synchronous bounded Bellman-Ford: exact min cost
    over paths of <= rounds edges (the textbook DP, full relaxation
    every round — the frontier form must land on identical labels)."""
    adj: dict[int, list[tuple[int, int]]] = {}
    for a, b, w in wpairs:
        if a == b:
            continue
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    dist = {s: 0 for s in sources}
    for _ in range(rounds):
        new = dict(dist)
        for n, c in dist.items():
            for m, w in adj.get(n, ()):
                if m not in new or c + w < new[m]:
                    new[m] = c + w
        dist = new
    return dist


@pytest.mark.slow
def test_bellman_ford_bounded_matches_brute_force_random_graph(spark):
    """bellman_ford_bounded vs the pure-Python DP on deterministic
    pseudo-random weighted graphs (parallel edges with differing
    weights included), at a round bound that truncates and one that
    saturates, from one and two sources — and the bound semantics:
    where a cheap long path beats an expensive short one, the
    truncated bound must report the short one's cost."""
    from real_time_data_analytics_cassandra_spark.operators.graph import (
        bellman_ford_bounded,
    )

    wpairs = []
    x = 11
    for _ in range(60):
        x = (x * 1103515245 + 12345) % (2**31)
        a = x % 14
        x = (x * 1103515245 + 12345) % (2**31)
        b = x % 14
        x = (x * 1103515245 + 12345) % (2**31)
        w = 1 + x % 9
        if a != b:
            wpairs.append((a, b, w))
    # a disjoint weighted path: forces deep relaxation + truncation
    wpairs += [(100, 101, 5), (101, 102, 5), (102, 103, 5),
               (103, 104, 5), (100, 104, 100)]
    edges = spark.createDataFrame(wpairs, "u long, v long, w long")
    for srcs, rounds in [([100], 8), ([100], 2), ([0, 100], 3)]:
        sources = spark.createDataFrame([(s,) for s in srcs], "id long")
        got = {
            r.id: r.cost
            for r in bellman_ford_bounded(
                edges, sources, rounds=rounds
            ).collect()
        }
        assert got == _brute_bellman_ford(wpairs, srcs, rounds), (
            srcs, rounds,
        )
    # truncation semantics pinned: at 1 round the direct heavy edge
    # wins; at 4+ the cheap chain replaces it
    one = {r.id: r.cost for r in bellman_ford_bounded(
        edges, spark.createDataFrame([(100,)], "id long"), rounds=1
    ).collect()}
    full = {r.id: r.cost for r in bellman_ford_bounded(
        edges, spark.createDataFrame([(100,)], "id long"), rounds=4
    ).collect()}
    assert one[104] == 100 and full[104] == 20


def test_multi_source_bfs_matches_per_seed_python_bfs(spark):
    """multi_source_bfs_hops must equal s independent pure-Python
    BFS runs on a deterministic pseudo-random graph (a multi-source
    frontier bug — e.g. cross-seed dedup — would merge balls)."""
    from real_time_data_analytics_cassandra_spark.operators.graph import (
        multi_source_bfs_hops,
    )

    pairs = []
    x = 23
    for _ in range(50):
        x = (x * 1103515245 + 12345) % (2**31)
        a = x % 13
        x = (x * 1103515245 + 12345) % (2**31)
        b = x % 13
        if a != b:
            pairs.append((a, b))
    pairs += [(200, 201), (201, 202), (202, 203)]
    edges = spark.createDataFrame(pairs, "u long, v long")
    seed_ids = [0, 5, 200]
    seeds = spark.createDataFrame([(s,) for s in seed_ids], "id long")
    got = {
        (r.seed, r.id): r.hops
        for r in multi_source_bfs_hops(edges, seeds, max_hops=4).collect()
    }
    want = {}
    for s in seed_ids:
        for node, h in _brute_bfs(pairs, [s], 4).items():
            want[(s, node)] = h
    assert got == want


def test_harmonic_centrality_matches_pure_python(spark):
    """copurchase_harmonic_centrality at the smoke SF vs a complete
    pure-Python rederivation: pair counts from the parquet, the
    md5-ordered seed sample, per-seed BFS, integer harmonic fold."""
    import hashlib
    import itertools

    from real_time_data_analytics_cassandra_spark import queries as q
    from tests.conftest import SF_ORACLE

    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    op = {(r.l_orderkey, r.l_partkey)
          for r in li.select("l_orderkey", "l_partkey").collect()}
    by_order: dict[int, list[int]] = {}
    for o, p in sorted(op):
        by_order.setdefault(o, []).append(p)
    from collections import Counter
    pair_orders: Counter = Counter()
    for parts in by_order.values():
        for u, v in itertools.combinations(sorted(set(parts)), 2):
            pair_orders[(u, v)] += 1
    edges = [(u, v) for (u, v), n in pair_orders.items() if n >= 2]
    ids = sorted({x for e in edges for x in e})
    seeds = sorted(
        ids,
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
    )[:8]
    agg: dict[int, list[int]] = {}
    for s in seeds:
        for node, h in _brute_bfs(edges, [s], 8).items():
            if h >= 1:
                agg.setdefault(node, []).append(h)
    want = {
        node: (len(hs), sum(27720 // h for h in hs))
        for node, hs in agg.items()
    }
    got = {
        r.id: (r.n_seeds, r.harmonic_units)
        for r in q.copurchase_harmonic_centrality(
            spark, SF_ORACLE
        ).collect()
    }
    assert got == want


def _model_pagerank_personalized(pairs, seeds, iterations, unit=10**9):
    """Pure-Python integer model of the seed-teleport semantics:
    symmetrized unweighted edges, contribution r // outdeg, update
    t*base + (85*s) // 100 with rank seeded at t*unit."""
    adj = set()
    for a, b in pairs:
        adj.add((a, b))
        adj.add((b, a))
    outdeg = {}
    for a, _b in adj:
        outdeg[a] = outdeg.get(a, 0) + 1
    t = {v: (1 if v in seeds else 0) for v in outdeg}
    r = {v: t[v] * unit for v in outdeg}
    base = (unit * 15) // 100
    for _ in range(iterations):
        s = {v: 0 for v in outdeg}
        for a, b in adj:
            s[b] += r[a] // outdeg[a]
        r = {v: t[v] * base + (85 * s[v]) // 100 for v in outdeg}
    return r


def test_pagerank_personalized_matches_python_model(spark):
    """Property gate vs the pure-Python integer model: single seed
    and multi-seed, on an irregular graph with a pendant chain (so
    mass decays with distance from the seed — the property the
    operator exists for)."""
    from real_time_data_analytics_cassandra_spark.operators.graph import (
        pagerank_personalized,
    )

    pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (4, 5), (5, 6)]
    rows = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    edges = spark.createDataFrame(rows, "u long, v long")
    for seeds, iters in [([1], 1), ([1], 4), ([1, 6], 3)]:
        seed_df = spark.createDataFrame([(s,) for s in seeds], "id long")
        got = {
            r.id: r.rank_micro
            for r in pagerank_personalized(
                edges, seed_df, iterations=iters
            ).collect()
        }
        assert got == _model_pagerank_personalized(
            pairs, set(seeds), iters
        ), (seeds, iters)
    # proximity property: rank decays along the pendant chain
    seed_df = spark.createDataFrame([(1,)], "id long")
    r = {
        x.id: x.rank_micro
        for x in pagerank_personalized(edges, seed_df, iterations=4).collect()
    }
    assert r[1] > r[4] > r[5] > r[6]


def test_seed_eccentricity_matches_pure_python(spark):
    """copurchase_seed_eccentricity at the smoke SF vs the complete
    pure-Python rederivation (same seed sample and BFS as the
    harmonic gate, aggregated per seed) — and max(ecc_lb) really is
    a diameter lower bound on the seed-reachable subgraph."""
    import hashlib
    import itertools

    from collections import Counter

    from real_time_data_analytics_cassandra_spark import queries as q
    from tests.conftest import SF_ORACLE

    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    op = {(r.l_orderkey, r.l_partkey)
          for r in li.select("l_orderkey", "l_partkey").collect()}
    by_order: dict[int, list[int]] = {}
    for o, p in sorted(op):
        by_order.setdefault(o, []).append(p)
    pair_orders: Counter = Counter()
    for parts in by_order.values():
        for u, v in itertools.combinations(sorted(set(parts)), 2):
            pair_orders[(u, v)] += 1
    edges = [(u, v) for (u, v), n in pair_orders.items() if n >= 2]
    ids = sorted({x for e in edges for x in e})
    seeds = sorted(
        ids,
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
    )[:8]
    want = {}
    for s in seeds:
        d = _brute_bfs(edges, [s], 8)
        want[s] = (max(d.values()), len(d) - 1)
    got = {
        r.seed: (r.ecc_lb, r.n_reached)
        for r in q.copurchase_seed_eccentricity(spark, SF_ORACLE).collect()
    }
    assert got == want


def test_affinity_triples_match_naive_enumeration(spark):
    """The A-priori pruned frequent-triple mine must equal the naive
    per-order triple enumeration at the smoke SF (downward closure is
    lossless: every frequent triple's sub-pairs are frequent) — a
    pure-Python recount from the raw (order, part) pairs."""
    import itertools
    from collections import Counter

    from real_time_data_analytics_cassandra_spark import queries as q
    from tests.conftest import SF_ORACLE

    li = spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet")
    op = {(r.l_orderkey, r.l_partkey)
          for r in li.select("l_orderkey", "l_partkey").collect()}
    by_order: dict[int, set[int]] = {}
    for o, p in op:
        by_order.setdefault(o, set()).add(p)
    sup: Counter = Counter()
    for parts in by_order.values():
        for tri in itertools.combinations(sorted(parts), 3):
            sup[tri] += 1
    want = {tri: n for tri, n in sup.items() if n >= 2}
    got = {
        (r.p_a, r.p_b, r.p_c): r.n_orders
        for r in q.part_affinity_triples(spark, SF_ORACLE).collect()
    }
    assert got == want


@pytest.mark.slow
def test_bellman_ford_unit_weights_reduce_to_bfs_hops(spark):
    """With w=1 everywhere, bounded Bellman-Ford must reproduce
    bfs_hops exactly (cost == hop count, same reached set at the same
    bound) — the cross-operator consistency gate tying the weighted
    and unweighted traversals together."""
    from real_time_data_analytics_cassandra_spark.operators.graph import (
        bellman_ford_bounded,
        bfs_hops,
    )

    pairs = []
    x = 77
    for _ in range(45):
        x = (x * 1103515245 + 12345) % (2**31)
        a = x % 15
        x = (x * 1103515245 + 12345) % (2**31)
        b = x % 15
        if a != b:
            pairs.append((a, b))
    edges = spark.createDataFrame(pairs, "u long, v long")
    weighted = edges.withColumn("w", F.lit(1).cast("long"))
    sources = spark.createDataFrame([(0,)], "id long")
    for bound in (2, 6):
        hops = {
            r.id: r.hops
            for r in bfs_hops(edges, sources, max_hops=bound).collect()
        }
        cost = {
            r.id: r.cost
            for r in bellman_ford_bounded(
                weighted, sources, rounds=bound
            ).collect()
        }
        assert cost == hops, bound


def test_multi_source_bfs_single_seed_reduces_to_bfs_hops(spark):
    """A one-seed multi-source traversal must equal bfs_hops from
    that seed bit-for-bit."""
    from real_time_data_analytics_cassandra_spark.operators.graph import (
        bfs_hops,
        multi_source_bfs_hops,
    )

    pairs = [(1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (7, 8)]
    edges = spark.createDataFrame(pairs, "u long, v long")
    seeds = spark.createDataFrame([(1,)], "id long")
    single = {
        r.id: r.hops for r in bfs_hops(edges, seeds, max_hops=5).collect()
    }
    multi = {
        r.id: r.hops
        for r in multi_source_bfs_hops(edges, seeds, max_hops=5).collect()
    }
    assert multi == single


def test_pagerank_personalized_all_seeds_reduces_to_uniform(spark):
    """Seeding EVERY vertex must reproduce the uniform operator
    bit-for-bit (t=1 everywhere makes the init and teleport terms
    identical to pagerank's) — the boundary-condition gate that pins
    the teleport algebra."""
    from real_time_data_analytics_cassandra_spark.operators.graph import (
        pagerank,
        pagerank_personalized,
    )

    pairs = _sym([(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 1)])
    edges = spark.createDataFrame(pairs, "u long, v long")
    all_nodes = spark.createDataFrame(
        [(i,) for i in range(1, 6)], "id long"
    )
    base = {r.id: r.rank_micro for r in pagerank(edges, iterations=3).collect()}
    got = {
        r.id: r.rank_micro
        for r in pagerank_personalized(
            edges, all_nodes, iterations=3
        ).collect()
    }
    assert got == base
