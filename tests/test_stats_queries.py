"""Invariant gates for the round-8 statistics queries (the exact
value gates live in the oracle parity sweep; these pin the structural
properties a hash compare cannot express)."""

from __future__ import annotations

from real_time_data_analytics_cassandra_spark import queries as q
from tests.conftest import SF_SMOKE


def test_ks_stat_is_a_valid_distance(spark):
    row = q.ks_test_purchase_values(spark, SF_SMOKE).collect()[0]
    assert row.n_a > 0 and row.n_b > 0
    assert 0 <= row.d_num <= row.n_a * row.n_b
    assert 0.0 <= row.ks_stat <= 1.0


def test_source_ks_drift_rows_are_valid_distances(spark):
    rows = q.source_length_ks_drift(spark, SF_SMOKE).collect()
    assert len(rows) >= 2
    n_tot = sum(r.n_docs for r in rows)
    for r in rows:
        assert 0 <= r.d_num <= r.n_docs * (n_tot - r.n_docs)
        assert 0.0 <= r.ks_stat <= 1.0


def test_benford_shares_partition_unity(spark):
    rows = q.value_benford_audit(spark, SF_SMOKE).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    assert sum(r.benford_micro for r in rows) == 1_000_000
    # floor-division shares can undershoot 1e6 by at most 8 (one per
    # truncated digit), never overshoot
    s = sum(r.share_micro for r in rows)
    assert 1_000_000 - 8 <= s <= 1_000_000
    assert all(r.dev_micro == r.share_micro - r.benford_micro for r in rows)


def test_bootstrap_ci_brackets_the_point_estimate(spark):
    row = q.purchase_mean_bootstrap_ci(spark, SF_SMOKE).collect()[0]
    assert row.n_events > 0
    # the bootstrap distribution is centered on the sample mean; with
    # B=100 resamples the nearest-rank 95% CI always brackets it
    assert row.ci_lo <= row.mean_value <= row.ci_hi
    assert row.ci_lo < row.ci_hi


def test_theil_sen_pairs_and_median_are_consistent(spark):
    rows = q.event_hourly_theil_sen(spark, SF_SMOKE).collect()
    assert rows, "every event type has hourly points"
    for r in rows:
        assert r.n_pairs > 0
        assert r.slope_micro is not None


def test_assortativity_is_a_correlation(spark):
    row = q.copurchase_degree_assortativity(spark, SF_SMOKE).collect()[0]
    assert row.n_edges > 0
    assert -1.0 <= row.assortativity <= 1.0


def test_degree_histogram_counts_every_vertex_once(spark):
    hist = q.copurchase_degree_histogram(spark, SF_SMOKE).collect()
    n_vertices = sum(r.n_parts for r in hist)
    # every vertex of the pair graph appears in exactly one bucket
    pairs = q._copurchase_pairs(spark, SF_SMOKE)
    verts = (
        pairs.select("u").union(pairs.select("v")).distinct().count()
    )
    assert n_vertices == verts
    assert all(0 <= r.bucket <= 40 for r in hist)


def test_mannwhitney_matches_bruteforce_rank_sum(spark):
    """The exact 2U statistic must equal a pure-Python O(n_a*n_b)
    recount of #{a>b} pairs (x2) + #{ties} over the SAME arm split —
    an engine-independent recomputation, stronger than an invariant."""
    from real_time_data_analytics_cassandra_spark.operators.sampling import (
        hash_bucket,
    )
    from real_time_data_analytics_cassandra_spark.catalog import table
    from real_time_data_analytics_cassandra_spark.functions.numeric import (
        money,
    )
    from pyspark.sql import functions as F

    row = q.mannwhitney_purchase_values(spark, SF_SMOKE).collect()[0]
    ev = (
        table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            hash_bucket("user_id", 2).alias("arm"),
            money(F.col("value")).alias("v"),
        )
        .collect()
    )
    a = sorted(r.v for r in ev if r.arm == 0)
    b = sorted(r.v for r in ev if r.arm == 1)
    assert (row.n_a, row.n_b) == (len(a), len(b))
    u2 = sum(
        2 if x > y else (1 if x == y else 0) for x in a for y in b
    )
    assert row.u2_a == u2
    assert 0.0 <= row.p_superiority <= 1.0
    # U_a + U_b partitions the pair space
    u2_b = sum(
        2 if y > x else (1 if x == y else 0) for x in a for y in b
    )
    assert u2 + u2_b == 2 * len(a) * len(b)
