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


def test_acf_matches_bruteforce_series_recompute(spark):
    """Every lag's r_k must equal a pure-Python Fraction recompute of
    the zero-filled centered series (n-scaled integer centering), and
    lag 0 of that model must be exactly 1 — an engine-independent
    recomputation of the whole readout."""
    from fractions import Fraction

    from pyspark.sql import functions as F

    from real_time_data_analytics_cassandra_spark.catalog import table

    rows = q.hourly_count_acf(spark, SF_SMOKE).collect()
    assert rows and [r.lag for r in rows] == list(
        range(1, len(rows) + 1)
    )
    hours = (
        table(spark, SF_SMOKE, "events")
        .select(F.expr("unix_micros(ts) div 1000000 div 3600").alias("h"))
        .groupBy("h")
        .count()
        .collect()
    )
    counts = {r.h: r["count"] for r in hours}
    lo, hi = min(counts), max(counts)
    y = [counts.get(h, 0) for h in range(lo, hi + 1)]
    n, s = len(y), sum(y)
    xs = [n * v - s for v in y]
    den = sum(v * v for v in xs)
    assert all(r.n_hours == n for r in rows)
    for r in rows:
        num = sum(
            xs[t] * xs[t + r.lag] for t in range(n - r.lag)
        )
        expect = round(float(Fraction(num, den)), 6) if den else None
        assert r.acf == expect, (r.lag, r.acf, expect)
        if r.acf is not None:
            # |r_k| can slightly exceed 1 only via the biased
            # estimator on tiny series; sanity bound
            assert -1.5 < r.acf < 1.5


def test_mann_kendall_matches_bruteforce_pair_recount(spark):
    """S, the tie-corrected 18*Var(S), and tau_a must equal a
    pure-Python recount over the same per-type hourly series."""
    from collections import Counter

    from pyspark.sql import functions as F

    from real_time_data_analytics_cassandra_spark.catalog import table

    rows = {
        r.event_type: r
        for r in q.event_hourly_mann_kendall(spark, SF_SMOKE).collect()
    }
    hourly = (
        table(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.expr("unix_micros(ts) div 1000000 div 3600").alias("h"),
        )
        .groupBy("event_type", "h")
        .count()
        .collect()
    )
    series: dict[str, list[tuple[int, int]]] = {}
    for r in hourly:
        series.setdefault(r.event_type, []).append((r.h, r["count"]))
    assert set(series) == set(rows)
    for et, pts in series.items():
        pts.sort()
        ys = [y for _, y in pts]
        n = len(ys)
        s = sum(
            (ys[j] > ys[i]) - (ys[j] < ys[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        tie = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(ys).values()
        )
        r = rows[et]
        assert (r.n_hours, r.s_stat) == (n, s)
        assert r.var_s_x18 == n * (n - 1) * (2 * n + 5) - tie
        expect_tau = (
            None if n < 2 else round(s / (n * (n - 1) / 2.0), 6)
        )
        assert r.tau_a == expect_tau
        if r.tau_a is not None:
            assert -1.0 <= r.tau_a <= 1.0


def test_spearman_matrix_matches_bruteforce_midranks(spark):
    """Every pair's rho must equal a pure-Python midrank + Pearson
    recompute over the same zero-filled (hour x type) grid."""
    import math

    from pyspark.sql import functions as F

    from real_time_data_analytics_cassandra_spark.catalog import table

    got = {
        (r.type_a, r.type_b): (r.n_hours, r.rho)
        for r in q.hourly_spearman_matrix(spark, SF_SMOKE).collect()
    }
    rows = (
        table(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.expr("unix_micros(ts) div 1000000 div 3600").alias("h"),
        )
        .groupBy("event_type", "h")
        .count()
        .collect()
    )
    counts: dict[str, dict[int, int]] = {}
    hours: set[int] = set()
    for r in rows:
        counts.setdefault(r.event_type, {})[r.h] = r["count"]
        hours.add(r.h)
    hs = sorted(hours)

    def midranks2(series):
        out = []
        svals = sorted(series)
        for v in series:
            below = sum(1 for x in svals if x < v)
            t = sum(1 for x in svals if x == v)
            out.append(2 * below + t + 1)
        return out

    ranks = {
        et: midranks2([counts[et].get(h, 0) for h in hs])
        for et in counts
    }
    types = sorted(counts)
    n = len(hs)
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            ra, rb = ranks[types[i]], ranks[types[j]]
            sa, sb = sum(ra), sum(rb)
            saa = sum(x * x for x in ra)
            sbb = sum(x * x for x in rb)
            sab = sum(x * y for x, y in zip(ra, rb))
            da, db = n * saa - sa * sa, n * sbb - sb * sb
            expect = (
                None
                if da == 0 or db == 0
                else round(
                    (n * sab - sa * sb) / (math.sqrt(da) * math.sqrt(db)),
                    6,
                )
            )
            g_n, g_rho = got[(types[i], types[j])]
            assert g_n == n
            assert g_rho == expect, (types[i], types[j], g_rho, expect)
            if g_rho is not None:
                assert -1.0 <= g_rho <= 1.0


def test_dispersion_index_matches_bruteforce(spark):
    """Each type's VMR must equal the Fraction recompute over the
    zero-filled global hour spine."""
    from fractions import Fraction

    from pyspark.sql import functions as F

    from real_time_data_analytics_cassandra_spark.catalog import table

    got = {
        r.event_type: r
        for r in q.hourly_dispersion_index(spark, SF_SMOKE).collect()
    }
    rows = (
        table(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.expr("unix_micros(ts) div 1000000 div 3600").alias("h"),
        )
        .groupBy("event_type", "h")
        .count()
        .collect()
    )
    counts: dict[str, dict[int, int]] = {}
    hours: set[int] = set()
    for r in rows:
        counts.setdefault(r.event_type, {})[r.h] = r["count"]
        hours.add(r.h)
    for et, per in counts.items():
        ys = [per.get(h, 0) for h in sorted(hours)]
        n, s, syy = len(ys), sum(ys), sum(y * y for y in ys)
        r = got[et]
        assert (r.n_hours, r.n_events) == (n, s)
        expect = (
            None
            if s == 0
            else round(float(Fraction(n * syy - s * s, n * s)), 6)
        )
        assert r.vmr == expect
        assert r.vmr is None or r.vmr >= 0.0


def test_audience_overlap_matches_bruteforce_sets(spark):
    """Every pair's co-audience and Jaccard must equal a Python set
    recompute over the raw (user, type) pairs."""
    from pyspark.sql import functions as F

    from real_time_data_analytics_cassandra_spark.catalog import table

    got = {
        (r.type_a, r.type_b): r
        for r in q.type_audience_overlap(spark, SF_SMOKE).collect()
    }
    rows = (
        table(spark, SF_SMOKE, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    )
    aud: dict[str, set[int]] = {}
    for r in rows:
        aud.setdefault(r.event_type, set()).add(r.user_id)
    types = sorted(aud)
    seen = set()
    for i in range(len(types)):
        for j in range(i + 1, len(types)):
            both = aud[types[i]] & aud[types[j]]
            if not both:
                assert (types[i], types[j]) not in got
                continue
            r = got[(types[i], types[j])]
            seen.add((types[i], types[j]))
            assert (r.n_a, r.n_b, r.n_both) == (
                len(aud[types[i]]),
                len(aud[types[j]]),
                len(both),
            )
            union = len(aud[types[i]] | aud[types[j]])
            assert r.jaccard == round(len(both) / union, 6)
    assert seen == set(got)


def test_kruskal_wallis_matches_bruteforce_midranks(spark):
    """The whole Kruskal-Wallis readout (per-type sizes, doubled rank
    sums, tie mass, H and tie-corrected H) must equal a pure-Python
    midrank recompute over the collected values — an
    engine-independent rederivation, and the scipy-textbook formula
    check (H computed from mean ranks) must agree to the rounding."""
    from collections import Counter

    from pyspark.sql import functions as F

    from real_time_data_analytics_cassandra_spark.catalog import table
    from real_time_data_analytics_cassandra_spark.functions.numeric import (
        money,
    )

    row = q.kruskal_wallis_value_by_type(spark, SF_SMOKE).collect()[0]
    types = ["click", "error", "purchase", "signup", "view"]
    ev = (
        table(spark, SF_SMOKE, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", money(F.col("value")).alias("v"))
        .collect()
    )
    vals = sorted({r.v for r in ev})
    per_v = {v: Counter() for v in vals}
    for r in ev:
        per_v[r.v][r.event_type] += 1
    n = len(ev)
    assert row.n == n
    cum = 0
    r2 = dict.fromkeys(types, 0)
    tie_sum = 0
    for v in vals:
        t = sum(per_v[v].values())
        mid2 = 2 * cum + t + 1
        for ty in types:
            r2[ty] += per_v[v][ty] * mid2
        tie_sum += t * t * t - t
        cum += t
    for ty in types:
        assert getattr(row, f"n_{ty}") == sum(
            1 for r in ev if r.event_type == ty
        ), ty
        assert getattr(row, f"r2_{ty}") == r2[ty], ty
    assert row.tie_sum == tie_sum
    # midranks partition the total rank mass: sum of 2R_g = n(n+1)
    assert sum(r2.values()) == n * (n + 1)
    # textbook H from the same integers
    s = sum(
        (r2[ty] ** 2) / (4 * getattr(row, f"n_{ty}"))
        for ty in types
        if getattr(row, f"n_{ty}")
    )
    h = 12.0 * s / (n * (n + 1)) - 3.0 * (n + 1)
    c = 1.0 - tie_sum / (n**3 - n)
    assert abs(row.h - h) < 1e-5
    assert abs(row.h_corrected - h / c) < 1e-5
    k = sum(1 for ty in types if getattr(row, f"n_{ty}") > 0)
    assert row.df == k - 1


def test_friedman_matches_bruteforce_block_ranks(spark):
    """The Friedman readout (per-type doubled rank sums, Σ(2r)², and
    the tie-corrected Q) must equal a pure-Python per-hour midrank
    recompute — plus the invariant Σ_j 2R_j = n·k(k+1) (every block's
    doubled ranks sum to k(k+1))."""
    from collections import Counter

    from pyspark.sql import functions as F

    from real_time_data_analytics_cassandra_spark.catalog import table

    types = ["click", "error", "purchase", "signup", "view"]
    row = q.friedman_hourly_type_ranks(spark, SF_SMOKE).collect()[0]
    ev = (
        table(spark, SF_SMOKE, "events")
        .select(
            "event_type",
            F.expr("unix_micros(ts) div 1000000 div 3600").alias("h"),
        )
        .collect()
    )
    per_h: dict[int, Counter] = {}
    for r in ev:
        per_h.setdefault(r.h, Counter())[r.event_type] += 1
    n = len(per_h)
    assert row.n == n
    k = len(types)
    r2_sum = dict.fromkeys(types, 0)
    ssq = 0
    for h, cnts in per_h.items():
        vals = {t: cnts.get(t, 0) for t in types}
        for t in types:
            below = sum(1 for o in types if vals[o] < vals[t])
            tied = sum(1 for o in types if vals[o] == vals[t])
            r2 = 2 * below + tied + 1
            r2_sum[t] += r2
            ssq += r2 * r2
    for t in types:
        assert getattr(row, f"r2_{t}") == r2_sum[t], t
    assert row.ssq == ssq
    assert sum(r2_sum.values()) == n * k * (k + 1)
    num = sum((r2_sum[t] - n * (k + 1)) ** 2 for t in types)
    den = ssq - n * k * (k + 1) ** 2
    if den:
        assert abs(row.q_stat - (k - 1) * num / den) < 1e-5
    else:
        assert row.q_stat is None
