"""Exact-OLS trend and correlation-matrix edge cases the driver-scale
data may not exercise: NEGATIVE slopes (where truncating vs flooring
integer division diverge — the bug class _floordiv_sql exists to
kill), single-point groups (zero denominator -> NULL), and
zero-variance correlation guards.  The DuckDB comparisons here drive
the SAME SQL the oracle uses, on the same tiny frame.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from real_time_data_analytics_cassandra_spark.queries import (
    _floordiv_sql,
    _ols_fit_micro,
)


def test_floordiv_sql_matches_python_floor_both_engines(spark):
    """floor(a/b) for every sign combination of a (b > 0): the Spark
    `div` form and the DuckDB `//` form must both equal Python's
    floor division."""
    cases = [(7, 3), (-7, 3), (6, 3), (-6, 3), (0, 3), (1, 7), (-1, 7)]
    df = spark.createDataFrame(cases, "a long, b long")
    got = {
        (r.a, r.b): r.fd
        for r in df.selectExpr(
            "a", "b", f"{_floordiv_sql('a', 'b')} AS fd"
        ).collect()
    }
    con = duckdb.connect()
    for a, b in cases:
        want = a // b
        assert got[(a, b)] == want, (a, b, got[(a, b)])
        duck = con.sql(
            f"SELECT {_floordiv_sql(str(a), str(b), divop='//')}"
        ).fetchone()[0]
        assert duck == want, (a, b, duck)


def _duck_ols(rows: list[tuple[str, int, int]]) -> dict:
    """The oracle's OLS tail verbatim (x re-based to min hour, BIGINT
    sums, flooring division) over literal (event_type, h, y) rows."""
    con = duckdb.connect()
    con.register(
        "hourly", pd.DataFrame(rows, columns=["event_type", "h", "y"])
    )
    slope = _floordiv_sql(
        "1000000 * (n * sxy - sx * sy)", "n * sxx - sx * sx", divop="//"
    )
    intercept = _floordiv_sql("1000000 * sy - slope_micro * sx", "n", divop="//")
    out = con.sql(
        f"""
        WITH x0 AS (SELECT min(h) AS x0 FROM hourly),
             based AS (SELECT event_type,
                              h - (SELECT x0 FROM x0) AS x, y
                       FROM hourly),
             s AS (SELECT event_type,
                          CAST(count(*) AS BIGINT) AS n,
                          CAST(sum(x) AS BIGINT) AS sx,
                          CAST(sum(y) AS BIGINT) AS sy,
                          CAST(sum(x * x) AS BIGINT) AS sxx,
                          CAST(sum(x * y) AS BIGINT) AS sxy
                   FROM based GROUP BY 1),
             fit AS (SELECT event_type, n, sx, sy,
                            CASE WHEN n * sxx - sx * sx = 0 THEN NULL
                                 ELSE {slope} END AS slope_micro
                     FROM s)
        SELECT event_type, CAST(n AS BIGINT) AS n_hours,
               CAST(slope_micro AS BIGINT) AS slope_micro,
               CAST(CASE WHEN slope_micro IS NULL THEN NULL
                    ELSE {intercept} END AS BIGINT) AS intercept_micro
        FROM fit ORDER BY event_type
        """
    ).fetchall()
    return {r[0]: (r[1], r[2], r[3]) for r in out}


def test_ols_negative_slope_matches_duckdb_bit_for_bit(spark):
    """A strictly DECREASING series produces a negative slope whose
    micro-unit value is usually a non-exact division — exactly where
    truncation and floor differ by one.  Both engines must agree."""
    rows = []
    # declining: y = 100 - 7x (exact), and a noisy decline where the
    # OLS division is NOT exact
    for x in range(6):
        rows.append(("exact_decline", 1000 + x, 100 - 7 * x))
        rows.append(("noisy_decline", 1000 + x, 90 - 7 * x + (x % 2) * 3))
    # single point -> NULL coefficients
    rows.append(("single", 1003, 42))
    hourly = spark.createDataFrame(rows, "event_type string, h long, y long")
    got = {
        r.event_type: (r.n_hours, r.slope_micro, r.intercept_micro)
        for r in _ols_fit_micro(hourly).collect()
    }
    want = _duck_ols(rows)
    assert got == want, (got, want)
    assert got["exact_decline"][1] == -7_000_000
    assert got["noisy_decline"][1] < 0
    assert got["single"] == (1, None, None)


def test_correlation_matrix_zero_variance_is_null(spark):
    """A constant-volume type has zero variance — every pair touching
    it must be NULL, and perfectly anti-correlated pairs hit -1."""
    from real_time_data_analytics_cassandra_spark import queries as q
    import datetime as dt
    import tempfile

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # hour 0..3: up grows 1,2,3,4; down shrinks 4,3,2,1; flat always 2
    for hx, (nu, nd) in enumerate([(1, 4), (2, 3), (3, 2), (4, 1)]):
        ts = base + dt.timedelta(hours=hx)
        for _ in range(nu):
            rows.append((eid, ts, 1, "up", 1.0, "{}")); eid += 1
        for _ in range(nd):
            rows.append((eid, ts, 1, "down", 1.0, "{}")); eid += 1
        for _ in range(2):
            rows.append((eid, ts, 1, "flat", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = tempfile.mkdtemp(prefix="rtdac_corrtest_")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {
        (r.type_a, r.type_b): r.corr
        for r in q.event_type_correlation_matrix(df.sparkSession, d).collect()
    }
    assert got[("down", "up")] == -1.0
    assert got[("down", "flat")] is None
    assert got[("flat", "up")] is None
