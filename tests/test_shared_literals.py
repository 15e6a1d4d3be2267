"""Cross-engine equivalence of the SHARED LITERAL expressions the
round-8 queries lean on: the md5 uniform draw, the Poisson(1)
inverse-CDF CASE, and the floor(log2) integer ladder must evaluate to
IDENTICAL values on Spark and DuckDB for the same inputs — these are
the primitives whose portability the oracles assume, gated here
directly instead of only through whole-query hashes."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from real_time_data_analytics_cassandra_spark.operators.sampling import (
    uniform01,
    uniform01_slice,
    uniform01_slice_sql,
    uniform01_sql,
)
from real_time_data_analytics_cassandra_spark.queries import (
    _LOG2_LADDER_SQL,
    _poisson1_case,
)


def test_uniform_and_poisson_draws_match_duckdb(spark):
    n = 500
    sdf = (
        spark.range(n)
        .select(F.col("id"), uniform01("id", salt="boot").alias("u"))
        .select("id", "u", F.expr(_poisson1_case("u")).alias("w"))
    )
    got = {r.id: (r.u, r.w) for r in sdf.collect()}
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT i AS id, {uniform01_sql('i', 'boot')} AS u, "
        f"CAST({_poisson1_case(uniform01_sql('i', 'boot'))} AS INT) AS w "
        f"FROM (SELECT unnest(generate_series(0, {n - 1})) AS i)"
    ).fetchall()
    want = {r[0]: (r[1], r[2]) for r in rows}
    assert got == want  # exact double + integer equality, no tolerance
    # the draws really are Poisson-ish: mean near 1, support bounded
    ws = [w for _, w in got.values()]
    assert 0.8 < sum(ws) / n < 1.2 and 0 <= min(ws) and max(ws) <= 8


def test_uniform_slices_match_duckdb_and_slice0_is_uniform01(spark):
    """Four 8-hex-char slices of one md5 digest = four independent
    uniforms (the Poisson-bootstrap digest-economy primitive): exact
    cross-engine equality per (key, slice), slice 0 bit-equal to the
    plain uniform01, and the slices of one digest are distinct."""
    n = 200
    sdf = spark.range(n).select(
        F.col("id"),
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("s"),
    ).select(
        "id",
        "s",
        uniform01_slice("id", F.col("s"), salt="boot").alias("u"),
        uniform01("id", salt="boot").alias("u0"),
    )
    got = {(r.id, r.s): (r.u, r.u0) for r in sdf.collect()}
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT i AS id, s, "
        f"{uniform01_slice_sql('i', 's', 'boot')} AS u "
        f"FROM (SELECT unnest(generate_series(0, {n - 1})) AS i), "
        f"(SELECT unnest(generate_series(0, 3)) AS s)"
    ).fetchall()
    want = {(r[0], r[1]): r[2] for r in rows}
    assert {k: v[0] for k, v in got.items()} == want  # exact doubles
    for i in range(n):
        assert got[(i, 0)][0] == got[(i, 0)][1]  # slice 0 == uniform01
        assert len({got[(i, s)][0] for s in range(4)}) == 4
    # the pooled draws look uniform: mean near 0.5 on 4n samples
    us = [v[0] for v in got.values()]
    assert 0.45 < sum(us) / len(us) < 0.55
    assert all(0.0 < u < 1.0 for u in us)


def test_log2_ladder_matches_duckdb_and_floor_log2(spark):
    vals = (
        [1, 2, 3, 4, 7, 8, 9, 255, 256, 257]
        + [(1 << k) - 1 for k in range(2, 40)]
        + [1 << k for k in range(40)]
    )
    sdf = spark.createDataFrame([(v,) for v in vals], "deg long").select(
        "deg", F.expr(_LOG2_LADDER_SQL).alias("bucket")
    )
    got = {r.deg: r.bucket for r in sdf.collect()}
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT deg, {_LOG2_LADDER_SQL} AS bucket FROM "
        f"(SELECT unnest({vals}) AS deg)"
    ).fetchall()
    assert got == {r[0]: r[1] for r in rows}
    # and both equal the mathematical floor(log2) (integer model)
    for v in vals:
        assert got[v] == min(v.bit_length() - 1, 40), v
