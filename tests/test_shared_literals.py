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
