"""Data-quality expectation semantics (operators/expectations.py) on
crafted tables where the violation counts are known by hand, plus the
one-scan plan guarantee for fused row checks.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_analytics_cassandra_spark.operators import (
    expectations as exp,
)
from real_time_data_analytics_cassandra_spark.plans import (
    explain_str,
    operator_count,
)


def test_row_checks_null_is_a_violation(spark):
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, -5.0), (None, 4.0)],
        "k long, v double",
    )
    out = {
        r["check"]: (r["n_rows"], r["n_violations"], r["passed"])
        for r in exp.row_checks(
            df,
            {
                "k_not_null": F.col("k").isNotNull(),
                "v_positive": F.col("v") > 0,
            },
        ).collect()
    }
    assert out["k_not_null"] == (4, 1, False)
    # v > 0: row2 NULL (violation) + row3 negative -> 2
    assert out["v_positive"] == (4, 2, False)


def test_row_checks_fuse_into_one_scan(spark):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    report = exp.row_checks(
        df,
        {
            "a": F.col("id") >= 0,
            "b": F.col("v") < 7,
            "c": F.col("id") != 13,
        },
    )
    # 3 checks, ONE scan: the report explodes a single aggregate row
    assert operator_count(report, "Range") == 1, explain_str(report)


def test_uniqueness_check_counts_extra_rows(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (2,), (3,), (3,), (3,)], "k long"
    )
    row = exp.uniqueness_check(df, "k_unique", ["k"]).collect()[0]
    assert (row["n_rows"], row["n_violations"], row["passed"]) == (6, 3, False)


def test_referential_check_counts_orphans_and_null_keys(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    row = exp.referential_check(
        child, parent, "fk_ok", "fk", "pk"
    ).collect()[0]
    # fk=99 orphan + fk NULL -> 2 violations
    assert (row["n_rows"], row["n_violations"], row["passed"]) == (4, 2, False)


def test_combine_reports_orders_by_check(spark):
    a = exp.row_checks(spark.range(3), {"z_last": F.col("id") >= 0})
    b = exp.row_checks(spark.range(3), {"a_first": F.col("id") >= 0})
    names = [r["check"] for r in exp.combine_reports(a, b).collect()]
    assert names == ["a_first", "z_last"]
