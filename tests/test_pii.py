"""Positive-match tests for PII redaction (operators/text.py::
pii_scrub) on crafted fixtures — the registry gate (pii_scrub_stats)
proves no spurious matches on the PII-free corpus; these prove the
patterns actually catch and redact PII, identically in DuckDB."""

from __future__ import annotations

import duckdb

from real_time_data_analytics_cassandra_spark.operators.text import pii_scrub

ROWS = [
    (1, "contact me at jane.doe+spam@example.co.uk for details"),
    (2, "server at 192.168.0.1 and backup at 10.0.0.255 are up"),
    (3, "call 555-867-5309 or 800.555.1212 today"),
    (4, "mixed: bob@corp.io from 172.16.254.3 dialed 212-555-0198"),
    (5, "no pii here just words and numbers like 12345"),
    (6, "not an ip 1234.5.6.7 and not a phone 55-867-5309"),
]


def _spark_out(spark):
    df = spark.createDataFrame(ROWS, "doc_id long, text string")
    return {
        r["id"]: r for r in pii_scrub(df, "doc_id", "text").collect()
    }


def test_counts_and_redaction(spark):
    out = _spark_out(spark)
    assert (out[1]["n_emails"], out[1]["n_ipv4"], out[1]["n_phones"]) == (1, 0, 0)
    assert out[1]["clean_text"] == "contact me at <EMAIL> for details"
    assert (out[2]["n_emails"], out[2]["n_ipv4"], out[2]["n_phones"]) == (0, 2, 0)
    assert out[2]["clean_text"] == "server at <IP> and backup at <IP> are up"
    assert (out[3]["n_emails"], out[3]["n_ipv4"], out[3]["n_phones"]) == (0, 0, 2)
    assert out[3]["clean_text"] == "call <PHONE> or <PHONE> today"
    assert (out[4]["n_emails"], out[4]["n_ipv4"], out[4]["n_phones"]) == (1, 1, 1)
    assert out[4]["clean_text"] == "mixed: <EMAIL> from <IP> dialed <PHONE>"
    assert (out[5]["n_emails"], out[5]["n_ipv4"], out[5]["n_phones"]) == (0, 0, 0)
    assert out[5]["clean_text"] == ROWS[4][1]


def test_near_miss_shapes_not_matched(spark):
    out = _spark_out(spark)
    # 4-digit first octet breaks \b...\d{1,3} IPv4; 2-digit area code
    # breaks the 3-3-4 phone shape
    assert (out[6]["n_ipv4"], out[6]["n_phones"]) == (0, 0)
    assert out[6]["clean_text"] == ROWS[5][1]


def test_duckdb_agrees_on_fixtures(spark):
    """Engine parity on rows that DO contain PII (the corpus gate
    only ever exercises the no-match path)."""
    spark_rows = {
        (r["id"], r["n_emails"], r["n_ipv4"], r["n_phones"], r["clean_text"])
        for r in _spark_out(spark).values()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", ROWS)
    duck_rows = set(
        con.sql(
            r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                       AS BIGINT),
                   CAST(len(regexp_extract_all(text,
                       '\b(?:\d{1,3}\.){3}\d{1,3}\b')) AS BIGINT),
                   CAST(len(regexp_extract_all(text,
                       '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS BIGINT),
                   regexp_replace(regexp_replace(regexp_replace(text,
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                       '<EMAIL>', 'g'),
                       '\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'),
                       '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g')
            FROM docs
            """
        ).fetchall()
    )
    con.close()
    assert spark_rows == duck_rows


def test_blocklist_stats_semantics(spark):
    from real_time_data_analytics_cassandra_spark.operators.text import (
        blocklist_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "clean words only here", "s1"),
            (2, "this one mentions badword inside", "s1"),
            (3, "badword badword twice counts once", "s2"),
            (4, "also fine", "s2"),
            (5, "other prohibited term", "s2"),
        ],
        "doc_id long, text string, source string",
    )
    bl = spark.createDataFrame([("badword",), ("prohibited",)], "term string")
    out = {
        r["source"]: r
        for r in blocklist_stats(
            docs, "doc_id", "text", "source", bl
        ).collect()
    }
    assert out["s1"]["n_docs"] == 2 and out["s1"]["n_blocked"] == 1
    assert out["s1"]["retained_docs"] == 1
    assert out["s1"]["retained_chars"] == len("clean words only here")
    assert out["s2"]["n_docs"] == 3 and out["s2"]["n_blocked"] == 2
    assert out["s2"]["block_ratio"] == round(2 / 3, 6)
    assert out["s2"]["retained_chars"] == len("also fine")
