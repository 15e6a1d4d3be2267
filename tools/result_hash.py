#!/usr/bin/env python
"""Deterministic result fingerprint for registry queries WITHOUT a
SQL oracle (the ANN/semantic family): collect the query at a small
SF, sort rows by every column, and md5 the canonical string form —
used to prove a refactor changed NOTHING about the declared result
(r13: the kmeans probe/sample reuse in similarity.py).

Usage:
    python tools/result_hash.py [--sf /root/testdata/sf0.01] name [...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_data_analytics_cassandra_spark import queries as q  # noqa: E402
from real_time_data_analytics_cassandra_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and args[0] == "--sf":
        sf_dir = args[1]
        args = args[2:]
    spark = get_spark(app_name="rtdac-result-hash")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()
    for name in args:
        df = registry[name](spark, sf_dir)
        cols = sorted(df.columns)
        rows = sorted(
            tuple(repr(r[c]) for c in cols) for r in df.collect()
        )
        h = hashlib.md5(repr(rows).encode()).hexdigest()
        print(f"{name} {len(rows)} {h}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
