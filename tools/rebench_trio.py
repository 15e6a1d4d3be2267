#!/usr/bin/env python
"""Targeted re-bench of the three queries flagged as possible
regressions in the round-3 review (late_order_priority_counts,
small_quantity_revenue, decontaminate_overlap: ~1.3-1.4x their r2
times on a single-sample bench).  None of their code changed in r3,
so the hypothesis is scheduler noise on a shared local[32] box —
this script times each query n times at the bench SF and prints
median/min/max so noise and regression separate.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_data_analytics_cassandra_spark import queries as q  # noqa: E402
from real_time_data_analytics_cassandra_spark.session import get_spark  # noqa: E402

TRIO = {
    # name: (r2 seconds, r3 seconds) from BENCH_r02/BENCH_r03
    "late_order_priority_counts": (1.05, 1.47),
    "small_quantity_revenue": (1.08, 1.48),
    "decontaminate_overlap": (1.05, 1.32),
}
N = int(os.environ.get("REBENCH_N", "6"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(app_name="rtdac-rebench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()
    force(registry["latest_info_point_lookup"](spark, SF_DIR))  # warmup

    out = {}
    for name, (r2, r3) in TRIO.items():
        times = []
        for _ in range(N):
            t0 = time.monotonic()
            force(registry[name](spark, SF_DIR))
            times.append(round(time.monotonic() - t0, 3))
        med = round(statistics.median(times), 3)
        out[name] = {
            "r2": r2,
            "r3_single_sample": r3,
            "samples": times,
            "median": med,
            "min": min(times),
            "max": max(times),
            "median_vs_r2": round(med / r2, 2),
        }
        print(f"  {name}: median {med}s (r2 {r2}s, r3 single {r3}s)",
              file=sys.stderr)
    print(json.dumps(out, indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
