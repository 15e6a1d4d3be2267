#!/usr/bin/env python
"""Per-query micro-bench: time NAMED registry queries with the noop
sink in one warmed session (same warmups as bench.py), print
per-query samples + median, and optionally dump the formatted plan
to plans/<dir>/<name>_<tag>.txt.

Every sample starts from a cleared cache (r13): bench.py clears
between rounds for the same reason — an intra-query .cache()
populated by sample 1 would serve samples 2..n warm and the median
would flatter exactly the shared-pass optimizations this tool is
meant to judge.

Usage:
    python tools/qbench.py [--n 5] [--sf /root/testdata/sf0.1] \
        [--plans before|after] [--plans-dir r13] name [name ...]
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


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    n = 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    plans_tag = None
    plans_sub = "r13"
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--n":
            n = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        elif args[i] == "--plans":
            plans_tag = args[i + 1]; i += 2
        elif args[i] == "--plans-dir":
            plans_sub = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1

    spark = get_spark(app_name="rtdac-qbench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = q.queries()

    # same session warmups as bench.py so first-query costs don't
    # pollute the first named query
    force(registry["latest_info_point_lookup"](spark, sf_dir))
    q.build_amqp_dump_fixture(spark, sf_dir)
    q.build_text_index_fixture(spark, sf_dir)
    q.build_cluster_index_fixture(spark, sf_dir)
    q.build_copurchase_pairs_fixture(spark, sf_dir)
    q.build_image_pair_index_fixture(spark, sf_dir)
    q.build_audio_pair_index_fixture(spark, sf_dir)
    force(q.streaming_image_signature_clusters(spark, sf_dir))
    force(q.amqp_replay_type_counts(spark, "/root/testdata/sf0.001"))
    force(q.multimodal_decode_meta(spark, "/root/testdata/sf0.001"))
    force(q.geo_hourly_counts(spark, "/root/testdata/sf0.001"))

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        plans_sub,
    )
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"qbench:{name}")
        if plans_tag:
            os.makedirs(plans_dir, exist_ok=True)
            df = registry[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(plans_dir, f"{name}_{plans_tag}.txt"), "w"
            ) as f:
                f.write(plan)
        times = []
        for _ in range(n):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            force(registry[name](spark, sf_dir))
            times.append(round(time.monotonic() - t0, 3))
        out[name] = {
            "samples": times,
            "median": round(statistics.median(times), 3),
            "min": min(times),
        }
        print(f"{name}: med={out[name]['median']} min={out[name]['min']} {times}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
