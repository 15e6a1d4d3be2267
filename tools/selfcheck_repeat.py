#!/usr/bin/env python
"""Repeat-invocation self-consistency sweep: run EVERY registry query
TWICE in one session at sf0.001 and require bit-identical results.

What this catches that the oracle parity sweep cannot:

- fixture state leakage: queries that build persisted fixtures
  (streamed/incremental indexes, snapshot tables, AMQP dumps) must
  return the same answer when the fixture already exists as when they
  created it — a second in-session invocation exercises exactly the
  "warm fixture" path the parity sweep's single pass never sees;
- nondeterminism: any query whose output depends on partition
  iteration order, unseeded sampling, or wall-clock time will differ
  across back-to-back runs even though a single run can hash-match a
  similarly-nondeterministic oracle by luck.

Comparison: sort columns by name, sort rows, exact value equality
(NaN==NaN) — same protocol as tools/parity_sweep.py.  Writes
SELFCHECK_sf0.001.json; exits nonzero on any inconsistency.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR_SELFCHECK", "/root/testdata/sf0.001")
OUT = os.path.join(REPO, f"SELFCHECK_sf{SF.rsplit('sf', 1)[-1]}.json")


def _normalize(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def _eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def _first_diff(a, b):
    if sorted(a.columns) != sorted(b.columns):
        return ["schema", sorted(a.columns), sorted(b.columns)]
    if len(a) != len(b):
        return ["rowcount", len(a), len(b)]
    a_n, b_n = _normalize(a), _normalize(b)
    for col in a_n.columns:
        for i, (x, y) in enumerate(zip(list(a_n[col]), list(b_n[col]))):
            if not _eq(x, y):
                return [col, i, repr(x), repr(y)]
    return None


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as m

    Q = m.queries()
    results: dict[str, dict] = {}
    t_start = time.monotonic()
    for name in sorted(Q):
        row: dict = {}
        try:
            first = Q[name](spark, SF).toPandas()
            second = Q[name](spark, SF).toPandas()
            row["rows"] = int(len(first))
            diff = _first_diff(first, second)
            row["status"] = "consistent" if diff is None else "inconsistent"
            if diff is not None:
                row["first_diff"] = diff
                print(f"  FAIL {name}: {diff}", file=sys.stderr)
            else:
                print(f"  OK {name}: {len(first)}", file=sys.stderr)
        except Exception as e:  # noqa: BLE001 - sweep must finish
            row["status"] = "error"
            row["error"] = f"{type(e).__name__}: {e}"[:400]
            print(f"  ERROR {name}: {row['error'][:150]}", file=sys.stderr)
        results[name] = row

    n_ok = sum(1 for r in results.values() if r.get("status") == "consistent")
    n_bad = len(results) - n_ok
    payload = {
        "sf_dir": SF,
        "protocol": (
            "two invocations per query in one session; sorted columns/rows, "
            "exact value equality"
        ),
        "total_queries": len(results),
        "consistent": n_ok,
        "failed": n_bad,
        "wall_clock_sec": round(time.monotonic() - t_start, 1),
        "results": results,
    }
    with open(OUT, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"wrote {OUT}: {n_ok}/{len(results)} consistent, {n_bad} failed")
    spark.stop()
    if n_bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
