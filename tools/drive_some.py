"""Driver-emulating verify for a SUBSET of queries: hostile session,
oracle compare at a chosen SF.  Usage:

    python tools/drive_some.py [--sf /root/testdata/sf0.01] name [name ...]

Compare protocol (same shape as the per-round driver): run the
registry query on a fresh hostile-config session (non-UTC timezone,
200 shuffle partitions) AND the oracle SQL on DuckDB over the same
parquet views, sort columns by name and rows by all columns
(timestamps normalized to microsecond strings), then require
column-set, row-count, and exact cell-by-cell value equality
(NaN == NaN allowed; no float tolerance).
"""
import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

args = sys.argv[1:]
SF = "/root/testdata/sf0.01"
if args and args[0] == "--sf":
    SF = args[1]
    args = args[2:]
names = args

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.sql.shuffle.partitions", "200")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)

import __spark_entry__ as m

Q, O = m.queries(), m.oracle_sql()

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")


def _normalize(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


fail = []
for name in names:
    try:
        sdf = Q[name](spark, SF).toPandas()
        if name not in O:
            print(f"ROWSONLY {name}: {len(sdf)}", flush=True)
            continue
        odf = con.sql(O[name]).df()
        if sorted(sdf.columns) != sorted(odf.columns):
            fail.append((name, f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}"))
            continue
        if len(sdf) != len(odf):
            fail.append((name, f"rows {len(sdf)} vs {len(odf)}"))
            continue
        s_n, o_n = _normalize(sdf), _normalize(odf)
        bad = None
        for col in s_n.columns:
            mism = [
                (i, x, y)
                for i, (x, y) in enumerate(zip(list(s_n[col]), list(o_n[col])))
                if not _eq(x, y)
            ]
            if mism:
                bad = (col, mism[:3])
                break
        if bad:
            fail.append((name, f"values {bad}"))
        else:
            print(f"OK {name}: {len(sdf)}", flush=True)
    except Exception as e:
        fail.append((name, f"error {type(e).__name__}: {e}"))

print("=== FAILURES:", len(fail), flush=True)
for name, why in fail:
    print(" -", name, why[:300], flush=True)
sys.exit(1 if fail else 0)
