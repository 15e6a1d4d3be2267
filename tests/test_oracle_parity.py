"""Local mirror of the driver's correctness gate: every queries()
entry with an oracle_sql() entry must match DuckDB on the same
parquet, compared the same way (sort columns by name, sort rows,
value equality).  Runs at sf0.001 for speed; the driver re-runs at
sf0.01.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_ORACLE

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # we engineered exact equality; no tolerance
    return a == b


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, name):
    sdf = QUERIES[name](spark, SF_ORACLE).toPandas()
    con = _duck(SF_ORACLE)
    odf = con.sql(ORACLES[name]).df()
    con.close()

    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: column mismatch {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), f"{name}: row count {len(sdf)} vs {len(odf)}"

    s_n, o_n = _normalize(sdf), _normalize(odf)
    for col in s_n.columns:
        sv, ov = list(s_n[col]), list(o_n[col])
        mism = [
            (i, x, y) for i, (x, y) in enumerate(zip(sv, ov)) if not _values_equal(x, y)
        ]
        assert not mism, f"{name}.{col}: first mismatches {mism[:5]}"


@pytest.mark.slow
def test_every_query_runs_and_returns_rows(spark):
    """Rows-only sanity for queries without an oracle."""
    for name, fn in QUERIES.items():
        if name in ORACLES:
            continue
        df = fn(spark, SF_ORACLE)
        assert df.count() >= 0, name


def test_approx_distinct_within_error_bound(spark):
    """HLL++ sketch (rsd=0.02) must land within 10% of the exact
    distinct count — the cross-validation for the no-oracle query."""
    exact = {
        r.event_type: r.n_users
        for r in QUERIES["distinct_users_per_type"](spark, SF_ORACLE).collect()
    }
    approx = {
        r.event_type: r.n_users_approx
        for r in QUERIES["approx_distinct_users"](spark, SF_ORACLE).collect()
    }
    assert set(exact) == set(approx)
    for k, v in exact.items():
        assert abs(approx[k] - v) <= max(1, 0.1 * v), (k, v, approx[k])


def test_multimodal_features_match_direct_numpy(spark):
    """The Arrow feature-extraction stage (posexploded to scalar
    rows) must equal a direct numpy histogram of the same utf-8
    payloads — independent of the DuckDB oracle, which recomputes it
    character-wise in SQL."""
    import numpy as np

    rows = QUERIES["multimodal_features"](spark, SF_ORACLE).collect()
    con = _duck(SF_ORACLE)
    texts = dict(con.sql("SELECT doc_id, text FROM documents").fetchall())
    con.close()
    assert len(rows) == len(texts) * 16
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, [0.0] * 16)[r.feature_idx] = r.value
    for doc_id in list(got)[:50]:
        payload = texts[doc_id].encode("utf-8")
        arr = np.frombuffer(payload, dtype=np.uint8)
        expected = np.bincount(arr >> 4, minlength=16) / arr.size
        assert np.array_equal(np.array(got[doc_id]), expected), doc_id


def test_multimodal_features_empty_payload(spark):
    """An EMPTY document must yield an all-zero 16-bucket feature
    vector on both engines — the Spark histogram short-circuits to
    zeros and the oracle's CASE WHEN n = 0 guard avoids a NULL-ing
    0/0 — so oracle parity holds with zero-length payloads present."""
    import duckdb

    from real_time_data_analytics_cassandra_spark.operators.multimodal import (
        extract_features,
    )

    docs = spark.createDataFrame(
        [(1, b""), (2, b"abc"), (3, b"")],
        "doc_id long, payload binary",
    )
    rows = extract_features(docs).collect()
    feats = {r.doc_id: r.features for r in rows}
    assert feats[1] == [0.0] * 16 and feats[3] == [0.0] * 16
    assert abs(sum(feats[2]) - 1.0) < 1e-12
    # oracle side: same CTE as the registry oracle over a fixture with
    # an empty text — the guard must emit 0.0, never NULL
    con = duckdb.connect()
    con.sql("CREATE TABLE documents AS SELECT 1 AS doc_id, '' AS text "
            "UNION ALL SELECT 2, 'abc'")
    out = con.sql(ORACLES["multimodal_features"]).df()
    con.close()
    assert not out["value"].isna().any()
    d1 = out[out.doc_id == 1]["value"]
    assert len(d1) == 16 and (d1 == 0.0).all()


def test_blocked_all_pairs_matches_naive(spark):
    """cosine_all_pairs_blocked (numpy GEMM path) must be bit-identical
    to the naive fold-per-pair form on the same corpus."""
    from real_time_data_analytics_cassandra_spark.catalog import table
    from real_time_data_analytics_cassandra_spark.operators import similarity as sim_op

    emb = table(spark, SF_ORACLE, "embeddings")
    naive = sim_op.cosine_near_dup_pairs(emb, threshold=0.35).toPandas()
    blocked = sim_op.cosine_all_pairs_blocked(emb, threshold=0.35).toPandas()
    n = _normalize(naive)
    b = _normalize(blocked)
    assert len(n) == len(b)
    for col in n.columns:
        assert list(n[col]) == list(b[col]), col


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema) == 4


def test_audio_windows_match_direct_numpy(spark):
    """The Arrow windowed-RMS stage must equal a direct numpy model
    of the same utf-8 payloads (cross-check for the no-oracle
    windowed query)."""
    import numpy as np

    from real_time_data_analytics_cassandra_spark.operators.multimodal import (
        AUDIO_WINDOW,
    )

    rows = QUERIES["audio_window_features"](spark, SF_ORACLE).collect()
    con = _duck(SF_ORACLE)
    texts = dict(con.sql("SELECT doc_id, text FROM documents").fetchall())
    con.close()
    got = {(r.doc_id, r.window_idx): (r.rms, r.zero_crossings) for r in rows}
    n_expected = 0
    for doc_id, text in texts.items():
        samples = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(
            np.float64
        ) - 128.0
        n_win = (samples.size + AUDIO_WINDOW - 1) // AUDIO_WINDOW
        n_expected += n_win
        for w in range(n_win):
            frame = samples[w * AUDIO_WINDOW : (w + 1) * AUDIO_WINDOW]
            rms = round(float(np.sqrt(np.mean(frame * frame))), 6)
            signs = np.signbit(frame[frame != 0.0])
            zc = int(np.count_nonzero(signs[1:] != signs[:-1]))
            assert got[(doc_id, w)] == (rms, zc), (doc_id, w)
    assert len(got) == n_expected


def test_rolling_fingerprint_matches_python_model(spark):
    """The JVM fold fingerprint must equal the same polynomial rolling
    hash computed in pure Python (char-level codepoint fold — the
    engine-portable hash the DuckDB oracle reproduces too)."""
    rows = QUERIES["doc_rolling_fingerprint"](spark, SF_ORACLE).collect()
    con = _duck(SF_ORACLE)
    texts = dict(con.sql("SELECT doc_id, text FROM documents").fetchall())
    con.close()
    assert len(rows) == len(texts)
    M = 1_000_000_007
    for r in rows:
        acc = 0
        for tok in texts[r.doc_id].split(" "):
            h = 0
            for ch in tok:
                h = (h * 131 + ord(ch)) % M
            acc = (acc * 31 + h) % M
        assert r.fingerprint == acc, r.doc_id
