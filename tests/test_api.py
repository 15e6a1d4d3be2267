"""API façade parity: the five endpoint shapes (SURVEY.md §2.9) over
the engine, including the reference's parameter-validation behavior
(realtime_api.py:137-138, 252-253, 274-275).
"""

from __future__ import annotations

import pytest

from real_time_data_analytics_cassandra_spark.api import VALID_PERIODS, AnalyticsApi
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def api(spark):
    return AnalyticsApi(spark, SF_SMOKE)


def test_latest_info_point_lookup(api):
    row = api.latest_info(7)
    assert row is not None and row["user_id"] == 7
    # ISO-serialized timestamp, not a datetime object
    assert isinstance(row["ts"], str) and "T" in row["ts"]


def test_latest_info_missing_key(api):
    assert api.latest_info(10**12) is None


def test_global_recent_limit_and_order(api):
    rows = api.global_recent(limit=5)
    assert len(rows) == 5
    ts = [r["ts"] for r in rows]
    assert ts == sorted(ts, reverse=True)


def test_global_recent_rejects_bad_limit(api):
    with pytest.raises(ValueError):
        api.global_recent(limit=0)


def test_geo_distribution_total_is_city_sum(api):
    out = api.geo_distribution("AMERICA")
    assert out["country"] == "AMERICA"
    assert out["total_new_customers"] == sum(
        c["new_customers_count"] for c in out["cities"]
    )
    assert len(out["hour_bucket"]) == 10  # yyyyMMddHH


def test_new_count_periods(api):
    for period in VALID_PERIODS:
        out = api.new_count(period)
        assert out["period"] == period
        assert out["time_bucket"].startswith(f"{period}:")
        assert out["count"] > 0


def test_new_count_rejects_unknown_period(api):
    with pytest.raises(ValueError):
        api.new_count("weekly")


def test_recent_by_category(api):
    out = api.recent_by_category("purchase")
    assert 0 < len(out["items"]) <= 10
    assert [i["rn"] for i in out["items"]] == list(range(1, len(out["items"]) + 1))


def test_recent_by_category_unknown(api):
    with pytest.raises(ValueError):
        api.recent_by_category("nope")


def test_status(api):
    out = api.status()
    assert out["status"] == "ok"
    assert out["engine"] == "spark"


@pytest.fixture(scope="module")
def http(spark):
    from real_time_data_analytics_cassandra_spark.api import create_flask_app

    app = create_flask_app(spark, SF_SMOKE)
    app.config["TESTING"] = True
    return app.test_client()


def test_registry_listing_over_rest(http):
    rows = http.get("/api/v1/queries").get_json()
    names = {r["name"] for r in rows}
    assert "geo_hourly_counts" in names and "minhash_lsh" in names
    gated = {r["name"]: r["oracle_gated"] for r in rows}
    assert gated["minhash_lsh"] is True and gated["ann_ivf"] is False


def test_registry_query_execution_over_rest(http):
    out = http.get("/api/v1/query/value_percentiles?limit=3").get_json()
    assert out["query"] == "value_percentiles"
    assert 1 <= len(out["rows"]) <= 3
    assert {"event_type", "p50_value"} <= set(out["rows"][0])


def test_registry_query_rest_validation(http):
    assert http.get("/api/v1/query/nope").status_code == 404
    assert http.get("/api/v1/query/value_percentiles?limit=0").status_code == 400
    assert (
        http.get("/api/v1/query/value_percentiles?limit=zzz").status_code
        == 400
    )

def test_registry_rest_refuses_side_effectful_queries(http):
    """streaming_*/snapshot_*/incremental_* start streaming jobs and
    commit scratch tables per call — the execute route must refuse
    them (400, no job started) and the listing must tag them."""
    rows = http.get("/api/v1/queries").get_json()
    side = {r["name"]: r["side_effectful"] for r in rows}
    assert side["streaming_hourly_type_counts"] is True
    assert side["snapshot_docs_upsert"] is True
    assert side["incremental_span_dedup"] is True
    # fixture-building queries write scratch state without carrying a
    # side-effect prefix — the explicit name tag must cover them too
    assert side["bm25_search_persisted"] is True
    assert side["amqp_replay_type_counts"] is True
    assert side["geo_hourly_counts"] is False
    assert side["bm25_search"] is False  # the fresh path stays pure
    resp = http.get("/api/v1/query/streaming_hourly_type_counts")
    assert resp.status_code == 400
    assert "not executable over REST" in resp.get_json()["error"]
    resp = http.get("/api/v1/query/bm25_search_persisted")
    assert resp.status_code == 400
