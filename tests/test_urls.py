"""URL canonicalization operator gates (operators/urls.py)."""

from __future__ import annotations

from real_time_data_analytics_cassandra_spark.operators import urls as u


def test_canonicalize_urls_edge_cases(spark):
    """Hand-built URLs covering every rule: mixed-case host with www,
    explicit default ports (dropped), non-default port (kept),
    tracking-param filtering with survivors kept in order, and the
    public-suffix-lite 2-vs-3-label domain split."""
    rows = [
        (1, "HTTP://WWW.Src3.COM:80/en/doc/1?utm_source=a&id=1&utm_b=c"),
        (2, "https://cdn.src4.co.uk:443/de/doc/2?id=2&fbclid=zz"),
        (3, "https://src5.github.io:8080/fr/doc/3?a=1&gclid=g&b=2"),
        (4, "http://src6.net/en/doc/4?utm_only=x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r["doc_id"]: (r["canon_url"], r["domain"])
        for r in u.canonicalize_urls(df).collect()
    }
    assert got[1] == ("http://src3.com/en/doc/1?id=1", "src3.com")
    assert got[2] == ("https://cdn.src4.co.uk/de/doc/2?id=2", "src4.co.uk")
    assert got[3] == (
        "https://src5.github.io:8080/fr/doc/3?a=1&b=2",
        "src5.github.io",
    )
    # all params tracking -> no '?' at all
    assert got[4] == ("http://src6.net/en/doc/4", "src6.net")


def test_synthetic_urls_are_deterministic_and_messy(spark):
    """The fixture URL derivation must hit every canonicalization
    rule across a small id range (so the oracle's ground-truth
    reconstruction is actually exercised, not vacuously equal)."""
    docs = spark.createDataFrame(
        [(i, f"src{i % 3}", "en") for i in range(60)],
        "doc_id long, source string, lang string",
    )
    urls = [r["url"] for r in u.synthetic_crawl_urls(docs).collect()]
    assert any(":80/" in x for x in urls)
    assert any(":443/" in x for x in urls)
    assert any(":8080/" in x for x in urls)
    assert any("WWW." in x for x in urls)
    assert any("cdn." in x for x in urls)
    assert any("utm_source" in x for x in urls)
    assert any("fbclid" in x for x in urls)
    assert any(".co.uk" in x.lower() for x in urls)
    assert any(".github.io" in x.lower() for x in urls)
