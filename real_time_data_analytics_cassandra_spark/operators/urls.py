"""URL canonicalization and registrable-domain extraction — the one
standard crawl-pipeline stage the text family lacked (r10 verdict
task 5).

The testdata carries no URL column, so ``synthetic_crawl_urls``
derives a deterministic, deliberately MESSY crawl URL per document
from (doc_id, source, lang) — the same discipline as the multimodal
payloads (operators/multimodal.py::attach_binary_payload): mixed-case
hosts, www/cdn subdomains, explicit default and non-default ports,
multi-label public suffixes (co.uk / github.io), and tracking params
interleaved with real ones.  ``canonicalize_urls`` then does the real
work with pure JVM string expressions (no UDFs, stays inside
whole-stage codegen):

- scheme/authority/path/query split (substring_index arithmetic);
- host lowercased, leading ``www.`` stripped;
- DEFAULT ports dropped (http:80 / https:443), explicit non-default
  ports kept;
- tracking params (``utm_*``, ``fbclid``, ``gclid``) filtered out of
  the query string with a higher-order array filter, surviving params
  kept in original order;
- registrable domain via a PUBLIC-SUFFIX-LITE literal set: hosts
  whose last two labels form a listed multi-label suffix take three
  labels, everything else two.  (Production swaps the literal for the
  full broadcast PSL table — the lookup shape is identical.)

Everything is deterministic string arithmetic, so the whole chain
carries a FULL DuckDB oracle.  Reference parity anchor: the reference
has no URL stage at all (cassandra_subscriber.py:1-120 consumes
pre-keyed events); this is part of the training-data superset.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# multi-label public suffixes recognised by the lite table; a host
# ending in one of these keeps THREE labels as its registrable domain
PUBLIC_SUFFIX_LITE = ("co.uk", "com.au", "github.io")


def synthetic_crawl_urls(df: DataFrame) -> DataFrame:
    """Attach the deterministic messy ``url`` column (see module
    docstring).  Expects doc_id / source / lang columns."""
    d = F.col("doc_id")
    tld = (
        F.when(d % 5 == 0, F.lit("com"))
        .when(d % 5 == 1, F.lit("org"))
        .when(d % 5 == 2, F.lit("co.uk"))
        .when(d % 5 == 3, F.lit("github.io"))
        .otherwise(F.lit("net"))
    )
    sub = (
        F.when(d % 3 == 0, F.lit("www."))
        .when(d % 3 == 1, F.lit("cdn."))
        .otherwise(F.lit(""))
    )
    host = F.concat(sub, F.col("source"), F.lit("."), tld)
    host = F.when(d % 2 == 0, F.upper(host)).otherwise(host)
    scheme = F.when(d % 3 == 0, F.lit("http")).otherwise(F.lit("https"))
    port = (
        F.when(
            (d % 4 == 0) & (d % 3 == 0), F.lit(":80")
        )  # explicit default, http
        .when(d % 4 == 0, F.lit(":443"))  # explicit default, https
        .when(d % 4 == 1, F.lit(":8080"))  # non-default: must survive
        .otherwise(F.lit(""))
    )
    path = F.concat(
        F.lit("/"), F.col("lang"), F.lit("/doc/"), d.cast("string")
    )
    query = F.when(
        d % 2 == 0,
        F.concat(
            F.lit("?utm_source=feed&id="),
            d.cast("string"),
            F.lit("&utm_campaign=x"),
        ),
    ).otherwise(F.concat(F.lit("?id="), d.cast("string")))
    query = F.when(
        d % 7 == 0, F.concat(query, F.lit("&fbclid=abc123"))
    ).otherwise(query)
    return df.withColumn(
        "url", F.concat(scheme, F.lit("://"), host, port, path, query)
    )


def _registrable_domain(host: Column) -> Column:
    """Registrable domain of a canonical (lowercase) host under the
    lite suffix table: 3 labels when the last two form a listed
    multi-label suffix, else 2."""
    labels = F.split(host, "\\.")
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    return F.when(last2.isin(*PUBLIC_SUFFIX_LITE), last3).otherwise(last2)


def canonicalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Add ``canon_url`` and ``domain`` columns (see module
    docstring).  Pure JVM string expressions end to end."""
    url = F.col(url_col)
    scheme = F.lower(F.substring_index(url, "://", 1))
    rest = url.substr(F.length(scheme) + F.lit(4), F.length(url))
    authority = F.substring_index(rest, "/", 1)
    path_q = rest.substr(F.length(authority) + F.lit(1), F.length(rest))
    path = F.substring_index(path_q, "?", 1)
    raw_query = F.when(
        path_q.contains("?"),
        path_q.substr(F.length(path) + F.lit(2), F.length(path_q)),
    ).otherwise(F.lit(""))
    host_raw = F.lower(F.substring_index(authority, ":", 1))
    host = F.when(
        host_raw.startswith("www."),
        host_raw.substr(F.lit(5), F.length(host_raw)),
    ).otherwise(host_raw)
    port = F.when(
        authority.contains(":"),
        F.substring_index(authority, ":", -1),
    ).otherwise(F.lit(""))
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == "80"))
        & ~((scheme == "https") & (port == "443"))
    )
    kept_params = F.array_join(
        F.filter(
            F.split(raw_query, "&"),
            lambda t: ~(
                t.startswith("utm_")
                | t.startswith("fbclid=")
                | t.startswith("gclid=")
            ),
        ),
        "&",
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(
            kept_params != "", F.concat(F.lit("?"), kept_params)
        ).otherwise(F.lit("")),
    )
    return df.withColumn("canon_url", canon).withColumn(
        "domain", _registrable_domain(host)
    )
