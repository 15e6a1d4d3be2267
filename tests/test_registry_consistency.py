"""Registry <-> docs <-> bench drift gates: the bookkeeping rules the
round checklist enforces by hand (every query benched or named in the
README exclusion table, every oracle keyed to a real query, every
rows-only query carrying a cross-validation row) become CI failures
instead of review findings."""

from __future__ import annotations

import json
import pathlib
import re

from real_time_data_analytics_cassandra_spark import queries as q

REPO = pathlib.Path(__file__).resolve().parents[1]


def _bench_queries():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", str(REPO / "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return list(mod.BENCH_QUERIES)


def test_every_query_is_benched_or_excluded_with_reason():
    reg = set(q.queries())
    benched = set(_bench_queries())
    readme = open(REPO / "README.md").read()
    excluded = set(re.findall(r"^\| `(\w+)` \|", readme, re.M))
    assert benched <= reg, sorted(benched - reg)
    unaccounted = reg - benched - excluded
    assert not unaccounted, sorted(unaccounted)
    # an exclusion row for a query that is actually benched (or gone)
    # is stale documentation
    assert excluded <= reg - benched, sorted(excluded - (reg - benched))


def test_every_oracle_keys_a_registry_query():
    reg, ora = set(q.queries()), set(q.oracle_sql())
    assert ora <= reg, sorted(ora - reg)


def test_every_rows_only_query_has_a_crossval_row():
    reg, ora = set(q.queries()), set(q.oracle_sql())
    cv = json.load(open(REPO / "CROSSVAL.json"))
    cv_names = set(cv) if isinstance(cv, dict) else {r["name"] for r in cv}
    missing = sorted((reg - ora) - cv_names)
    assert not missing, missing


def test_readme_registry_counts_match_the_code():
    """The README architecture blurb quotes three registry counts
    (total queries, oracle-backed, approximate); quoting stale
    numbers misstates the verified surface, so drift is a failure."""
    reg, ora = q.queries(), q.oracle_sql()
    readme = open(REPO / "README.md").read()
    m = re.search(
        r"registry: (\d+) \(spark, sf_dir\)", readme
    )
    m_ora = re.search(r"SQL-expressible one \((\d+)\)", readme)
    m_approx = re.search(r"the (\d+) approximate ones", readme)
    assert m and m_ora and m_approx, "README count lines not found"
    assert int(m.group(1)) == len(reg)
    assert int(m_ora.group(1)) == len(ora)
    assert int(m_approx.group(1)) == len(reg) - len(ora)
