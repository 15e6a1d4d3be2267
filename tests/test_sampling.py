"""Deterministic sampling/split invariants (operators/sampling.py).

What matters at 100 TB: the split assignment must be a pure function
of the row key — identical across reruns, engines, partitionings, and
corpus growth.  rand()-based sampling has none of these properties.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_data_analytics_cassandra_spark.catalog import table
from real_time_data_analytics_cassandra_spark.operators import sampling
from tests.conftest import SF_SMOKE


def _docs(spark):
    return table(spark, SF_SMOKE, "documents")


def test_split_is_stable_under_repartitioning(spark):
    docs = _docs(spark)
    a = sampling.with_split(docs, "doc_id").select("doc_id", "split")
    b = sampling.with_split(docs.repartition(17, "lang"), "doc_id").select(
        "doc_id", "split"
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_split_is_stable_under_corpus_growth(spark):
    """A row's split must not change when more rows arrive: the
    assignment on a half-corpus equals the assignment of those same
    rows on the full corpus."""
    docs = _docs(spark)
    full = dict(
        sampling.with_split(docs, "doc_id").select("doc_id", "split").collect()
    )
    half = dict(
        sampling.with_split(docs.filter(F.col("doc_id") % 2 == 0), "doc_id")
        .select("doc_id", "split")
        .collect()
    )
    assert half == {k: v for k, v in full.items() if k % 2 == 0}


def test_split_partition_covers_all_rows_disjointly(spark):
    docs = _docs(spark)
    split = sampling.with_split(docs, "doc_id")
    counts = dict(split.groupBy("split").count().collect())
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()
    # roughly 80/10/10 (hash uniformity; generous bounds at small n)
    frac_train = counts.get("train", 0) / docs.count()
    assert 0.6 < frac_train < 0.95


def test_split_matches_python_md5(spark):
    """The bucket is plain md5 — cross-check a sample against
    Python's hashlib (third engine besides Spark and DuckDB)."""
    import hashlib

    rows = (
        sampling.with_split(_docs(spark), "doc_id")
        .select("doc_id", "split")
        .limit(50)
        .collect()
    )
    for doc_id, split in rows:
        b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % 100
        want = "train" if b < 80 else ("val" if b < 90 else "test")
        assert split == want, (doc_id, b, split, want)


def test_cap_per_group_keeps_at_most_k_deterministically(spark):
    events = table(spark, SF_SMOKE, "events")
    k = 50
    capped = sampling.cap_per_group(events, ["event_type"], "event_id", k)
    by_type = dict(capped.groupBy("event_type").count().collect())
    totals = dict(events.groupBy("event_type").count().collect())
    for t, total in totals.items():
        assert by_type.get(t, 0) == min(k, total), t
    # deterministic: same kept ids on a different partitioning
    again = sampling.cap_per_group(
        events.repartition(13, "user_id"), ["event_type"], "event_id", k
    )
    assert sorted(r.event_id for r in capped.select("event_id").collect()) == sorted(
        r.event_id for r in again.select("event_id").collect()
    )


def test_hash_bucket_plan_is_shuffle_free(spark):
    """with_split is a pure projection: no Exchange in the plan."""
    docs = _docs(spark)
    plan = (
        sampling.with_split(docs, "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_weighted_sample_matches_python_aes_model(spark):
    """weighted_sample_topk must select exactly the rows the pure-
    Python Efraimidis-Spirakis model selects (same md5 uniform, same
    ln(u)/w key), independent of partitioning."""
    import hashlib
    import math

    docs = _docs(spark).select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    k = 40
    got = sampling.weighted_sample_topk(docs, "doc_id", "n_tokens", k).collect()
    weights = {r.doc_id: r.n_tokens for r in docs.collect()}

    def skey(doc_id, w):
        h = hashlib.md5(f"ws{doc_id}".encode()).hexdigest()[:8]
        u = (int(h, 16) + 0.5) / 16**8
        return math.log(u) / w

    want = sorted(weights, key=lambda d: (-skey(d, weights[d]), d))[:k]
    assert [r.doc_id for r in sorted(got, key=lambda r: r.rnk)] == want
    for r in got:
        assert r.sample_key == round(skey(r.doc_id, weights[r.doc_id]), 6)
    # stability: same selection from a different partitioning
    again = sampling.weighted_sample_topk(
        docs.repartition(13, "n_tokens"), "doc_id", "n_tokens", k
    ).collect()
    assert {r.doc_id for r in again} == set(want)


def test_weighted_sample_prefers_heavy_rows(spark):
    """Inclusion must skew toward weight: the sampled docs' mean
    weight exceeds the corpus mean (a uniform sample would match it)."""
    docs = _docs(spark).select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    got = sampling.weighted_sample_topk(docs, "doc_id", "n_tokens", 100)
    sampled_mean = got.agg(F.avg("n_tokens")).first()[0]
    corpus_mean = docs.agg(F.avg("n_tokens")).first()[0]
    assert sampled_mean > corpus_mean


def test_temperature_resample_rates_and_floor(spark):
    # groups: a=16 docs, b=4 docs, tau=0.5 -> p_raw (4, 2),
    # T/z = min(16/4, 4/2) = 2 -> rate_a = 4*2/16 = 0.5, rate_b = 1.0
    rows = [(i, "a") for i in range(16)] + [(100 + i, "b") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = {
        r["grp"]: r
        for r in sampling.temperature_resample(
            df, "doc_id", "grp", tau=0.5
        ).collect()
    }
    assert out["a"]["keep_rate"] == 0.5
    assert out["b"]["keep_rate"] == 1.0
    # the scarcest group survives in full
    assert out["b"]["n_kept"] == 4
    # kept counts follow the deterministic Bernoulli draws exactly
    u = sampling.uniform01("doc_id", "temp")
    expect_a = (
        df.filter(F.col("grp") == "a").select("doc_id").withColumn("u", u)
        .filter(F.col("u") < 0.5).count()
    )
    assert out["a"]["n_kept"] == expect_a


def test_temperature_resample_tau1_keeps_everything(spark):
    rows = [(i, "a") for i in range(10)] + [(50 + i, "b") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    out = sampling.temperature_resample(df, "doc_id", "grp", tau=1.0).collect()
    for r in out:
        assert r["keep_rate"] == 1.0
        assert r["n_kept"] == r["n_docs"]


def test_temperature_resample_stable_under_repartitioning(spark):
    rows = [(i, "g%d" % (i % 3)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, grp string")
    a = sampling.temperature_resample(df, "doc_id", "grp", tau=0.3).collect()
    b = sampling.temperature_resample(
        df.repartition(13, "doc_id"), "doc_id", "grp", tau=0.3
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def _waterfill_model(avail: dict, budget: int) -> dict:
    """Independent ITERATIVE waterfilling: raise the level until it
    settles (the operator computes the closed form; agreeing with this
    fixpoint on arbitrary inputs is the semantic proof)."""
    alloc = {}
    remaining, groups = budget, dict(avail)
    while groups:
        level = remaining / len(groups)
        sat = {g: a for g, a in groups.items() if a <= level}
        if not sat:
            for g in groups:
                alloc[g] = level
            return alloc
        for g, a in sat.items():
            alloc[g] = float(a)
            remaining -= a
            del groups[g]
    return alloc


def test_waterfill_budget_matches_iterative_model(spark):
    import pyspark.sql.functions as F

    cases = [
        ({"a": 100, "b": 100, "c": 100}, 150),  # nobody saturates
        ({"a": 10, "b": 100, "c": 100}, 150),  # one saturates
        ({"a": 10, "b": 20, "c": 500}, 200),  # cascade: two saturate
        ({"a": 10, "b": 20, "c": 30}, 1000),  # budget > total: all sat
        ({"a": 7, "b": 7, "c": 7, "d": 1000}, 500),  # ties saturate
        ({"a": 1}, 0),  # zero budget
    ]
    for avail, budget in cases:
        per = spark.createDataFrame(
            [(g, a) for g, a in avail.items()], "g string, avail long"
        )
        bdf = spark.createDataFrame([(budget,)], "budget long")
        got = {
            r["g"]: r
            for r in sampling.waterfill_budget(per, "g", "avail", bdf).collect()
        }
        want = _waterfill_model(avail, budget)
        assert set(got) == set(avail)
        total = 0.0
        for g in avail:
            assert got[g]["alloc_tokens"] == round(want[g], 6), (avail, budget, g)
            assert got[g]["saturated"] == (want[g] == float(avail[g]) and want[g] <= budget), g
            assert got[g]["sample_rate"] == round(want[g] / avail[g], 6) if avail[g] else True
            total += want[g]
        assert total <= budget + 1e-6 or budget >= sum(avail.values())
