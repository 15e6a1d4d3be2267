"""End-to-end corpus RELEASE: the composition a training-data team
actually ships — curate (dedup + quality gate) → audited snapshot
commit (WAP) → time-travel-stable version → JSONL shard export —
proving the operator library and the two sinks compose, and that the
released bytes are REPRODUCIBLE from the snapshot version alone.
"""

from __future__ import annotations

import glob
import hashlib

from pyspark.sql import functions as F

from real_time_data_analytics_cassandra_spark.catalog import table
from real_time_data_analytics_cassandra_spark.operators.dedup import (
    normalized_fingerprints,
)
from real_time_data_analytics_cassandra_spark.sinks import snapshots as snap
from real_time_data_analytics_cassandra_spark.sinks.jsonl_shards import (
    export_jsonl_shards,
)
from tests.conftest import SF_SMOKE


def _shard_digest(path: str) -> dict:
    out = {}
    for f in sorted(glob.glob(path + "/shard-*.jsonl")):
        out[f.rsplit("/", 1)[1]] = hashlib.md5(open(f, "rb").read()).hexdigest()
    return out


def test_corpus_release_is_audited_and_reproducible(spark, tmp_path):
    docs = table(spark, SF_SMOKE, "documents")

    # 1. curate: drop normalized-fingerprint dups (keep min doc_id),
    #    keep docs of at least 5 tokens
    fp = normalized_fingerprints(docs, "doc_id", "text")
    keep = fp.groupBy("fingerprint").agg(F.min("doc_id").alias("doc_id"))
    curated = (
        docs.join(keep, "doc_id")
        .filter(F.size(F.split("text", " ")) >= 5)
        .select("doc_id", "text", "lang", "source")
    )
    n_curated = curated.count()
    assert 0 < n_curated <= docs.count()

    # 2. audited snapshot commit: the release is a VERSION, gated on
    #    expectations evaluated against the staged files
    tbl = str(tmp_path / "corpus")
    version, report = snap.write_snapshot_audited(
        curated,
        tbl,
        {
            "doc_id_present": F.col("doc_id").isNotNull(),
            "text_nonempty": F.length("text") > 0,
        },
    )
    assert version == 1 and all(r["passed"] for r in report)

    # 3. export shards FROM the committed version (not the live frame)
    released = snap.read_snapshot(spark, tbl, version=version)
    out1 = str(tmp_path / "rel1")
    manifest = export_jsonl_shards(released, out1, key="doc_id")
    assert manifest["n_rows"] == n_curated

    # 4. reproducibility: a second export from the SAME version, after
    #    the table moved on, is byte-identical shard for shard
    snap.write_snapshot(
        spark.createDataFrame(
            [(10_000_001, "late arrival", "en", "src0")],
            "doc_id long, text string, lang string, source string",
        ),
        tbl,
        mode="append",
    )
    out2 = str(tmp_path / "rel2")
    export_jsonl_shards(
        snap.read_snapshot(spark, tbl, version=version), out2, key="doc_id"
    )
    d1, d2 = _shard_digest(out1), _shard_digest(out2)
    assert d1 and d1 == d2

    # 5. the moved-on table releases a superset next time
    assert snap.read_snapshot(spark, tbl).count() == n_curated + 1
