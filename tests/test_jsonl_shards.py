"""JSONL shard-export sink invariants (sinks/jsonl_shards.py): the
Spark 4 Python DataSource WRITER path — manifest-trusted commits,
size budgeting, byte-reproducible shards, round-trip fidelity.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from real_time_data_analytics_cassandra_spark.catalog import table
from real_time_data_analytics_cassandra_spark.sinks.jsonl_shards import (
    MANIFEST,
    export_jsonl_shards,
)
from tests.conftest import SF_SMOKE


def _shard_bytes(path):
    return {
        name: open(os.path.join(path, name), "rb").read()
        for name in sorted(os.listdir(path))
        if name.startswith("shard-")
    }


def test_export_round_trips_and_manifest_counts(spark, tmp_path):
    path = str(tmp_path / "shards")
    docs = table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    manifest = export_jsonl_shards(docs, path, key="doc_id", target_shard_mb=64)
    assert manifest["n_rows"] == docs.count()
    assert manifest["columns"] == ["doc_id", "text", "lang", "source"]
    # round trip through a plain JSON reader
    back = spark.read.schema(
        "doc_id long, text string, lang string, source string"
    ).json(os.path.join(path, "shard-*.jsonl"))
    a = sorted(map(tuple, back.collect()))
    b = sorted(map(tuple, docs.collect()))
    assert a == b
    # manifest byte counts match the files on disk
    on_disk = _shard_bytes(path)
    assert sum(len(v) for v in on_disk.values()) == manifest["n_bytes"]
    assert len(on_disk) == len(manifest["shards"])


def test_export_size_budget_drives_shard_count(spark, tmp_path):
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    small = export_jsonl_shards(
        docs, str(tmp_path / "small"), key="doc_id", target_shard_mb=64
    )
    assert len(small["shards"]) == 1
    # ~150KB of text at sf0.001; a tiny budget must split it. The
    # helper computes exact serialized bytes, so the count is
    # ceil(total / budget), not a sample estimate.
    tiny_budget_mb = 1  # floor of the int API
    tiny = export_jsonl_shards(
        docs, str(tmp_path / "tiny"), key="doc_id",
        target_shard_mb=tiny_budget_mb,
    )
    expected = -(-small["n_bytes"] // (tiny_budget_mb * 1024 * 1024))
    assert len(tiny["shards"]) == max(1, expected)


def test_export_is_byte_reproducible(spark, tmp_path):
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
    export_jsonl_shards(docs, p1, key="doc_id", target_shard_mb=64)
    export_jsonl_shards(
        docs.repartition(13), p2, key="doc_id", target_shard_mb=64
    )
    assert _shard_bytes(p1) == _shard_bytes(p2)


def test_overwrite_replaces_previous_export(spark, tmp_path):
    path = str(tmp_path / "shards")
    docs = table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    export_jsonl_shards(docs, path, key="doc_id")
    m2 = export_jsonl_shards(
        docs.filter(F.col("doc_id") < 10), path, key="doc_id"
    )
    assert m2["n_rows"] == 10
    with open(os.path.join(path, MANIFEST)) as fh:
        assert json.load(fh)["n_rows"] == 10
    back = spark.read.schema("doc_id long, text string").json(
        os.path.join(path, "shard-*.jsonl")
    )
    assert back.count() == 10
    assert not os.path.isdir(os.path.join(path, "_staging"))
