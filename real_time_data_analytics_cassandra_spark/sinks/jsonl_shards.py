"""Custom Python Data Source WRITER: size-budgeted JSONL training
shards — the "write the training data" step at the end of the
pipeline, shaped for data-loader consumption (fixed-count shard files
of JSON lines, a manifest, deterministic contents).

Completes the custom-connector seam the engine opened with the
amqp_dump READER (sources/amqp_dump.py): the Spark 4 Python Data
Source API's write half — per-task ``write(iterator)`` producing a
commit message, driver-side ``commit``/``abort`` finishing the job —
is exactly how an exporter to a real feature store / dataset registry
would plug in.

Commit protocol (task-retry safe): every task streams its rows to a
UNIQUE staging file under ``<path>/_staging/``; only the driver's
``commit`` renames the acknowledged files into place and writes
``_MANIFEST.json`` (shard list + row/byte counts).  A retried or
speculated task leaves an orphan staging file that ``commit`` ignores
and cleans; ``abort`` removes the staging dir.  Readers trust only
the manifest — a crashed job is invisible, like sinks/snapshots.py.

Determinism: shard ASSIGNMENT comes from the upstream
repartition(n, hash(id)) in :func:`export_jsonl_shards`, a pure
function of the data; within a shard, rows are written in the sorted
order of the partition iterator.  Rerunning the export reproduces
byte-identical shards (tested).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)

MANIFEST = "_MANIFEST.json"


class ShardCommit(WriterCommitMessage):
    def __init__(self, staged: str, n_rows: int, n_bytes: int):
        self.staged = staged
        self.n_rows = n_rows
        self.n_bytes = n_bytes


class JsonlShardsDataSource(DataSource):
    """``df.write.format("jsonl_shards").option("path", dir).save()``
    — one ``shard-NNNNN.jsonl`` per input partition plus a manifest."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_shards"

    def writer(self, schema, overwrite: bool) -> "JsonlShardsWriter":
        return JsonlShardsWriter(self.options, schema, overwrite)


class JsonlShardsWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_shards requires option 'path'")
        self.columns = [f.name for f in schema.fields]
        self.overwrite = overwrite

    def write(self, iterator) -> ShardCommit:
        os.makedirs(os.path.join(self.path, "_staging"), exist_ok=True)
        staged = os.path.join(
            self.path, "_staging", f"task-{uuid.uuid4().hex}.jsonl"
        )
        n_rows = n_bytes = 0
        with open(staged, "w", encoding="utf-8") as fh:
            for row in iterator:
                line = json.dumps(
                    {c: row[c] for c in self.columns},
                    ensure_ascii=False,
                    sort_keys=False,
                    default=str,  # timestamps/dates/decimals
                )
                fh.write(line)
                fh.write("\n")
                n_rows += 1
                n_bytes += len(line.encode()) + 1
        return ShardCommit(staged, n_rows, n_bytes)

    def commit(self, messages) -> None:
        import shutil

        if self.overwrite:
            for name in os.listdir(self.path):
                if name.startswith("shard-") or name == MANIFEST:
                    os.remove(os.path.join(self.path, name))
        shards = []
        for i, msg in enumerate(messages):
            final = os.path.join(self.path, f"shard-{i:05d}.jsonl")
            os.rename(msg.staged, final)
            shards.append(
                {
                    "file": os.path.basename(final),
                    "n_rows": msg.n_rows,
                    "n_bytes": msg.n_bytes,
                }
            )
        staging = os.path.join(self.path, "_staging")
        if os.path.isdir(staging):
            shutil.rmtree(staging)  # orphans from retried tasks
        manifest = {
            "shards": shards,
            "n_rows": sum(s["n_rows"] for s in shards),
            "n_bytes": sum(s["n_bytes"] for s in shards),
            "columns": self.columns,
        }
        tmp = os.path.join(self.path, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, os.path.join(self.path, MANIFEST))

    def abort(self, messages) -> None:
        import shutil

        staging = os.path.join(self.path, "_staging")
        if os.path.isdir(staging):
            shutil.rmtree(staging)


def register(spark) -> None:
    """Idempotent registration of the writer with a session."""
    spark.dataSource.register(JsonlShardsDataSource)


def export_jsonl_shards(
    df,
    path: str,
    key: str,
    target_shard_mb: int = 64,
) -> dict:
    """Size-budgeted, deterministic JSONL export: measure the exact
    serialized bytes with ONE aggregate over ``to_json`` (no sampling
    guesswork), derive the shard count, hash-repartition on ``key``
    (shard membership a pure function of the data — epoch-stable,
    cluster-size-independent), sort within shards, write through the
    jsonl_shards DataSource.  Returns the manifest dict.

    At 100 TB: the measuring pass is scan-bound map-side arithmetic;
    the export shuffle is the unavoidable one that sizes shards;
    everything downstream (data loaders) reads the manifest, never
    lists directories."""
    from pyspark.sql import functions as F

    spark = df.sparkSession
    register(spark)
    total = (
        df.select(
            (F.length(F.to_json(F.struct(*df.columns))) + 1).alias("b")
        )
        .agg(F.sum("b"))
        .collect()[0][0]
        or 0
    )
    n_shards = max(1, -(-int(total) // (target_shard_mb * 1024 * 1024)))
    # hash-repartition directly on the key: shard membership =
    # hash(key) mod n, a pure function of the data for a given shard
    # count — no intermediate shard column whose re-hash could fold
    # two shard ids into one task
    (
        df.repartition(n_shards, F.col(key))
        .sortWithinPartitions(key)
        .write.format("jsonl_shards")
        .mode("overwrite")
        .option("path", path)
        .save()
    )
    with open(os.path.join(path, MANIFEST)) as fh:
        return json.load(fh)
