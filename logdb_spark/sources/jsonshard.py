"""A custom batch SINK via the Python DataSource API (Spark 4).

``jsonshard`` writes one JSONL shard per task and implements the
writer commit protocol: each task's ``write()`` returns a
WriterCommitMessage naming its shard and row count, and ``commit()``
runs exactly once on the driver AFTER every task succeeded — the
all-or-nothing contract that makes a custom sink safe under task
retries and speculative execution (an aborted attempt's message
never reaches commit, so its shard is never acknowledged). At 100 TB
the same three methods wrap any idempotent upstream store: write one
shard per task, acknowledge in the commit message, finalize a
manifest in commit().
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceStreamArrowWriter,
    WriterCommitMessage,
)


class _ShardCommit(WriterCommitMessage):
    def __init__(self, path: str, n: int):
        self.path = path
        self.n = n


def _write_batches(path: str, batches) -> int:
    """Shared shard body: Arrow record batches → JSON lines.

    Arrow writer instead of the Row iterator (r13, guide §4.1/§4.2):
    the Row path materializes a pyspark Row per record and calls
    .asDict() per row before json.dumps ever runs; ``to_pylist()``
    yields the same plain-python dicts straight from the Arrow
    buffers. Output bytes are identical — same keys, same values,
    same sort_keys ordering — only the JVM↔Python serialization
    changes."""
    n = 0
    with open(path, "w") as f:
        for batch in batches:
            rows = batch.to_pylist()
            f.writelines(
                json.dumps(r, sort_keys=True) + "\n" for r in rows
            )
            n += len(rows)
    return n


class _JsonShardWriter(DataSourceArrowWriter):
    def __init__(self, options):
        self.dir = options["path"]

    def write(self, batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(self.dir, f"part-{pid:05d}.jsonl")
        return _ShardCommit(path, _write_batches(path, batches))

    def commit(self, messages):
        manifest = {
            "files": sorted(os.path.basename(m.path) for m in messages),
            "rows": sum(m.n for m in messages),
        }
        with open(os.path.join(self.dir, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f, sort_keys=True)

    def abort(self, messages):
        for m in messages:  # roll back acknowledged shards
            try:
                os.remove(m.path)
            except OSError:
                pass


class _JsonShardStreamWriter(DataSourceStreamArrowWriter):
    """Streaming flavor of the shard sink: same write-one-shard-per-
    task contract, but commit()/abort() arrive PER MICRO-BATCH with
    the batchId — the streaming epoch protocol. Each batch finalizes
    its own ``_MANIFEST-<batchId>.json`` naming exactly the shards of
    that epoch, so a downstream consumer reads acknowledged batches
    only; an aborted epoch's shards are unlinked and its manifest
    never appears (the at-least-once file writes become exactly-once
    through manifest-gated visibility — the standard streaming-sink
    idempotence recipe). Shard names carry a uuid: two attempts of
    the same task must never collide across retries or epochs.
    Arrow-batch flavor since r13 (see _write_batches)."""

    def __init__(self, options):
        self.dir = options["path"]

    def write(self, iterator):
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(
            self.dir, f"part-{pid:05d}-{uuid.uuid4().hex}.jsonl"
        )
        return _ShardCommit(path, _write_batches(path, iterator))

    def commit(self, messages, batchId):
        manifest = {
            "batch": batchId,
            "files": sorted(
                os.path.basename(m.path) for m in messages if m is not None
            ),
            "rows": sum(m.n for m in messages if m is not None),
        }
        path = os.path.join(self.dir, f"_MANIFEST-{batchId:05d}.json")
        with open(path, "w") as f:
            json.dump(manifest, f, sort_keys=True)

    def abort(self, messages, batchId):
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(m.path)
            except OSError:
                pass


class JsonShardDataSource(DataSource):
    """df.write.format("jsonshard").option("path", dir).save() — and
    df.writeStream.format("jsonshard") via streamWriter()."""

    @classmethod
    def name(cls) -> str:
        return "jsonshard"

    def writer(self, schema, overwrite):
        return _JsonShardWriter(self.options)

    def streamWriter(self, schema, overwrite):
        return _JsonShardStreamWriter(self.options)


def register_jsonshard(spark) -> None:
    """Idempotent per-session registration — marker ON the session, so
    its lifetime is the session's (ADVICE r12 #4: an id()-keyed module
    set can mistake a new session for a dead one whose id CPython
    recycled)."""
    if not getattr(spark, "_logdb_jsonshard_registered", False):
        spark.dataSource.register(JsonShardDataSource)
        spark._logdb_jsonshard_registered = True
