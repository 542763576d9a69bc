"""Streaming/batch DataSource over a §2.O transaction-log table.

The missing half of the table-format story: not just writing through
the log, but READING it as a stream — Structured Streaming offsets
ARE commit versions (the public Delta streaming-source design: an
offset names a log position; each micro-batch is the files added by
the commits in (start, end]). This is the full Spark 4
``DataSourceStreamReader`` surface — the partition-planned variant,
not the driver-side Simple reader: ``partitions(start, end)``
enumerates one InputPartition per data file added in the version
range (planned driver-side from pure log metadata), and ``read()``
scans that one file on an EXECUTOR with pyarrow — row data never
visits the driver.

Exactly-once replay is by construction: a version range names an
immutable set of immutable files, so ``partitions(start, end)``
re-planned after a checkpoint recovery yields bit-identical batches —
the same property Kafka offsets or file sequence numbers provide.

Semantics: an APPEND feed — every file added by commits in the range
is emitted once, tagged with its commit version (removes are
metadata-only events and are not emitted; a row-level CDF would pair
this with the remove log). Scale: offset arithmetic and partition
planning are O(files-per-commit) metadata; per-batch read cost is the
new files' bytes, exactly the hourly-ingest-sized increment a
downstream consumer wants.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_VFILE = re.compile(r"^v(\d{6})\.json$")


def _log_versions(root: str) -> list[int]:
    log_dir = os.path.join(root, "_txlog")
    return sorted(
        int(m.group(1))
        for f in os.listdir(log_dir)
        if (m := _VFILE.match(f))
    )


def _commit_doc(root: str, version: int) -> dict:
    with open(os.path.join(root, "_txlog", f"v{version:06d}.json")) as f:
        return json.load(f)


class _FileSlice(InputPartition):
    """One data file added by one commit — the read unit."""

    def __init__(self, version: int, path: str):
        self.version = version
        self.path = path


def _plan(root: str, lo: int, hi: int) -> list[_FileSlice]:
    """One partition per file added by commits in (lo, hi] — pure
    log metadata, no data access."""
    return [
        _FileSlice(v, os.path.join(root, a["path"]))
        for v in _log_versions(root)
        if lo < v <= hi
        for a in _commit_doc(root, v)["add"]
    ]


def _read_slice(part: _FileSlice):
    """Executor-side scan of one immutable parquet data file (a
    directory written by one partitionBy task). Arrow-columnar read,
    projected to the feed schema; the driver never sees row data."""
    import pyarrow.parquet as pq

    t = pq.read_table(part.path, columns=["event_id", "user_id"])
    ids = t.column("event_id").to_pylist()
    users = t.column("user_id").to_pylist()
    for eid, uid in zip(ids, users):
        yield (part.version, eid, uid)


class _TxlogBatchReader(DataSourceReader):
    def __init__(self, options):
        self.root = options["path"]
        self.lo = int(options.get("from_version", 0))
        to = options.get("to_version")
        self.hi = (
            int(to) if to is not None else max(_log_versions(self.root), default=0)
        )

    def partitions(self):
        return _plan(self.root, self.lo, self.hi)

    def read(self, partition: _FileSlice):
        return _read_slice(partition)


class _TxlogStreamReader(DataSourceStreamReader):
    """Offsets are commit versions: {"version": n} means "everything
    through commit n has been emitted". The engine picks each batch's
    range as (last committed offset, latestOffset()]; ``partitions``
    must plan EXACTLY that range (throttling belongs in latestOffset,
    which here always exposes the current log head — one micro-batch
    per trigger covers the commits that arrived since the last)."""

    def __init__(self, options):
        self.root = options["path"]

    def initialOffset(self):
        return {"version": 0}

    def latestOffset(self):
        return {"version": max(_log_versions(self.root), default=0)}

    def partitions(self, start, end):
        return _plan(self.root, start["version"], end["version"])

    def read(self, partition: _FileSlice):
        return _read_slice(partition)

    def commit(self, end):
        pass  # offsets are durable in the checkpoint; nothing to ack


class TxlogStreamDataSource(DataSource):
    """spark.read/.readStream .format("txlogstream").option("path", root)"""

    @classmethod
    def name(cls) -> str:
        return "txlogstream"

    def schema(self) -> str:
        return "version bigint, event_id bigint, user_id bigint"

    def reader(self, schema):
        return _TxlogBatchReader(self.options)

    def streamReader(self, schema):
        return _TxlogStreamReader(self.options)


_REGISTERED_SESSIONS: set[int] = set()


def register_txlogstream(spark) -> None:
    """Idempotent per-session registration."""
    key = id(spark)
    if key not in _REGISTERED_SESSIONS:
        spark.dataSource.register(TxlogStreamDataSource)
        _REGISTERED_SESSIONS.add(key)
