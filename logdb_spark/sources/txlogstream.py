"""Streaming/batch DataSource over a §2.O transaction-log table.

The missing half of the table-format story: not just writing through
the log, but READING it as a stream — Structured Streaming offsets
ARE commit versions (the public Delta streaming-source design: an
offset names a log position; each micro-batch is the files added by
the commits in (start, end]). This is the full Spark 4
``DataSourceStreamReader`` surface — the partition-planned variant,
not the driver-side Simple reader: ``partitions(start, end)``
enumerates one InputPartition per data file touched in the version
range (planned driver-side from pure log metadata), and ``read()``
scans that one file on an EXECUTOR with pyarrow — row data never
visits the driver, and the scan yields ``pyarrow.RecordBatch``
directly (Arrow-columnar end to end; no per-row Python objects —
ADVICE r10 #2 closed).

Exactly-once replay is by construction: a version range names an
immutable set of immutable files, so ``partitions(start, end)``
re-planned after a checkpoint recovery yields bit-identical batches —
the same property Kafka offsets or file sequence numbers provide.

Two feeds over the same log:

- **append mode** (default): every file ADDED by commits in the range
  emits once, tagged with its commit version. Removes are metadata
  events and are not emitted.
- **cdf mode** (``option("mode", "cdf")``): the row-level CHANGE DATA
  FEED — each commit emits ``change_type='insert'`` rows from its
  added files AND ``change_type='delete'`` rows read from the
  PRE-IMAGES of its removed files (the remove actions carry the full
  add-entry of the file they drop, and the dropped file stays on disk
  until retention vacuum — the CDF read horizon). Applying each
  version's deletes then inserts reproduces the snapshot exactly
  (retraction semantics; a COW rewrite emits the old file as deletes
  and the rewritten file as inserts, which nets to the row-level
  change).

Scale: offset arithmetic and partition planning are O(files-per-
commit) metadata; per-batch read cost is the touched files' bytes,
exactly the hourly-ingest-sized increment a downstream consumer
wants.
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
    """One data file touched by one commit — the read unit.
    ``change`` is 'insert' for added files, 'delete' for the
    pre-image of removed files (cdf mode plans both)."""

    def __init__(self, version: int, path: str, change: str = "insert"):
        self.version = version
        self.path = path
        self.change = change


def _plan(root: str, lo: int, hi: int, cdf: bool = False) -> list[_FileSlice]:
    """One partition per file touched by commits in (lo, hi] — pure
    log metadata, no data access. Append mode plans adds only; cdf
    mode also plans each removed file's pre-image as a delete slice."""
    out = []
    for v in _log_versions(root):
        if not lo < v <= hi:
            continue
        doc = _commit_doc(root, v)
        if cdf:
            out += [
                _FileSlice(
                    v,
                    os.path.join(
                        root, r["path"] if isinstance(r, dict) else r
                    ),
                    "delete",
                )
                for r in doc["remove"]
            ]
        out += [
            _FileSlice(v, os.path.join(root, a["path"]))
            for a in doc["add"]
        ]
    return out


def _read_slice(part: _FileSlice, cdf: bool = False):
    """Executor-side scan of one immutable parquet data file (a
    directory written by one partitionBy task). Arrow-columnar end to
    end: yields ``pyarrow.RecordBatch`` in the feed schema — constant
    version/change_type columns prepended to the projected scan, no
    per-row Python objects anywhere."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(part.path, columns=["event_id", "user_id"])
    n = t.num_rows
    cols = {"version": pa.array([part.version] * n, pa.int64())}
    if cdf:
        cols["change_type"] = pa.array([part.change] * n, pa.string())
    cols["event_id"] = t.column("event_id").cast(pa.int64())
    cols["user_id"] = t.column("user_id").cast(pa.int64())
    yield from pa.table(cols).combine_chunks().to_batches()


class _TxlogBatchReader(DataSourceReader):
    def __init__(self, options):
        self.root = options["path"]
        self.cdf = options.get("mode", "append") == "cdf"
        self.lo = int(options.get("from_version", 0))
        to = options.get("to_version")
        self.hi = (
            int(to) if to is not None else max(_log_versions(self.root), default=0)
        )

    def partitions(self):
        return _plan(self.root, self.lo, self.hi, cdf=self.cdf)

    def read(self, partition: _FileSlice):
        # An empty partitions() list makes the engine send one None
        # partition (plan_data_source_read substitutes it); an empty
        # range/table must read as empty, not crash (ADVICE r10 #1).
        if partition is None:
            return iter(())
        return _read_slice(partition, cdf=self.cdf)


class _TxlogStreamReader(DataSourceStreamReader):
    """Offsets are commit versions: {"version": n} means "everything
    through commit n has been emitted". The engine picks each batch's
    range as (last committed offset, latestOffset()]; ``partitions``
    must plan EXACTLY that range (throttling belongs in latestOffset,
    which here always exposes the current log head — one micro-batch
    per trigger covers the commits that arrived since the last)."""

    def __init__(self, options):
        self.root = options["path"]
        self.cdf = options.get("mode", "append") == "cdf"

    def initialOffset(self):
        return {"version": 0}

    def latestOffset(self):
        return {"version": max(_log_versions(self.root), default=0)}

    def partitions(self, start, end):
        return _plan(
            self.root, start["version"], end["version"], cdf=self.cdf
        )

    def read(self, partition: _FileSlice):
        return _read_slice(partition, cdf=self.cdf)

    def commit(self, end):
        pass  # offsets are durable in the checkpoint; nothing to ack


class TxlogStreamDataSource(DataSource):
    """spark.read/.readStream .format("txlogstream").option("path", root)
    [.option("mode", "cdf")]"""

    @classmethod
    def name(cls) -> str:
        return "txlogstream"

    def schema(self) -> str:
        if self.options.get("mode", "append") == "cdf":
            return (
                "version bigint, change_type string,"
                " event_id bigint, user_id bigint"
            )
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
