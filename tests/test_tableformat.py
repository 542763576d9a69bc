"""Physical-property tests for §2.O (transaction-log table format).

The oracle suite (tests/test_correctness.py) already hash-checks every
table-format operator's VALUES; these tests pin the PHYSICAL claims the
values alone cannot prove: copy-on-write leaves untouched files
byte-identical, data skipping actually scans fewer files, the commit
protocol is genuinely atomic-exclusive, and snapshot isolation holds
under concurrent append.
"""

from __future__ import annotations

import glob
import hashlib
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _dir_digest(path: str) -> str:
    """Order-stable digest of every data byte under a parquet dir."""
    h = hashlib.sha256()
    for f in sorted(glob.glob(f"{path}/**/*.parquet", recursive=True)):
        h.update(f.encode())
        with open(f, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()


@pytest.fixture(scope="module")
def year_table(spark):
    from logdb_spark.operators.tableformat import _year_table

    return _year_table(spark, SF_SMALL)


def test_cow_delete_leaves_untouched_files_byte_identical(spark):
    """The COW contract: files without matches are NOT rewritten — the
    commit only swaps log references. Digest every untouched year-file
    before and after the delete; any byte difference fails."""
    from logdb_spark.sources.load import load_table
    from logdb_spark.sources.scratch import scratch_dir
    from logdb_spark.tablefmt import TxTable, write_grouped

    orders = load_table(spark, SF_SMALL, "orders").withColumn(
        "g", F.year("o_orderdate")
    )
    tx = TxTable(spark, scratch_dir("tt_cow_"))
    adds = write_grouped(orders, tx.root, "data1", "o_orderkey")
    tx.commit(adds)
    untouched = [a["path"] for a in adds if a["path"].split("=")[1] not in ("1996", "1999")]
    before = {p: _dir_digest(os.path.join(tx.root, p)) for p in untouched}

    pred = (F.col("o_orderstatus") == "P") & F.col("g").isin(1996, 1999)
    snap = tx.read().withColumn("g", F.year("o_orderdate"))
    rewrite = snap.filter(F.col("g").isin(1996, 1999)).filter(~pred)
    adds_rw = write_grouped(rewrite, tx.root, "rw1", "o_orderkey")
    tx.commit(adds_rw, removes=["data1/g=1996", "data1/g=1999"])

    after = {p: _dir_digest(os.path.join(tx.root, p)) for p in untouched}
    assert before == after, "COW delete rewrote an untouched file"
    live = {e["path"] for e in tx.live_files()}
    assert "data1/g=1996" not in live and "rw1/g=1996" in live


def test_skipping_scan_reads_only_pruned_files(spark):
    """Data skipping must shrink the SCAN, not just the result: the
    pruned snapshot read's inputFiles() must touch only the selected
    octile dirs — 2 of 8."""
    from logdb_spark.sources.load import load_table
    from logdb_spark.sources.scratch import scratch_dir
    from logdb_spark.tablefmt import TxTable, write_grouped

    orders = load_table(spark, SF_SMALL, "orders")
    w = orders.agg(F.max("o_custkey")).first()[0] + 1
    keyed = orders.withColumn(
        "g", F.expr(f"CAST((o_custkey * 8) DIV {w} AS BIGINT)")
    )
    tx = TxTable(spark, scratch_dir("tt_skip_"))
    tx.commit(write_grouped(keyed, tx.root, "data1", "o_custkey"))
    lo, hi = (w * 5) // 16, (w * 7) // 16
    hit, total = tx.prune("o_custkey", lo, hi)
    assert total == 8 and len(hit) == 2
    hit_dirs = {e["path"] for e in hit}
    for f in tx.read(files=hit).inputFiles():
        assert any(f"/{d}/" in f or f.rstrip("/").endswith(d) or d in f for d in hit_dirs), f
    # and the pruned read misses no qualifying row vs the full scan
    full = tx.read().filter(F.col("o_custkey").between(lo, hi)).count()
    pruned = tx.read(files=hit).filter(F.col("o_custkey").between(lo, hi)).count()
    assert full == pruned > 0


def test_commit_create_is_exclusive(year_table):
    """Exactly one writer owns a version number: the second
    try_commit on the same version must raise CommitConflict and must
    NOT clobber the winner's commit document."""
    from logdb_spark.tablefmt import CommitConflict

    tx, _ = year_table
    parent = tx.latest_version()
    tx.try_commit(parent + 1, [{"path": "data1/g=1995"}])
    doc_before = open(tx._vpath(parent + 1)).read()
    with pytest.raises(CommitConflict):
        tx.try_commit(parent + 1, [{"path": "data1/g=1996"}])
    assert open(tx._vpath(parent + 1)).read() == doc_before


def test_snapshot_isolation_under_append(spark):
    """A reader pinned to version 1 sees identical results before and
    after a concurrent append commit — the time-travel guarantee the
    log exists to provide."""
    from logdb_spark.sources.load import load_table
    from logdb_spark.sources.scratch import scratch_dir
    from logdb_spark.tablefmt import TxTable, write_grouped

    orders = load_table(spark, SF_SMALL, "orders").withColumn(
        "g", F.year("o_orderdate")
    )
    tx = TxTable(spark, scratch_dir("tt_iso_"))
    v1, _ = tx.commit(
        write_grouped(orders.filter("g <= 1997"), tx.root, "a", "o_orderkey")
    )
    n_before = tx.read(as_of=v1).count()
    tx.commit(
        write_grouped(orders.filter("g > 1997"), tx.root, "b", "o_orderkey")
    )
    assert tx.read(as_of=v1).count() == n_before
    assert tx.read().count() > n_before


def test_compaction_preserves_content_and_shrinks_files(spark):
    """Compaction is a pure physical rewrite: the multiset of
    (o_orderkey) must be identical pre/post, and the live file count
    must drop to the bin count."""
    from logdb_spark.operators.tableformat import table_compact_binpack

    row = table_compact_binpack(spark, SF_SMALL).first()
    assert row["files_after"] < row["files_before"]
    assert row["files_before"] >= 70  # ~80 months of fixture data
    assert row["files_after"] <= 12  # cap rule packs into ~10-11 bins
