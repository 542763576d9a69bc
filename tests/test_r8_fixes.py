"""Regression tests for the round-8 defect fixes (ADVICE r6/r7 items):

- api.search_ranked: empty table raises LogDBError (was a raw
  TypeError from float(None)); score ties break deterministically.
- udtf_dynamic_schema: NULL text yields all-NULL fields, matching the
  DuckDB oracle's string_split(NULL) semantics (was ['']).
- embed_covariance_pairs: a 1-element embedding contributes no pairs
  (was: step-less sequence(0, -1) descends and emits bogus dims).
- parity_merge_upsert: the foreachBatch state pointer is a pure
  function of batch_id, so a checkpoint-recovered replay of a batch
  is idempotent and never drops prior keys (was: driver-local dict
  reset on restart).

The vacuous-Sort-assertion fix lives in test_plans.py alongside the
assertion it repairs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from tests.conftest import SF_SMALL


def test_search_ranked_empty_table_raises(spark):
    from logdb_spark.api import LogDB, LogDBError

    db = LogDB(spark)
    db.register(
        "empty_docs",
        spark.createDataFrame([], "doc_id bigint, text string"),
    )
    with pytest.raises(LogDBError, match="empty"):
        db.search_ranked("empty_docs", ["hash"], k=5)


def test_search_ranked_tie_order_deterministic(spark):
    """Identical texts score identically; without an id the facade
    tiebreaks on the text itself, so repeated runs agree."""
    from logdb_spark.api import LogDB

    db = LogDB(spark)
    rows = [(i, t) for i, t in enumerate(["b hash", "a hash", "c hash"])]
    db.register(
        "tied_docs",
        spark.createDataFrame(rows, "doc_id bigint, text string")
        .repartition(4),
    )
    texts = [
        r["text"]
        for r in db.search_ranked("tied_docs", ["hash"], k=3).collect()
    ]
    assert texts == sorted(texts)  # equal scores → text order


def test_udtf_dynamic_schema_null_text_yields_nulls(spark):
    """string_split(NULL) is NULL in the oracle → every output field
    must be NULL, not f0=''."""
    from logdb_spark.registry import all_operators

    # Running the operator registers split_n_dyn in this session.
    all_operators()["udtf_dynamic_schema"].fn(spark, SF_SMALL)
    spark.createDataFrame(
        [(1, None), (2, "x y")], "doc_id bigint, text string"
    ).createOrReplaceTempView("v_null_text")
    got = {
        r["doc_id"]: (r["f0"], r["f1"], r["f2"])
        for r in spark.sql(
            "SELECT v.doc_id, t.f0, t.f1, t.f2 FROM v_null_text v,"
            " LATERAL split_n_dyn(text, 3) t"
        ).collect()
    }
    assert got[1] == (None, None, None)
    assert got[2] == ("x", "y", None)


def test_covariance_pairs_dim1_embedding_is_inert(spark, tmp_path):
    """A 1-element embedding must contribute zero pairs: the pair
    kernel's sequence bounds are explicit-step ascending and the
    size>=2 guard keeps degenerate rows out."""
    from logdb_spark.registry import all_operators

    rows = [
        (1, [1.0, 2.0, 3.0]),
        (2, [2.0, 4.0, 6.0]),
        (3, [0.5]),  # would emit bogus [0, -1] dims pre-fix
        (4, [3.0, 1.0, 2.0]),
    ]
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = (
        all_operators()["embed_covariance_pairs"]
        .fn(spark, str(tmp_path))
        .collect()
    )
    assert out  # the dim-3 vectors still produce pairs
    for r in out:
        assert 0 <= r["dim_i"] < r["dim_j"] <= 2


def test_parity_merge_upsert_replay_is_idempotent(spark, tmp_path):
    """Simulated checkpoint recovery: run batches 0 and 1, then replay
    batch 1 (what Structured Streaming does after a crash between the
    sink write and the checkpoint commit). The replay must reproduce
    the same state — batch-0 keys retained, batch-1 superseders kept —
    because the read dir comes from batch_id parity, not driver
    memory."""
    from logdb_spark.streaming.batch_equiv import parity_merge_upsert

    states = [str(tmp_path / "state_a"), str(tmp_path / "state_b")]
    schema = "user_id bigint, ts string, event_id bigint, value double"
    b0 = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:01", 10, 1.0),
            (2, "2024-01-01 00:00:02", 11, 2.0),
        ],
        schema,
    ).withColumn("ts", F.to_timestamp("ts"))
    b1 = spark.createDataFrame(
        [(2, "2024-01-02 00:00:00", 20, 9.0)], schema
    ).withColumn("ts", F.to_timestamp("ts"))

    parity_merge_upsert(states, b0, 0)
    parity_merge_upsert(states, b1, 1)
    want = {
        (r["user_id"], r["event_id"], r["value"])
        for r in spark.read.parquet(states[1]).collect()
    }
    # user 1 from batch 0 survived; user 2 superseded by batch 1
    assert want == {(1, 10, 1.0), (2, 20, 9.0)}

    parity_merge_upsert(states, b1, 1)  # replay after "restart"
    got = {
        (r["user_id"], r["event_id"], r["value"])
        for r in spark.read.parquet(states[1]).collect()
    }
    assert got == want


def test_merge_upsert_leaves_untouched_partitions_alone(spark, tmp_path):
    """sql_merge_upsert's dynamic-overwrite claim at the FILE level:
    after the merge, every day<18 partition keeps the exact same files
    (names + mtimes + sizes) it had before — only the 18-31 window is
    rewritten. Also pins the three WHEN branches semantically against
    a direct recomputation."""
    import os

    from logdb_spark.operators.analytics import (
        _merge_apply,
        _merge_build_target,
    )
    from tests.conftest import SF_SMALL

    target = str(tmp_path / "table")
    _merge_build_target(spark, SF_SMALL, target)

    def snapshot(day_lo, day_hi):
        snap = {}
        for d in range(day_lo, day_hi + 1):
            p = f"{target}/day={d}"
            if os.path.isdir(p):
                for f in os.listdir(p):
                    st = os.stat(f"{p}/{f}")
                    snap[f"{d}/{f}"] = (st.st_mtime_ns, st.st_size)
        return snap

    before_untouched = snapshot(1, 17)
    before_window = snapshot(18, 20)
    assert before_untouched and before_window
    _merge_apply(spark, SF_SMALL, target)
    assert snapshot(1, 17) == before_untouched  # byte-for-byte same files
    assert snapshot(18, 20) != before_window  # the window WAS rewritten

    # Branch semantics vs direct recomputation.
    got = {
        (r["user_id"], r["day"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(target).collect()
    }
    ev = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    rows = ev.selectExpr(
        "user_id", "dayofmonth(ts) AS day", "event_type", "value"
    ).collect()
    want = {}
    for r in rows:  # days < 18: everything; days >= 18: good rows only
        if r["day"] < 18 or r["event_type"] != "error":
            k = (r["user_id"], r["day"])
            n, s = want.get(k, (0, 0.0))
            want[k] = (n + 1, s + r["value"])
    assert set(got) == set(want)
    for k, (n, _s) in want.items():
        assert got[k][0] == n
