"""Custom stateful streaming operators (applyInPandasWithState).

Spark's built-in streaming aggregations cover windowed counts, session
merge, dedup, and joins; anything with bespoke per-key state — rolling
buffers, alert machines, CUSUM trackers — drops to
``applyInPandasWithState``: the group's rows arrive as Arrow-batched
pandas frames, the operator owns an explicit GroupState value, and the
state store scales it like any built-in stateful op (per-key state,
checkpointed, watermark-evictable via timeouts).

Scale notes:
- State here is a bounded buffer (per-second error buckets within the
  trailing day), so per-key state is O(window), not O(stream).
- The shuffle is on user_id only — same key the batch twin
  (batch_equiv.rolling_error_alerts) groups on.
- Equality with the batch form holds when micro-batches arrive in
  event-time order (log replay / ordered ingestion); the harness test
  stages time-split files with maxFilesPerTrigger=1 to prove exactly
  that, and same-second ties are pre-bucketed so ordering within a
  second cannot matter.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ALERT_WINDOW_S = 86400
ALERT_THRESHOLD = 3

_OUT_SCHEMA = "user_id bigint, alert_ts timestamp, n_recent_errors bigint"
# parallel arrays: second-bucket epoch + error count in that bucket
_STATE_SCHEMA = "secs array<long>, cnts array<long>"


def _alert_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: Any
) -> Iterator[pd.DataFrame]:
    secs, cnts = ([], []) if not state.exists else (
        list(state.get[0]),
        list(state.get[1]),
    )
    batch = pd.concat(list(pdfs))
    # pre-bucket to per-second counts, in time order (mirrors the
    # batch twin's groupBy(user, second))
    bucketed = (
        batch.assign(sec=batch["ts"].astype("int64") // 10**9)
        .groupby("sec")
        .size()
        .sort_index()
    )
    out_sec, out_n = [], []
    for sec, n in bucketed.items():
        # evict buckets outside [sec-window, sec]; buffer stays O(window)
        while secs and secs[0] < sec - ALERT_WINDOW_S:
            secs.pop(0)
            cnts.pop(0)
        secs.append(int(sec))
        cnts.append(int(n))
        rolling = sum(cnts)
        if rolling >= ALERT_THRESHOLD:
            out_sec.append(int(sec))
            out_n.append(rolling)
    state.update((secs, cnts))
    yield pd.DataFrame(
        {
            "user_id": pd.Series([key[0]] * len(out_sec), dtype="int64"),
            "alert_ts": pd.to_datetime(pd.Series(out_sec, dtype="int64") * 10**9),
            "n_recent_errors": pd.Series(out_n, dtype="int64"),
        }
    )


def stateful_alerts_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of batch_equiv.rolling_error_alerts: per-user
    GroupState buffer of trailing error buckets, alerts appended as
    each micro-batch advances the buffer."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", F.date_trunc("second", "ts").alias("ts")
    )
    return errors.groupBy("user_id").applyInPandasWithState(
        _alert_fn,
        _OUT_SCHEMA,
        _STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


# --- transformWithStateInPandas (Spark 4 stateful processor API) -----

TWS_OUT_SCHEMA = "user_id bigint, n_purchases bigint, total_spend double"


def make_spend_processor():
    """Per-user purchase tracker on the Spark 4 StatefulProcessor API —
    the successor surface to applyInPandasWithState: explicit typed
    state handles (ValueState here; ListState/MapState/timers exist on
    the same handle), RocksDB-backed per-key state, watermark-driven
    lifecycle. State per key is TWO numbers (count, sum) — O(1), the
    cheapest possible stateful operator; emission is one updated row
    per key per micro-batch (Update mode)."""
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import (
        DoubleType, LongType, StructField, StructType,
    )

    class SpendProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState(
                "agg",
                StructType(
                    [
                        StructField("n", LongType()),
                        StructField("total", DoubleType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total = (0, 0.0) if not self._agg.exists() else self._agg.get()
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._agg.update((int(n), float(total)))
            yield pd.DataFrame(
                {
                    "user_id": pd.Series([key[0]], dtype="int64"),
                    "n_purchases": pd.Series([n], dtype="int64"),
                    "total_spend": pd.Series([total], dtype="float64"),
                }
            )

        def close(self) -> None:
            pass

    return SpendProcessor()


def tws_spend_stream(events: DataFrame) -> DataFrame:
    """Streaming twin of batch_equiv.purchase_totals via
    transformWithStateInPandas."""
    return (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=make_spend_processor(),
            outputStructType=TWS_OUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
