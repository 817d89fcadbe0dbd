"""Custom stateful streaming operator: per-user sessionization with
``applyInPandasWithState`` (Structured Streaming's arbitrary-state
API — the slot for operators the built-in ``session_window`` cannot
express, e.g. when session state must carry custom accumulators).

Semantics match the batch ``operators.events.sessionize`` exactly: a
session closes when the gap to the user's previous event exceeds
``gap_minutes``; a closed session row carries (user_id, sess_no,
n_events, floor(sum(value)), sess_start). Sessions close either when
a later event proves the gap, or when the EVENT-TIME TIMEOUT fires —
the watermark passing last_event + gap — so results are append-mode
and deterministic under replay (state lives in the checkpoint).

Scale shape (100 TB thinking): state is keyed by user_id — a hash
shuffle with no hot keys (one small fixed-size state row per user,
not per event); the watermark bounds state lifetime so the store
holds only users active within the gap horizon. Value sums
accumulate as integer micros, derived EXACTLY: the stream is cast to
decimal(38,6) JVM-side before the state function, so pandas receives
``decimal.Decimal`` and ``int(d.scaleb(6))`` is lossless — the same
numbers the batch operator's decimal sum produces, with no float
round-trip. Within each delivered batch the gap test and per-session
sums are vectorized (numpy diff/cumsum over segment boundaries); the
Python loop runs once per SESSION boundary, not per event.
"""

from __future__ import annotations

from decimal import Decimal
from typing import Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MIN = 30

OUTPUT_SCHEMA = ("user_id bigint, sess_no int, n_events bigint, "
                 "sum_value_fl bigint, sess_start string")
# (sess_no, last_epoch_micros, n_events, sum_value_micros, sess_start)
STATE_SCHEMA = ("sess_no int, last_us bigint, n_events bigint, "
                "sum_us bigint, sess_start string")


def _close_row(user_id: int, sess_no: int, n: int, sum_us: int,
               start: str) -> pd.DataFrame:
    return pd.DataFrame([{
        "user_id": user_id, "sess_no": sess_no, "n_events": n,
        "sum_value_fl": sum_us // 1_000_000, "sess_start": start,
    }])


def _micros(values: pd.Series) -> np.ndarray:
    """Exact integer micros for a value column. Decimal input (the
    normal path — streaming_sessionize casts to decimal(38,6)
    JVM-side) is lossless; a float input falls back to the shortest
    round-trip decimal repr, matching Spark's double→decimal cast
    (BigDecimal.valueOf → setScale(6, HALF_UP))."""
    arr = values.to_numpy()
    if len(arr) and isinstance(arr[0], Decimal):
        it = (int(d.scaleb(6)) for d in arr)
    else:
        it = (int(Decimal(repr(float(v))).scaleb(6)
                  .to_integral_value(rounding="ROUND_HALF_UP"))
              for v in arr)
    return np.fromiter(it, dtype=np.int64, count=len(arr))


def _sessionize_fn(gap_minutes: int):
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key: Tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            sess_no, _last_us, n, sum_us, start = state.get
            state.remove()
            yield _close_row(user_id, sess_no, n, sum_us, start)
            return
        events = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        ts_ns = events["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
        us = ts_ns // 1_000
        v_us = _micros(events["value"])
        # vectorized gap test: True marks the first event of an
        # in-batch segment; csum makes per-segment sums O(1)
        new = np.ones(len(us), dtype=bool)
        np.greater(us[1:] - us[:-1], gap_us, out=new[1:])
        seg_starts = np.flatnonzero(new)
        seg_ends = np.append(seg_starts[1:], len(us))
        csum = np.concatenate(([0], np.cumsum(v_us)))

        cur = list(state.get) if state.exists else None
        for a, b in zip(seg_starts, seg_ends):
            a, b = int(a), int(b)
            seg_n, seg_sum, seg_last = b - a, int(csum[b] - csum[a]), int(us[b - 1])
            if cur is not None and us[a] - cur[1] <= gap_us:
                cur[1] = seg_last
                cur[2] += seg_n
                cur[3] += seg_sum
            else:
                nxt = 1
                if cur is not None:
                    yield _close_row(user_id, cur[0], cur[2], cur[3], cur[4])
                    nxt = cur[0] + 1
                start_s = pd.Timestamp(ts_ns[a]).strftime("%Y-%m-%d %H:%M:%S")
                cur = [nxt, seg_last, seg_n, seg_sum, start_s]
        state.update(tuple(cur))
        # close when the watermark passes last_event + gap
        state.setTimeoutTimestamp((cur[1] + gap_us) // 1_000)

    return fn


def streaming_sessionize(events_stream: DataFrame,
                         gap_minutes: int = SESSION_GAP_MIN,
                         watermark: str = "1 minute") -> DataFrame:
    """events readStream (event_id, ts, user_id, value, ...) ->
    append-mode stream of CLOSED sessions."""
    return (events_stream
            .withColumn("value", F.col("value").cast("decimal(38,6)"))
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_fn(gap_minutes),
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))


# ---------------------------------------------------------------------------
# streaming tumbling-window aggregation (watermark + append mode)
# ---------------------------------------------------------------------------

def streaming_windowed_counts(events_stream: DataFrame,
                              watermark: str = "1 minute") -> DataFrame:
    """The canonical Structured Streaming aggregation: tumbling 1-hour
    event-time windows per event_type behind a watermark — append mode
    emits a window only once the watermark passes its end, so results
    are final (no retraction), state is bounded by the watermark
    horizon, and the output is value-comparable to the batch windowed
    SQL once all windows are flushed (the far-future sentinel run, as
    with the stateful sessionizer)."""
    return (events_stream
            .withColumn("value", F.col("value").cast("decimal(38,6)"))
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.floor(F.sum("value")).cast("bigint")
                 .alias("sum_value_fl"))
            .select(F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
                    .alias("win_start"),
                    "event_type", "n", "sum_value_fl"))
