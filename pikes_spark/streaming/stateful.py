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
accumulate as integer micros (exact, order-independent) — the same
reason the batch operator sums decimal(38,6).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
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
        events = pd.concat(list(pdfs))
        events = events.sort_values(["ts", "event_id"])
        cur = list(state.get) if state.exists else None
        for _, row in events.iterrows():
            ts = row["ts"]
            us = int(pd.Timestamp(ts).value // 1_000)
            v_us = int(round(float(row["value"]) * 1_000_000))
            start_s = pd.Timestamp(ts).strftime("%Y-%m-%d %H:%M:%S")
            if cur is None:
                cur = [1, us, 1, v_us, start_s]
            elif us - cur[1] > gap_us:
                yield _close_row(user_id, cur[0], cur[2], cur[3], cur[4])
                cur = [cur[0] + 1, us, 1, v_us, start_s]
            else:
                cur[1] = us
                cur[2] += 1
                cur[3] += v_us
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
            .withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(
                _sessionize_fn(gap_minutes),
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))
