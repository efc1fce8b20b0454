"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch twin is :func:`..operators.temporal.sessionize` (lag + running
sum — one shuffle, no state).  On a STREAM the same semantics need
per-key state that outlives a microbatch: each user's open session
(start, last-seen, count) is kept in the state store and a session row is
emitted when the 30-minute gap elapses in EVENT time, i.e. when the
watermark passes ``last_seen + gap`` (GroupStateTimeout.EventTimeTimeout
— deterministic w.r.t. the data, unlike processing-time timeouts).

Scale notes: state is O(open sessions) = O(active users), keyed and
shuffled once on user_id; the state store is RocksDB-spillable on a real
cluster; the watermark bounds both state size and out-of-order
tolerance.  This is the ``applyInPandasWithState`` surface of the brief
(custom stateful operators) — the windowed aggregations in
:mod:`stream` cover the built-in stateful path.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.temporal import SESSION_GAP_SEC  # the batch twin's gap —
# imported, not copied, so the stream≡batch twin test can never diverge
# on the constant

OUTPUT_SCHEMA = (
    "user_id long, session_start_sec long, session_end_sec long, "
    "n_events long, closed_by string"
)
STATE_SCHEMA = "start_sec long, end_sec long, n_events long"


def _sessionize_group(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    out = []
    if state.hasTimedOut:
        # watermark passed last_seen + gap with no new events → close
        start_sec, end_sec, n = state.get
        out.append((user_id, start_sec, end_sec, n, "timeout"))
        state.remove()
    else:
        rows = pd.concat(list(pdfs))
        secs = sorted(int(s) for s in rows["sec"])
        if state.exists:
            start_sec, end_sec, n = state.get
        else:
            start_sec = end_sec = None
            n = 0
        for s in secs:
            if start_sec is None:
                start_sec = end_sec = s
                n = 1
            elif s - end_sec > SESSION_GAP_SEC:
                out.append((user_id, start_sec, end_sec, n, "gap"))
                start_sec = end_sec = s
                n = 1
            else:
                end_sec = max(end_sec, s)
                n += 1
        wake_ms = (end_sec + SESSION_GAP_SEC) * 1000
        if wake_ms <= state.getCurrentWatermarkMs():
            # the watermark already passed this session's gap (its user
            # went quiet batches ago) — close now; a timeout in the past
            # is rejected by the engine
            out.append((user_id, start_sec, end_sec, n, "timeout"))
            state.remove()
        else:
            state.update((start_sec, end_sec, n))
            # wake when the watermark passes the gap after the last event
            state.setTimeoutTimestamp(wake_ms)
    if out:
        yield pd.DataFrame(
            out,
            columns=[
                "user_id",
                "session_start_sec",
                "session_end_sec",
                "n_events",
                "closed_by",
            ],
        )


def sessionize_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """events stream (user_id, ts, …) → closed-session rows.

    ``events`` must be a streaming DataFrame with an event-time ``ts``
    column; late data beyond ``watermark`` is dropped by the engine (the
    documented trade of bounded state)."""
    from pyspark.sql import functions as F

    # watermarks require TIMESTAMP (testdata parquet carries TIMESTAMP_NTZ)
    prepared = (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .select(
            "user_id",
            "ts",
            F.unix_timestamp("ts").alias("sec"),
        )
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
