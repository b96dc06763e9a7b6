"""Custom stateful streaming operator: gap-based sessionization.

The brief's "custom stateful operators" slot (``applyInPandasWithState``):
per-user session assignment with a 30-minute inactivity gap, the streaming
twin of operators/relational.events_sessionize. State per user = the open
session (start, last-seen, count) in epoch micros; a session CLOSES — and
is emitted, append-mode — when a later event arrives past the gap, or when
the event-time timeout fires after the watermark passes last-seen + gap.

Scale behavior: state is O(active users), keyed and shuffled by user_id
exactly once; the watermark bounds state lifetime, so a 10^9-user stream
holds only users active within the gap window. Restarting the query from
the same checkpoint resumes the open sessions (tested in
tests/test_streaming.py — batch 2 extends a session opened in batch 1).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)
SESSION_OUT = "user_id long, session_start_us long, session_end_us long, n_events long"
SESSION_STATE = "start_us long, last_us long, n long"


def _sessionize_fn(gap_us: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        closed: list[tuple[int, int, int, int]] = []

        if state.hasTimedOut:
            start, last, n = state.get
            closed.append((user_id, start, last, n))
            state.remove()
            yield pd.DataFrame(
                closed, columns=["user_id", "session_start_us", "session_end_us", "n_events"]
            )
            return

        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(pdf["ts"].astype("int64") // 1000)  # ns → µs
        ts_us.sort()

        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0

        for t in ts_us:
            if start is None:
                start, last, n = t, t, 1
            elif t > last:
                if t - last > gap_us:
                    closed.append((user_id, start, last, n))
                    start, last, n = t, t, 1
                else:
                    last, n = t, n + 1
            else:
                # late event at-or-before the open session's end (admitted
                # while above the watermark): absorb it if it falls within
                # the gap of the session start — never move `last` backward
                # (a regressed `last` mis-splits later events and can set a
                # timeout at/below the watermark)
                if t >= start - gap_us:
                    start, n = min(start, t), n + 1
                else:
                    closed.append((user_id, t, t, 1))

        if start is not None:
            state.update((int(start), int(last), int(n)))
            # close via event-time timeout once the watermark passes the gap
            state.setTimeoutTimestamp(int(last) // 1000 + gap_us // 1000)

        yield pd.DataFrame(
            closed, columns=["user_id", "session_start_us", "session_end_us", "n_events"]
        )

    return fn


def stream_sessionize(
    spark: SparkSession,
    events_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
):
    """File-source events stream → closed sessions appended as parquet.

    foreachBatch (not the memory sink) so the query RECOVERS from its
    checkpoint — restartability of the stateful operator is the point.
    Each micro-batch overwrites its own ``batch=<id>`` directory, the same
    idempotent publish protocol as the batch index build."""
    import os

    gap_us = gap_minutes * 60 * 1_000_000
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(events_dir)
    )
    sessions = (
        stream.withWatermark("ts", f"{gap_minutes} minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_us),
            SESSION_OUT,
            SESSION_STATE,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(os.path.join(out_dir, f"batch={batch_id}"))

    return (
        sessions.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
