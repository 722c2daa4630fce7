"""Custom stateful streaming operator: cross-batch sessionization via
``applyInPandasWithState`` (SURVEY.md §2.9 extension; the batch twin is
plans/eventops.e01).

The reference has no stateful streaming (late data is absorbed by 5-minute
incremental re-runs); a Spark-native engine should carry per-key state
across micro-batches. This operator tracks one OPEN session per user in the
state store — (start, last_ts, n_events, session_no) — and emits a row for
every session CLOSED by a later event arriving beyond the inactivity gap.

Scale notes: state is one tiny fixed-width row per active user, partitioned
by the grouping key across executors (RocksDB-backed state store in
production); each micro-batch touches only the users present in the batch.
Timeout-based eviction (``GroupStateTimeout.ProcessingTimeTimeout``) is the
production path for abandoning idle users — pass ``idle_timeout_ms`` and an
open session whose user stays silent past the timeout is EMITTED as closed
and its state removed at the next micro-batch (state size then tracks
RECENTLY-active users, not all users ever seen). The default stays
NoTimeout so drains are deterministic — open sessions simply remain in
state and are never emitted (the s04 gate's oracle depends on exactly
that).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: emitted: one row per CLOSED session
SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_no", IntegerType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)

#: emit_close_reason=True: SESSION_OUTPUT + which path closed the session
SESSION_OUTPUT_WITH_REASON = StructType(
    SESSION_OUTPUT.fields + [StructField("closed_by", StringType())]
)

#: state: the single open session per user
SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("session_no", IntegerType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    idle_timeout_ms: int | None = None,
    emit_close_reason: bool = False,
) -> DataFrame:
    """events(user_id, ts, …) stream → closed-session rows.

    Within a batch AND across batches: an event more than ``gap_minutes``
    after the open session's last event closes it (emitting the closed row)
    and starts the next. Event-time ordering within a batch is restored by
    sorting the batch's rows — micro-batch boundaries carry no ordering
    guarantee of their own.

    With ``idle_timeout_ms`` (production: ~gap_minutes in ms), a user
    silent for that PROCESSING-time span has their open session emitted as
    closed-by-inactivity and their state evicted at the next micro-batch —
    without it, every user ever seen holds a state row forever. The two
    clocks differ deliberately: the gap closes sessions by EVENT time
    (exact, replay-stable); the timeout bounds state residency and flushes
    the tail. Replay caveats (the price of the processing-time clock): a
    mid-stream processing-time stall (lagging source, backfill) can fire
    the timeout between events whose EVENT-time gap is under
    ``gap_minutes``, splitting a session a faster replay would keep whole
    — contents are replay-stable only when each key's events reach one
    micro-batch, or when no mid-stream stall outlives the timeout. And
    because eviction discards the session counter, ``(user_id,
    session_no)`` is unique per STATE LIFETIME, not per user: a user
    returning after eviction numbers sessions from 1 again.

    ``emit_close_reason=True`` appends a ``closed_by`` column ('gap' |
    'timeout') naming which path closed each session — the s14 gate hashes
    it, so eviction is driver-distinguishable from gap-out, not inferred.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    out_cols = [
        "user_id", "session_no", "session_start_us", "session_end_us",
        "n_events",
    ] + (["closed_by"] if emit_close_reason else [])

    def row(user_id, session_no, start_us, last_us, n_events, reason):
        base = (user_id, session_no, start_us, last_us, n_events)
        return base + (reason,) if emit_close_reason else base

    def track(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if idle_timeout_ms is not None and state.hasTimedOut:
            # idle past the timeout: flush the open session and evict
            start_us, last_us, n_events, session_no = state.get
            state.remove()
            rows = (
                [row(user_id, session_no, start_us, last_us, n_events, "timeout")]
                if start_us is not None  # a no-open-session state row
                else []                  # (empty-frame key) flushes nothing
            )
            yield pd.DataFrame(rows, columns=out_cols)
            return
        if state.exists:
            start_us, last_us, n_events, session_no = state.get
        else:
            start_us, last_us, n_events, session_no = None, None, 0, 0

        closed: list[tuple] = []
        # Materialize ALL the group's Arrow chunks and sort ONCE: a group
        # larger than arrow.maxRecordsPerBatch arrives as several pdfs, and
        # per-chunk sorting would interleave out-of-order timestamps across
        # chunk boundaries (spuriously closing/merging sessions).
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            all_ts = pd.concat([f["ts"] for f in frames], ignore_index=True)
            # pandas datetime64[ns] → int64 is NANOseconds; state keeps µs
            ts_us = (all_ts.astype("int64") // 1000).sort_values()
            for t in ts_us:
                t = int(t)
                if start_us is None:
                    session_no += 1
                    start_us, last_us, n_events = t, t, 1
                elif t - last_us > gap_us:
                    closed.append(
                        row(user_id, session_no, start_us, last_us, n_events, "gap")
                    )
                    session_no += 1
                    start_us, last_us, n_events = t, t, 1
                else:
                    last_us = max(last_us, t)
                    n_events += 1

        if start_us is not None:  # don't store/arm a no-open-session row
            state.update((start_us, last_us, n_events, session_no))
            if idle_timeout_ms is not None:
                state.setTimeoutDuration(idle_timeout_ms)  # re-arm per batch
        yield pd.DataFrame(closed, columns=out_cols)

    return events.groupBy("user_id").applyInPandasWithState(
        track,
        outputStructType=(
            SESSION_OUTPUT_WITH_REASON if emit_close_reason else SESSION_OUTPUT
        ),
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
