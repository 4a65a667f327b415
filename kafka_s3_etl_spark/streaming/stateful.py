"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md 2b M7 / north-star custom operators).

Built-in stateful ops (window aggs, dropDuplicates, stream joins) cover
the declared surface; this module is the seam for semantics Spark lacks:
arbitrary per-key state evolved batch-by-batch in Python with explicit
timeout control. The demo operator keeps one running event count per
user — per-key state is a single tuple, the update sees each micro-batch
as Arrow-backed pandas frames, and emitted rows carry the post-update
state (update output mode).

Scale notes: state lives in the executor state store keyed by the
groupBy key, so memory is O(distinct keys), not O(events); a timeout
(GroupStateTimeout) bounds it for unbounded key spaces. The shuffle is
the same single hash partition on the key any streaming agg pays.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def user_running_counts(events: DataFrame) -> DataFrame:
    """Per-user running event count with explicit state management.

    Emits (user_id, n_events) after every micro-batch that touches the
    user, where n_events is the cumulative count so far — the minimal
    shape of a custom stateful operator (sessionization, CEP, online
    feature aggregation all extend this skeleton).
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint",
        stateStructType="n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def gap_sessions(events: DataFrame, gap_minutes: int = 10) -> DataFrame:
    """Timeout-driven stateful sessionizer: the semantics Spark's
    built-in session_window cannot express when you need the session to
    CLOSE and emit exactly once, driven by the event-time watermark.

    Per-key state is one open session (start_us, end_us, n). Each
    micro-batch folds its (sorted) events into the open session: within
    ``gap_minutes`` extends it, beyond closes it (emit) and opens a new
    one. The open session arms an event-time timeout at end + gap; when
    the watermark passes that, the state times out and the final
    session flushes. Emission is exactly-once per session — the stream
    equivalent of ``operators/temporal.py::sessionize`` (same strict->
    gap break at microsecond precision).

    Ordering contract: events WITHIN a micro-batch are sorted before
    folding, but ACROSS batches a key's events must arrive in
    non-decreasing event time relative to its open session (a Kafka
    topic partitioned by the session key provides this; the demo's
    single-delivery source trivially does). A fully reorder-tolerant
    variant buffers sub-watermark events in state and folds only the
    below-watermark prefix at timeout — same state bound, one extra
    list per key.

    Scale: state is O(distinct keys) x one 24-byte tuple; the timeout
    bounds it for keys that go quiet. One hash shuffle on the key per
    micro-batch — identical cost to any streaming agg.
    """
    gap_us = gap_minutes * 60 * 1_000_000
    gap_ms = gap_minutes * 60 * 1_000

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple[int, int, int]] = []
        if state.hasTimedOut:
            if state.exists:
                closed.append(tuple(state.get))
            state.remove()
        else:
            ts_us: list[int] = []
            for pdf in pdfs:
                # normalize to ns first: arrow hands pandas datetime64
                # in file-dependent units, and int64-of-ns // 1000 is
                # unit-safe (2024 timeline, no overflow)
                t = pdf["ts"].astype("datetime64[ns]").astype("int64")
                ts_us.extend((t // 1000).tolist())
            ts_us.sort()
            if state.exists:
                s, e, n = state.get
            else:
                s, e, n = None, None, 0
            for t in ts_us:
                if s is None:
                    s, e, n = t, t, 1
                elif t - e <= gap_us:
                    e, n = t, n + 1
                else:
                    closed.append((s, e, n))
                    s, e, n = t, t, 1
            if s is not None:
                state.update((s, e, n))
                # fire once the watermark proves the gap elapsed
                state.setTimeoutTimestamp(e // 1000 + gap_ms + 1)
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "session_start": pd.to_datetime(
                    [c[0] for c in closed], unit="us"
                ),
                "session_end": pd.to_datetime(
                    [c[1] for c in closed], unit="us"
                ),
                "n_events": [c[2] for c in closed],
            }
        )

    return (
        events.withWatermark("ts", f"{gap_minutes} minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "user_id bigint, session_start timestamp, "
                "session_end timestamp, n_events bigint"
            ),
            stateStructType="s bigint, e bigint, n bigint",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
