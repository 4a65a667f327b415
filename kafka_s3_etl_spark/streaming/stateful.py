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

import numpy as np
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


def fold_gap_segments(
    pdfs: Iterable[pd.DataFrame],
    prev: tuple[int, int, int] | None,
    gap_us: int,
) -> tuple[list[tuple[int, int, int]], tuple[int, int, int] | None]:
    """Shared vectorized session fold for BOTH sessionizer APIs
    (applyInPandasWithState here, transformWithStateInPandas in
    streaming/tws.py) — one implementation so the two can never
    diverge. Returns (closed sessions, still-open session).

    Session breaks are exactly the sorted gaps > gap_us; each
    segment's (start, end, count) replaces the r1-r5 per-event loop —
    the probe's 4.4x-at-10x-events was pure Python tax. Timestamps
    normalize to ns first: arrow hands pandas datetime64 in
    file-dependent units, and int64-of-ns // 1000 is unit-safe (2024
    timeline, no overflow)."""
    chunks = [
        pdf["ts"].astype("datetime64[ns]").astype("int64").to_numpy() // 1000
        for pdf in pdfs
    ]
    t = np.sort(np.concatenate(chunks)) if chunks else np.empty(0, "int64")
    if not t.size:
        return [], prev
    closed: list[tuple[int, int, int]] = []
    brk = np.nonzero(np.diff(t) > gap_us)[0]
    i0 = np.concatenate(([0], brk + 1))
    i1 = np.concatenate((brk, [t.size - 1]))
    seg_s, seg_e = t[i0], t[i1]
    seg_n = i1 - i0 + 1
    if prev is not None:
        s, e, n = prev
        if int(t[0]) - e <= gap_us:
            # open session absorbs the first segment; its end lands on
            # the segment's last event, same as the sequential fold
            seg_s[0] = s
            seg_n[0] += n
        else:
            closed.append((s, e, n))
    closed.extend(
        zip(seg_s[:-1].tolist(), seg_e[:-1].tolist(), seg_n[:-1].tolist())
    )
    return closed, (int(seg_s[-1]), int(seg_e[-1]), int(seg_n[-1]))


def sessions_frame(
    key_val: int, closed: list[tuple[int, int, int]]
) -> pd.DataFrame:
    """numpy-built emission shared by both sessionizers:
    pd.to_datetime on a tiny list costs ~300us/key; int64-us * 1000
    viewed as datetime64[ns] is ~3x cheaper, and this runs once per
    key per micro-batch."""
    arr = np.asarray(closed, dtype="int64").reshape(-1, 3)
    return pd.DataFrame(
        {
            "user_id": np.full(arr.shape[0], key_val, dtype="int64"),
            "session_start": (arr[:, 0] * 1000).view("datetime64[ns]"),
            "session_end": (arr[:, 1] * 1000).view("datetime64[ns]"),
            "n_events": arr[:, 2],
        }
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
            prev = tuple(state.get) if state.exists else None
            closed, open_ = fold_gap_segments(pdfs, prev, gap_us)
            if open_ is not None:
                state.update(open_)
                # fire once the watermark proves the gap elapsed
                state.setTimeoutTimestamp(open_[1] // 1000 + gap_ms + 1)
        if not closed:
            return  # no frame at all beats concat-ing an empty one
        yield sessions_frame(key[0], closed)

    # Explicit projection: Spark cannot column-prune through an opaque
    # pandas function, so without this every event column (including
    # the fat props JSON) rides the Arrow transfer into Python.
    return (
        events.select("user_id", "ts")
        .withWatermark("ts", f"{gap_minutes} minutes")
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
