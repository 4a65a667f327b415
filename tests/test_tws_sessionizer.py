"""transformWithStateInPandas gap sessionizer (streaming/tws.py).

The live API needs google.protobuf (absent from this container, and
installs are disallowed), so the end-to-end run is import-gated like
the Kafka/MinIO integration tests. The processor's actual logic —
numpy segment fold, open-session merge, timer re-arm, timeout flush —
is pure Python over pandas frames, so it gets REAL offline coverage
through a mock handle, cross-checked against a reference sequential
fold (the semantics stateful.gap_sessions hash-matches in the
catalog)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_s3_etl_spark.streaming.tws import GapSessionProcessor

GAP_US = 10 * 60 * 1_000_000


class _FakeValueState:
    def __init__(self):
        self.v = None

    def exists(self):
        return self.v is not None

    def get(self):
        return self.v

    def update(self, v):
        self.v = tuple(v)

    def clear(self):
        self.v = None


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()
        self.timers: list[int] = []

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.state

    def listTimers(self):
        return list(self.timers)

    def deleteTimer(self, t):
        self.timers.remove(t)

    def registerTimer(self, t):
        self.timers.append(t)


def _frames(ts_us: list[int]) -> list[pd.DataFrame]:
    return [
        pd.DataFrame({"ts": np.array(ts_us, dtype="int64") * 1000})
        .astype({"ts": "datetime64[ns]"})
    ]


def _reference_fold(batches: list[list[int]]) -> list[tuple[int, int, int]]:
    """Sequential per-event fold (the r1-r5 implementation): ground
    truth for the vectorized segment fold."""
    closed, s, e, n = [], None, None, 0
    for batch in batches:
        for t in sorted(batch):
            if s is None:
                s, e, n = t, t, 1
            elif t - e <= GAP_US:
                e, n = t, n + 1
            else:
                closed.append((s, e, n))
                s, e, n = t, t, 1
    if s is not None:
        closed.append((s, e, n))  # final timeout flush
    return closed


def _run_processor(batches: list[list[int]]) -> list[tuple[int, int, int]]:
    proc = GapSessionProcessor(10)
    handle = _FakeHandle()
    proc.init(handle)
    out: list[tuple[int, int, int]] = []

    def drain(frames):
        for f in frames:
            for r in f.itertuples(index=False):
                out.append(
                    (
                        int(pd.Timestamp(r.session_start).value) // 1000,
                        int(pd.Timestamp(r.session_end).value) // 1000,
                        int(r.n_events),
                    )
                )

    for batch in batches:
        if batch:
            drain(proc.handleInputRows((7,), iter(_frames(batch)), None))
    if handle.state.exists():
        drain(proc.handleExpiredTimer((7,), None, None))
    return out


@given(
    st.lists(
        st.lists(st.integers(0, 50), min_size=0, max_size=12),
        min_size=1,
        max_size=4,
    )
)
@settings(max_examples=200, deadline=None)
def test_processor_matches_sequential_fold(step_batches):
    """Random monotone-ish batch sequences (cross-batch ordering per
    the operator's contract: each batch starts at/after the open
    session's end minus the gap) produce exactly the reference fold's
    session set."""
    # build non-decreasing cross-batch timelines: each batch's values
    # are offsets (minutes) added to a running base
    base, batches = 0, []
    for steps in step_batches:
        batch = [(base + s) * 60 * 1_000_000 for s in steps]
        if batch:
            base = max(base, max(batch) // (60 * 1_000_000))
        batches.append(batch)
    assert _run_processor(batches) == _reference_fold(batches)


def test_timer_rearm_keeps_single_live_timer():
    proc = GapSessionProcessor(10)
    handle = _FakeHandle()
    proc.init(handle)
    t0 = 1_000_000_000_000_000  # us
    list(proc.handleInputRows((1,), iter(_frames([t0])), None))
    assert len(handle.timers) == 1
    first = handle.timers[0]
    # an extension must MOVE the deadline, not stack a second timer
    list(proc.handleInputRows((1,), iter(_frames([t0 + 60_000_000])), None))
    assert len(handle.timers) == 1 and handle.timers[0] > first
    # deadline = end_ms + gap_ms + 1
    assert handle.timers[0] == (t0 + 60_000_000) // 1000 + 600_001


def test_timeout_flush_emits_open_session_once():
    proc = GapSessionProcessor(10)
    handle = _FakeHandle()
    proc.init(handle)
    t0 = 2_000_000_000_000_000
    list(proc.handleInputRows((1,), iter(_frames([t0, t0 + 1_000_000])), None))
    flushed = list(proc.handleExpiredTimer((1,), None, None))
    assert len(flushed) == 1 and len(flushed[0]) == 1
    assert not handle.state.exists()
    # a second (stale) expiry emits nothing
    assert list(proc.handleExpiredTimer((1,), None, None)) == []


def test_tws_sessionizer_live(spark, sf_dir):
    """End-to-end transformWithStateInPandas == the batch gap
    sessionizer — runs whenever google.protobuf exists (the API's
    state-server protocol needs it)."""
    pytest.importorskip("google.protobuf")
    from kafka_s3_etl_spark.operators.temporal import sessionize
    from kafka_s3_etl_spark.sources.tables import load_table
    from kafka_s3_etl_spark.streaming.session_close import session_timeout_demo
    from kafka_s3_etl_spark.streaming.tws import (
        gap_sessions_tws,
        pinned_rocksdb_state_store,
    )

    got = session_timeout_demo(
        spark, sf_dir, sessionizer=gap_sessions_tws,
        conf_ctx=pinned_rocksdb_state_store,
    ).select("user_id", "session_start", "session_end", "n_events")
    want = sessionize(load_table(spark, sf_dir, "events")).select(
        "user_id", "session_start", "session_end", "n_events"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_tws_plan_construction_contract(spark, sf_dir):
    """API-drift tripwire for the one streaming surface this container
    cannot EXECUTE (google.protobuf is absent; the proto imports in
    pyspark's stateful_processor_api_client are lazy, inside the
    worker-side methods — verified r11): gap_sessions_tws must still
    CONSTRUCT its streaming plan against the live Spark version. This
    pins the transformWithStateInPandas keyword signature, the output
    schema contract, the event-time watermark, and the analyzed plan
    node, so a Spark upgrade that renames/retypes any of them fails
    here instead of silently rotting behind the gated live test."""
    import inspect

    from pyspark.sql.pandas.group_ops import PandasGroupedOpsMixin

    from kafka_s3_etl_spark.streaming.runner import stream_table
    from kafka_s3_etl_spark.streaming.tws import gap_sessions_tws

    # 1. the API surface tws.py targets still exists with the exact
    # keywords it passes
    params = inspect.signature(
        PandasGroupedOpsMixin.transformWithStateInPandas
    ).parameters
    for kw in ("statefulProcessor", "outputStructType", "outputMode",
               "timeMode"):
        assert kw in params, f"transformWithStateInPandas lost {kw}"

    # 2. the plan constructs (no protobuf needed until execution) and
    # is a streaming frame with the declared output schema
    df = gap_sessions_tws(stream_table(spark, sf_dir, "events"))
    assert df.isStreaming
    assert [(f.name, f.dataType.simpleString()) for f in df.schema] == [
        ("user_id", "bigint"),
        ("session_start", "timestamp"),
        ("session_end", "timestamp"),
        ("n_events", "bigint"),
    ]

    # 3. the analyzed plan carries the stateful node and the watermark
    # that drives its event-time timers
    plan = df._jdf.queryExecution().analyzed().toString()
    # Spark 4.1 prints the node as TransformWithStateInPySpark (4.0
    # used ...InPandas) — accept the family, pin the stateful node
    assert re.search(r"TransformWithStateIn(PySpark|Pandas)", plan), (
        plan[:2000]
    )
    assert "EventTimeWatermark" in plan, plan[:2000]
