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
