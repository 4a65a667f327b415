"""Temporal operators Spark lacks as built-ins: as-of join and batch
sessionization (SURVEY.md 2b custom-operator track).

Both are expressed as compositions of existing DataFrame ops (the
preferred strategy for custom operators) and both cost exactly ONE
shuffle — the hash partition on the entity key — regardless of data
volume:

* as-of join — the kdb/Pandas `merge_asof` semantics: for every left
  row, the single most recent right row with ``right_ts <= left_ts``
  per key. Implemented as a union-merge: tag the two inputs, sort each
  key's timeline once, and carry the latest right payload forward with
  ``last(ignorenulls)``. The naive alternative (theta join + row_number)
  fans out to |left x right| pairs per key before pruning; the merge
  never materializes pairs at all, so a 100 TB orders⋈events as-of costs
  the same shuffle a groupBy would.
* sessionize — gap-based session assignment (the batch analogue of
  ``F.session_window``): a lag-window marks session starts, a running
  sum numbers them, one aggregation summarizes. Two window passes over
  one partitioning + the final agg; no self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    prefix: str = "last_",
    direction: str = "backward",
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: latest right payload with right_ts <= left_ts
    (``direction="backward"``, the default), or the EARLIEST right
    payload with right_ts >= left_ts (``direction="forward"`` — the
    mirrored window frame over the same single-shuffle union merge).

    Returns all left columns plus ``prefix + right_ts`` and
    ``prefix + c`` for each payload column (NULL when no right row
    precedes the left timestamp).

    The matched right row travels as ONE atomic struct: carrying each
    payload column through its own ``last(ignorenulls)`` would, when the
    latest right row holds a genuine NULL in one payload column, splice
    in an older row's non-NULL value — mixing columns from different
    right rows and violating merge_asof semantics. The struct itself is
    non-NULL on every right row (even an all-NULL payload), so
    ``last(struct, ignorenulls=True)`` always picks the latest right row
    wholesale and preserves its NULLs.

    ``tiebreak`` (a unique right-side column, e.g. ``event_id``) makes
    the merge order TOTAL among right rows sharing (key, ts), so the
    picked row is deterministic run-to-run (CLAUDE.md's arg-min rule):
    backward picks the LARGEST tiebreak among equal-ts priors, forward
    the smallest among equal-ts followers. The registered entries'
    DuckDB oracles replay the same merge with LAST/FIRST_VALUE(IGNORE
    NULLS) over the identical total order (never native ASOF, whose
    tie pick is arbitrary) — hash-stable even if the corpus ever
    carries duplicate (key, ts) right rows;
    tests/test_testdata_canary.py still reports such duplicates as a
    data-drift signal.
    """
    from pyspark.sql import types as T

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest: {direction}"
        )
    if direction == "nearest":
        return _asof_join_nearest(
            left,
            right,
            key,
            right_key,
            left_ts,
            right_ts,
            payload,
            prefix,
            tiebreak,
        )
    backward = direction == "backward"
    left_cols = left.columns
    out_cols = [right_ts] + payload
    row_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in out_cols]
    )
    # Boundary-inclusive in both directions: right rows sort BEFORE
    # left rows at equal ts for backward (_side right 0 < left 1, so
    # the preceding frame sees them), AFTER for forward (right 1 >
    # left 0, so the following frame sees them).
    l_mark, r_mark = (1, 0) if backward else (0, 1)
    tb_type = right.schema[tiebreak].dataType if tiebreak else None
    l_side = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(l_mark).alias("_side"),
        *([F.lit(None).cast(tb_type).alias("_tb")] if tiebreak else []),
        *left_cols,
        F.lit(None).cast(row_type).alias("_r"),
    )
    r_side = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(r_mark).alias("_side"),
        *([F.col(tiebreak).alias("_tb")] if tiebreak else []),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        F.struct(*[F.col(c) for c in out_cols]).alias("_r"),
    )
    order = ["_ts", "_side"] + (["_tb"] if tiebreak else [])
    w = Window.partitionBy("_k").orderBy(*order)
    if backward:
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = F.last("_r", ignorenulls=True)
    else:
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = F.first("_r", ignorenulls=True)
    merged = l_side.unionByName(r_side).withColumn("_last_r", pick.over(w))
    return merged.filter(F.col("_side") == l_mark).select(
        *left_cols,
        *[F.col(f"_last_r.{c}").alias(f"{prefix}{c}") for c in out_cols],
    )


def _asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    prefix: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """merge_asof(direction='nearest'): the closer of the latest prior
    and the earliest following right row, ties to BACKWARD (documented;
    pandas breaks the same way). SINGLE union-merge, two frames over
    one sort — never two as-of joins re-joined. Uses the backward
    boundary marks (right rows sort before left at equal ts): an
    equal-ts right row is then invisible to the forward frame, but it
    is the backward match at gap 0, which wins every tie anyway, so
    the choice is unaffected. Gaps compare in exact microseconds.
    ``tiebreak`` totalizes the order among right rows sharing
    (key, ts) — see asof_join's docstring for the oracle caveat."""
    from pyspark.sql import types as T

    left_cols = left.columns
    out_cols = [right_ts] + payload
    row_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in out_cols]
    )
    tb_type = right.schema[tiebreak].dataType if tiebreak else None
    l_side = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *([F.lit(None).cast(tb_type).alias("_tb")] if tiebreak else []),
        *left_cols,
        F.lit(None).cast(row_type).alias("_r"),
    )
    r_side = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *([F.col(tiebreak).alias("_tb")] if tiebreak else []),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_cols
        ],
        F.struct(*[F.col(c) for c in out_cols]).alias("_r"),
    )
    order = ["_ts", "_side"] + (["_tb"] if tiebreak else [])
    w = Window.partitionBy("_k").orderBy(*order)
    w_back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    merged = (
        l_side.unionByName(r_side)
        .withColumn("_b", F.last("_r", ignorenulls=True).over(w_back))
        .withColumn("_f", F.first("_r", ignorenulls=True).over(w_fwd))
    )
    gap_b = F.unix_micros("_ts") - F.unix_micros(F.col(f"_b.{right_ts}"))
    gap_f = F.unix_micros(F.col(f"_f.{right_ts}")) - F.unix_micros("_ts")
    chosen = (
        F.when(F.col("_f").isNull(), F.col("_b"))
        .when(F.col("_b").isNull(), F.col("_f"))
        .when(gap_b <= gap_f, F.col("_b"))
        .otherwise(F.col("_f"))
    )
    return (
        merged.filter(F.col("_side") == 1)
        .withColumn("_n", chosen)
        .select(
            *left_cols,
            *[F.col(f"_n.{c}").alias(f"{prefix}{c}") for c in out_cols],
        )
    )


def ewma_by_key(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    alpha: float = 0.1,
    tiebreak: str | None = None,
) -> DataFrame:
    """Exponentially-weighted moving average of ``value`` per key in
    event-time order — the decayed-engagement feature shape. Uses the
    closed form y = sum_i alpha*(1-alpha)^(n-i) * x_i (zero init), so
    instead of a sequential per-key fold it is ONE ranking window plus
    one map-side-combined aggregation — no per-key array
    materialization, shuffles once on the key at any scale. Weights for
    deep histories underflow to 0.0 harmlessly. Pass ``tiebreak`` (a
    unique column) when (key, ts) can repeat: it makes the rank total,
    so the weight assignment (hence the sum) is engine-independent.
    Inputs without such a column (or with unique (key, ts)) omit it."""
    order = [ts] if tiebreak is None else [ts, tiebreak]
    w = Window.partitionBy(key).orderBy(*order)
    ranked = events.select(
        key,
        F.col(value),
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(Window.partitionBy(key)).alias("_n"),
    )
    term = F.col(value) * alpha * F.pow(F.lit(1.0 - alpha), F.col("_n") - F.col("_rn"))
    return (
        ranked.groupBy(key)
        .agg(
            F.round(F.sum(term), 4).alias("ewma"),
            F.count("*").cast("bigint").alias("n_events"),
        )
    )


def range_bucket_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    window_micros: int,
) -> DataFrame:
    """Range join `right_ts in (left_ts, left_ts + window]` accelerated
    by time bucketing: both sides get a bucket of width = window, and the
    right side is exploded into its own bucket and the previous one —
    any qualifying pair lands in exactly one (key, bucket) join cell.

    Why: a plain equi-join on `key` evaluates the range residual for
    every same-key pair — quadratic per key. Bucketing bounds candidates
    to two windows' worth per row, so per-key cost is ~linear in events
    per window, at the price of duplicating the right side 2x. The
    bucket width must equal the range window.

    Returns all left columns + all right columns (exact residual applied;
    no duplicate pairs — each pair matches exactly one bucket cell).
    """
    lb = F.floor(F.unix_micros(F.col(left_ts)) / window_micros)
    rb = F.floor(F.unix_micros(F.col(right_ts)) / window_micros)
    l_side = left.withColumn("_b", lb)
    r_side = right.withColumn(
        "_b", F.explode(F.array(rb - 1, rb))
    )
    cond = (
        (l_side[key] == r_side[right_key])
        & (l_side["_b"] == r_side["_b"])
        & (r_side[right_ts] > l_side[left_ts])
        & (
            F.unix_micros(r_side[right_ts])
            <= F.unix_micros(l_side[left_ts]) + window_micros
        )
    )
    return l_side.join(r_side, cond).drop("_b")


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 10,
) -> DataFrame:
    """Assign gap-based sessions and summarize them: one row per
    (key, session) with event count and start/end timestamps."""
    timeline = Window.partitionBy(key).orderBy(ts)
    # microsecond precision: cast("long") would truncate to seconds and
    # merge sessions whose gap is in (10min, 10min+1s)
    gap = F.unix_micros(F.col(ts)) - F.lag(F.unix_micros(F.col(ts))).over(timeline)
    marked = events.select(
        key,
        ts,
        F.when(gap <= gap_minutes * 60 * 1_000_000, 0).otherwise(1).alias("new_session"),
    )
    numbered = marked.select(
        key,
        ts,
        F.sum("new_session")
        .over(timeline.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_id"),
    )
    return (
        numbered.groupBy(key, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
        )
    )


def resample_ffill(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    tiebreak: str = "event_id",
) -> DataFrame:
    """Resample an event stream onto a daily grid with forward fill —
    the gap-filling rollup (TimescaleDB's time_bucket_gapfill + locf
    shape) that turns irregular events into a dense per-key feature
    series.

    ONE corpus pass, then everything runs on the tiny daily rollup:

    1. daily downsample — map-side-combined max(struct(ts, tiebreak,
       value)) per (key, day); the struct max makes "last value of the
       day" total even when timestamps tie. The rollup (keys x observed
       days — the operator's own output size class) is localCheckpointed
       so the three downstream uses don't re-scan the corpus (a naive
       grid-join formulation measured 3 corpus scans: bounds, global
       max, and the join each re-derived the aggregation).
    2. fill — each observed day carries its value forward by exploding
       sequence(day .. next observed day - 1) (lead window per key);
       the last observation fills to the global max day, which arrives
       as a 1-row broadcast. No grid join, no ffill window: the fill IS
       the explode, and output rows = keys x days exactly.

    NULL values are not observations: locf carries the last NON-NULL
    value (TimescaleDB locf / last_value IGNORE NULLS semantics), so a
    NULL-valued event neither marks its day observed nor interrupts the
    fill. Keys whose events are all NULL-valued produce no grid rows.

    Returns (key, day, value_ffill, observed). value_ffill is never
    NULL: each key's grid starts at its own first (non-NULL) observation.
    """
    events = events.filter(F.col(value).isNotNull())
    day = F.to_date(F.col(ts)).alias("day")
    last_of_day = F.max(
        F.struct(
            F.col(ts).alias("t"), F.col(tiebreak).alias("e"), F.col(value).alias("v")
        )
    )["v"]
    daily = events.groupBy(key, day).agg(last_of_day.alias("v")).localCheckpoint()
    hi = daily.agg(F.max("day").alias("hi"))
    w = Window.partitionBy(key).orderBy("day")
    filled = (
        daily.withColumn("next_day", F.lead("day").over(w))
        .crossJoin(F.broadcast(hi))
        .select(
            key,
            F.col("day").alias("obs_day"),
            "v",
            F.explode(
                F.sequence(
                    F.col("day"),
                    F.coalesce(F.date_sub("next_day", 1), F.col("hi")),
                )
            ).alias("day"),
        )
    )
    return filled.select(
        key,
        "day",
        F.col("v").alias("value_ffill"),
        (F.col("day") == F.col("obs_day")).alias("observed"),
    )
