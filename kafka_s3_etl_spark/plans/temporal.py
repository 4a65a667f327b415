"""Temporal query catalog: as-of join and sessionization — custom
operators built as single-shuffle DataFrame compositions (see
operators/temporal.py for the scaling argument).

Both are fully oracle-checked: the as-of oracle replays the union
merge with LAST_VALUE(IGNORE NULLS) over a total order (deterministic
under (key, ts) ties, unlike DuckDB's native ASOF), and sessionization
is plain ANSI window SQL. Event-time orderings are made
total with an explicit unique-column tiebreak where the query's result
depends on rank (q_ewma_user orders by (ts, event_id), matching the
q_lag_lead pattern at plans/relational.py); without it the assignment
would be engine/run-dependent whenever (user_id, ts) repeats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_s3_etl_spark.operators.temporal import asof_join, sessionize
from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table


@register(
    "q_asof_join",
    category="temporal",
    doc=(
        "As-of join (kdb/merge_asof semantics): per order, the most recent "
        "event of the matching user at or before the order date. Union-merge "
        "implementation — one shuffle, no pair fan-out. Oracle replays the "
        "SAME union-merge with a LAST_VALUE(IGNORE NULLS) window totally "
        "ordered by (ts, side, event_id) — deterministic even under "
        "duplicate (user_id, ts) right rows, where DuckDB's native ASOF "
        "makes an arbitrary tie pick (ADVICE r12)."
    ),
    oracle="""
        WITH m AS (
          SELECT o_custkey AS k, o_orderdate AS mts, 1 AS side,
                 NULL::BIGINT AS tb, o_orderkey, o_custkey, o_orderdate,
                 NULL::STRUCT(ts TIMESTAMP, event_type VARCHAR) AS r
          FROM orders
          UNION ALL
          SELECT user_id, ts, 0, event_id, NULL, NULL, NULL,
                 {'ts': ts, 'event_type': event_type}
          FROM events
        ), w AS (
          SELECT o_orderkey, o_custkey, o_orderdate, side,
                 LAST_VALUE(r IGNORE NULLS) OVER (
                   PARTITION BY k ORDER BY mts, side, tb
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS pick
          FROM m
        )
        SELECT o_orderkey, o_custkey, o_orderdate,
               pick.ts AS last_ts, pick.event_type AS last_event_type
        FROM w WHERE side = 1
    """,
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    events = load_table(spark, sf_dir, "events")
    return asof_join(
        orders,
        events,
        key="o_custkey",
        right_key="user_id",
        left_ts="o_orderdate",
        right_ts="ts",
        tiebreak="event_id",
        payload=["event_type"],
    )


@register(
    "q_sessionize",
    category="temporal",
    doc=(
        "Batch sessionization: 10-minute-gap sessions per user via "
        "lag-mark + running-sum numbering (the batch analogue of "
        "session_window)."
    ),
    oracle="""
        WITH marked AS (
          -- epoch_us on both sides: gap comparison at microsecond
          -- precision (Spark timestamp precision) regardless of the
          -- parquet file's physical unit
          SELECT user_id, ts,
                 CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                               PARTITION BY user_id ORDER BY ts)
                           <= 600000000
                      THEN 0 ELSE 1 END AS new_session
          FROM events
        ),
        numbered AS (
          -- CAST: DuckDB widens SUM(int) to HUGEINT (int128); Spark emits
          -- BIGINT. Uncast, the driver's value hash distinguishes them.
          SELECT user_id, ts,
                 CAST(SUM(new_session) OVER (
                     PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS session_id
          FROM marked
        )
        SELECT user_id, session_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end
        FROM numbered
        GROUP BY user_id, session_id
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(load_table(spark, sf_dir, "events"))


@register(
    "q_ewma_user",
    category="temporal",
    doc=(
        "Per-user EWMA of event values in event-time order (alpha=0.1) — "
        "the decayed-engagement feature. Closed-form weighted sum: one "
        "ranking window + one map-side-combined aggregation, no per-key "
        "fold or array. Ordering made total via the event_id tiebreak; "
        "rounded aggregate absorbs libm pow/summation last-bit "
        "differences."
    ),
    oracle="""
        WITH ranked AS (
          SELECT user_id, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
                 COUNT(*) OVER (PARTITION BY user_id) AS n
          FROM events
        )
        SELECT user_id,
               ROUND(SUM(value * 0.1 * pow(0.9, n - rn)), 4) AS ewma,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM ranked GROUP BY user_id
    """,
)
def q_ewma_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_s3_etl_spark.operators.temporal import ewma_by_key

    return ewma_by_key(load_table(spark, sf_dir, "events"), tiebreak="event_id")
