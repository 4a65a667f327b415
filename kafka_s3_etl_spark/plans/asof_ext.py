"""As-of join matrix completion (round 8, batch 19): pandas
merge_asof's two remaining knobs — direction and tolerance — on the
same single-shuffle union-merge operator (operators/temporal.py::
asof_join; reference semantics: kdb aj / pandas merge_asof).

* q_asof_join_forward — earliest right row with right_ts >= left_ts:
  the mirrored window frame (first(ignorenulls) over currentRow..
  unboundedFollowing, right rows sorted AFTER left at equal ts for
  boundary inclusion). Still one shuffle, no pair fan-out; the oracle
  is a FIRST_VALUE(IGNORE NULLS) replay of the same merge over a total
  (ts, side, event_id) order (never native ASOF — arbitrary tie pick,
  ADVICE r12).
* q_asof_join_tolerance — backward as-of where the match must fall
  within a 7-day tolerance (merge_asof(tolerance=...)): the latest
  prior row IS the closest, so the tolerance is a post-mask on the
  matched struct — zero extra shuffle; the oracle CASE-masks the same
  deterministic window replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_s3_etl_spark.operators.temporal import asof_join
from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table


@register(
    "q_asof_join_forward",
    category="temporal",
    cost=1,
    doc=(
        "Forward as-of join (merge_asof direction='forward'): per "
        "order, the EARLIEST event of the matching user at or after "
        "the order date — mirrored union-merge window, one shuffle, "
        "no pair fan-out. Oracle: FIRST_VALUE(IGNORE NULLS) replay of "
        "the same merge, totally ordered (the q_asof_join discipline)."
    ),
    oracle="""
        WITH m AS (
          SELECT o_custkey AS k, o_orderdate AS mts, 0 AS side,
                 NULL::BIGINT AS tb, o_orderkey, o_custkey, o_orderdate,
                 NULL::STRUCT(ts TIMESTAMP, event_type VARCHAR) AS r
          FROM orders
          UNION ALL
          SELECT user_id, ts, 1, event_id, NULL, NULL, NULL,
                 {'ts': ts, 'event_type': event_type}
          FROM events
        ), w AS (
          SELECT o_orderkey, o_custkey, o_orderdate, side,
                 FIRST_VALUE(r IGNORE NULLS) OVER (
                   PARTITION BY k ORDER BY mts, side, tb
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
                 ) AS pick
          FROM m
        )
        SELECT o_orderkey, o_custkey, o_orderdate,
               pick.ts AS next_ts, pick.event_type AS next_event_type
        FROM w WHERE side = 0
    """,
)
def q_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
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
        prefix="next_",
        direction="forward",
    )


@register(
    "q_asof_join_tolerance",
    category="temporal",
    cost=1,
    doc=(
        "Backward as-of join with a 7-day tolerance (merge_asof "
        "tolerance semantics): the latest prior row is the closest, so "
        "the tolerance is a post-mask on the matched struct — zero "
        "extra shuffle over the plain as-of."
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
               CASE WHEN pick.ts >= CAST(o_orderdate AS TIMESTAMP)
                                    - INTERVAL 7 DAY
                    THEN pick.ts END AS last_ts,
               CASE WHEN pick.ts >= CAST(o_orderdate AS TIMESTAMP)
                                    - INTERVAL 7 DAY
                    THEN pick.event_type END AS last_event_type
        FROM w WHERE side = 1
    """,
)
def q_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    events = load_table(spark, sf_dir, "events")
    matched = asof_join(
        orders,
        events,
        key="o_custkey",
        right_key="user_id",
        left_ts="o_orderdate",
        right_ts="ts",
        tiebreak="event_id",
        payload=["event_type"],
    )
    in_tol = F.col("last_ts") >= F.expr(
        "CAST(o_orderdate AS TIMESTAMP) - INTERVAL 7 DAYS"
    )
    return matched.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.when(in_tol, F.col("last_ts")).alias("last_ts"),
        F.when(in_tol, F.col("last_event_type")).alias("last_event_type"),
    )
