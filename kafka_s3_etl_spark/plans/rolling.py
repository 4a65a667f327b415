"""Rolling robust statistics (round 8, batch 20):

* q_rolling_median — 7-row rolling EXACT median of daily revenue
  cents per order priority. Neither engine's median() is trusted:
  both engines instead run the IDENTICAL array math — collect the
  frame into a list, sort it, pick the middle element(s), and divide
  the two-middle sum ONCE by 2.0 (exact BIGINTs in, a single IEEE
  division out). Frames are ROWS 6 PRECEDING..CURRENT over the
  (priority, day) rollup — the window runs over O(priorities x days)
  rows, never the fact, so the per-row 7-element sort is constant
  work at any corpus size.
* q_rolling_corr — 7-day rolling Pearson correlation between daily
  order COUNT and daily revenue cents (in whole dollars to keep the
  cross-products BIGINT-exact): the five window sums (n, sx, sy,
  sxy, sxx, syy) are exact integers, the covariance/variance
  numerators are exact BIGINT differences, and the final
  r = num / sqrt(varx * vary) is one division + one sqrt — both IEEE
  correctly-rounded, hence bit-identical across engines. Degenerate
  frames (zero variance) CASE-NULL on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table

_OC = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"
# Whole dollars: keeps 7-term cross-products far inside BIGINT.
_OD = "CAST(ROUND(o_totalprice) AS BIGINT)"


@register(
    "q_rolling_median",
    category="timeseries",
    cost=1,
    doc=(
        "7-row rolling exact median of daily revenue cents per "
        "priority: both engines sort the collected frame list and "
        "interpolate the two middles with ONE division — no trust in "
        "either engine's native median. Window over the (priority, "
        "day) rollup only."
    ),
    oracle=f"""
        WITH daily AS (
          SELECT o_orderpriority AS pri, o_orderdate AS day,
                 CAST(SUM({_OC}) AS BIGINT) AS c
          FROM orders GROUP BY 1, 2
        ), framed AS (
          SELECT pri, day, c,
                 list_sort(list(c) OVER (PARTITION BY pri ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS fr
          FROM daily
        )
        SELECT pri AS o_orderpriority, day, c AS day_cents,
               CAST(len(fr) AS INTEGER) AS frame_n,
               CAST(fr[(len(fr) + 1) // 2]
                    + fr[(len(fr) + 2) // 2] AS DOUBLE) / 2
                   AS rolling_median_cents
        FROM framed
    """,
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderdate").alias("day"),
    ).agg(F.sum(F.expr(_OC)).cast("bigint").alias("c"))
    framed = daily.select(
        "pri",
        "day",
        "c",
        F.expr(
            "sort_array(collect_list(c) OVER (PARTITION BY pri ORDER BY day"
            " ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))"
        ).alias("fr"),
    )
    return framed.select(
        F.col("pri").alias("o_orderpriority"),
        "day",
        F.col("c").alias("day_cents"),
        F.expr("CAST(size(fr) AS INT)").alias("frame_n"),
        F.expr(
            "CAST(fr[(size(fr) + 1) DIV 2 - 1]"
            " + fr[(size(fr) + 2) DIV 2 - 1] AS DOUBLE) / 2"
        ).alias("rolling_median_cents"),
    )


_W = (
    "OVER (PARTITION BY pri ORDER BY day"
    " ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)"
)
_SUMS = f"""
          SELECT pri, day,
                 CAST(COUNT(*) {_W} AS BIGINT) AS n,
                 CAST(SUM(x) {_W} AS BIGINT) AS sx,
                 CAST(SUM(y) {_W} AS BIGINT) AS sy,
                 CAST(SUM(x * y) {_W} AS BIGINT) AS sxy,
                 CAST(SUM(x * x) {_W} AS BIGINT) AS sxx,
                 CAST(SUM(y * y) {_W} AS BIGINT) AS syy
"""
_R = """
        SELECT pri AS o_orderpriority, day, n AS frame_n,
               CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                    THEN CAST(n * sxy - sx * sy AS DOUBLE)
                         / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                                * CAST(n * syy - sy * sy AS DOUBLE))
               END AS rolling_corr
"""


@register(
    "q_rolling_corr",
    category="timeseries",
    cost=1,
    doc=(
        "7-day rolling Pearson r between daily order count and daily "
        "revenue dollars per priority: five exact-BIGINT window sums, "
        "exact integer covariance/variance numerators, one division + "
        "one sqrt (both IEEE correctly-rounded on both engines); "
        "zero-variance frames CASE-NULL identically."
    ),
    oracle=f"""
        WITH daily AS (
          SELECT o_orderpriority AS pri, o_orderdate AS day,
                 CAST(COUNT(*) AS BIGINT) AS x,
                 CAST(SUM({_OD}) AS BIGINT) AS y
          FROM orders GROUP BY 1, 2
        ), s AS (
        {_SUMS}
          FROM daily
        )
        {_R}
        FROM s
    """,
)
def q_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderdate").alias("day"),
    ).agg(
        F.count("*").cast("bigint").alias("x"),
        F.sum(F.expr(_OD)).cast("bigint").alias("y"),
    )
    s = daily.selectExpr(
        "pri",
        "day",
        f"CAST(COUNT(*) {_W} AS BIGINT) AS n",
        f"CAST(SUM(x) {_W} AS BIGINT) AS sx",
        f"CAST(SUM(y) {_W} AS BIGINT) AS sy",
        f"CAST(SUM(x * y) {_W} AS BIGINT) AS sxy",
        f"CAST(SUM(x * x) {_W} AS BIGINT) AS sxx",
        f"CAST(SUM(y * y) {_W} AS BIGINT) AS syy",
    )
    return s.selectExpr(
        "pri AS o_orderpriority",
        "day",
        "n AS frame_n",
        "CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0"
        " THEN CAST(n * sxy - sx * sy AS DOUBLE)"
        "      / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)"
        "             * CAST(n * syy - sy * sy AS DOUBLE))"
        " END AS rolling_corr",
    )
