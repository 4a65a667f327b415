"""Time-series diagnostics (round 7, batch 8c): the health checks run
over event streams before modeling them — serial correlation, drift
(CUSUM), and intra-day seasonality.

All three run over the per-(event_type, day/hour) count rollup: ONE
map-side-combinable aggregation collapses the event fact to <= |types|
* |days| rows, and every later window/join touches only that rollup —
the fact is scanned exactly once regardless of scale. Counts are exact
BIGINTs, so the house float pattern applies (integer sums combined in
one shared double expression, interpolated verbatim into both engines
— see plans/analytics.py).

* q_autocorr — lag-1 autocorrelation of the daily count series per
  event type: LAG over the day order pairs (x_t, x_{t-1}), then the
  exact-BIGINT Pearson power sums over pairs. Gaps in the calendar
  (days with zero events) pair ADJACENT OBSERVED days — the estimator
  is over the observed series, documented rather than resampled (the
  resample-then-diagnose composition is q_resample_ffill's job).
* q_cusum — mean-drift detection: CUSUM_k = sum_{i<=k}(x_i - mean).
  Kept exact by clearing the mean's denominator: num_k = n*prefix_k -
  k*S is an exact BIGINT (prefix_k = running count sum, S = series
  total), and cusum_k = num_k / n is one division of identical
  operands per row — bit-equal across engines, no accumulated float
  error. The max |num_k| day is where the series most departs from
  homogeneous rate.
* q_hourly_seasonality — hour-of-day profile per event type:
  share-of-day and the seasonality index cnt*24/total (1.0 = flat),
  each one exact-integer division. The UTC hour is well-defined on
  both engines because load_table pins the session timezone and the
  driver's DuckDB reads naive timestamps.

Overflow: n*prefix <= |days|^2 * max_daily_count — BIGINT-safe to
~1e6 days x 1e6 events/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table

# Daily event counts per type — the shared rollup.
_DAILY_SQL = """
        WITH d AS (
          SELECT event_type, CAST(ts AS DATE) AS day,
                 CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1, 2
        )
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("bigint").alias("x"))
    )


# Pearson over (y, yp) pairs from exact power sums; shared verbatim
# (same combination as plans/analytics.py::_CORR, renamed operands).
_ACF = (
    "(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
)


@register(
    "q_autocorr",
    category="timeseries",
    cost=1,
    doc=(
        "Lag-1 autocorrelation of daily event counts per event type: "
        "LAG over the (event_type, day) rollup pairs adjacent observed "
        "days, exact BIGINT Pearson power sums over the pairs, one "
        "shared double combination — hash-exact."
    ),
    oracle=_DAILY_SQL
    + f"""
        , p AS (
          SELECT event_type, x AS y,
                 LAG(x) OVER (PARTITION BY event_type ORDER BY day) AS yp
          FROM d
        ), s AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(y) AS BIGINT) AS sx,
                 CAST(SUM(y * y) AS BIGINT) AS sxx,
                 CAST(SUM(yp) AS BIGINT) AS sy,
                 CAST(SUM(yp * yp) AS BIGINT) AS syy,
                 CAST(SUM(y * yp) AS BIGINT) AS sxy
          FROM p WHERE yp IS NOT NULL
          GROUP BY event_type
        )
        SELECT event_type, n AS n_pairs,
               {_ACF} AS acf1
        FROM s
    """,
)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("event_type").orderBy("day")
    p = _daily(spark, sf_dir).select(
        "event_type",
        F.col("x").alias("y"),
        F.lag("x").over(w).alias("yp"),
    )
    s = (
        p.filter(F.col("yp").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("y").alias("sx"),
            F.sum(F.expr("y * y")).alias("sxx"),
            F.sum("yp").alias("sy"),
            F.sum(F.expr("yp * yp")).alias("syy"),
            F.sum(F.expr("y * yp")).alias("sxy"),
        )
    )
    return s.select(
        "event_type",
        F.col("n").alias("n_pairs"),
        F.expr(_ACF).alias("acf1"),
    )


@register(
    "q_cusum",
    category="timeseries",
    cost=1,
    doc=(
        "CUSUM mean-drift series per event type: per-day cumulative "
        "deviation from the series mean, kept exact by clearing the "
        "denominator (num_k = n*prefix_k - k*total is BIGINT; cusum = "
        "num_k/n is one division of identical operands per row)."
    ),
    oracle=_DAILY_SQL
    + """
        , t AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS s
          FROM d GROUP BY event_type
        ), r AS (
          SELECT event_type, day,
                 CAST(ROW_NUMBER() OVER
                      (PARTITION BY event_type ORDER BY day) AS BIGINT)
                     AS k,
                 CAST(SUM(x) OVER
                      (PARTITION BY event_type ORDER BY day
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pre
          FROM d
        )
        SELECT r.event_type, r.day,
               CAST(t.n * r.pre - r.k * t.s AS BIGINT) AS cusum_num,
               CAST(t.n * r.pre - r.k * t.s AS DOUBLE) / t.n AS cusum
        FROM r JOIN t ON r.event_type = t.event_type
    """,
)
def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _daily(spark, sf_dir)
    t = d.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    r = d.select(
        "event_type",
        "day",
        F.row_number().over(w).cast("bigint").alias("k"),
        F.sum("x")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("pre"),
    )
    return r.join(F.broadcast(t), "event_type").select(
        "event_type",
        "day",
        F.expr("CAST(n * pre - k * s AS BIGINT)").alias("cusum_num"),
        F.expr("CAST(n * pre - k * s AS DOUBLE) / n").alias("cusum"),
    )


@register(
    "q_hourly_seasonality",
    category="timeseries",
    cost=1,
    doc=(
        "Hour-of-day seasonality profile per event type: per-hour "
        "counts from one scan, share-of-type and the x24 flatness "
        "index as single exact-integer divisions."
    ),
    oracle="""
        WITH h AS (
          SELECT event_type,
                 CAST(EXTRACT(HOUR FROM ts) AS INTEGER) AS hour,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1, 2
        ), t AS (
          SELECT event_type, hour, cnt,
                 CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT)
                     AS tot
          FROM h
        )
        SELECT event_type, hour, cnt,
               CAST(cnt AS DOUBLE) / tot AS share,
               CAST(cnt * 24 AS DOUBLE) / tot AS seasonality_index
        FROM t
    """,
)
def q_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    h = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.hour("ts").cast("int").alias("hour"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    t = h.select(
        "event_type",
        "hour",
        "cnt",
        F.sum("cnt")
        .over(Window.partitionBy("event_type"))
        .cast("bigint")
        .alias("tot"),
    )
    return t.select(
        "event_type",
        "hour",
        "cnt",
        F.expr("CAST(cnt AS DOUBLE) / tot").alias("share"),
        F.expr("CAST(cnt * 24 AS DOUBLE) / tot").alias("seasonality_index"),
    )
