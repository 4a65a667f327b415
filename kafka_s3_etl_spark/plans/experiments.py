"""Experimentation + lifecycle analytics (round 8, batch 12):

* q_cuped — CUPED variance-reduced A/B readout (Deng et al., WSDM'13,
  the standard experimentation-platform adjustment): per-user
  pre-period covariate X (Jan 1-15 spend cents) and experiment metric
  Y (Jan 16-31 cents), theta = cov(X,Y)/var(X) from exact BIGINT
  power sums, per-cohort adjusted mean
  mean_y - theta*(mean_x_cohort - mean_x_global). Every aggregate is
  an exact integer; the float stage is ONE shared IEEE expression
  tree (+ - * / only, no libm), so both engines produce bit-identical
  doubles — the q_ab_test discipline extended to covariance.
* q_histogram_log_bins — power-of-two (log2) histogram of order
  value cents, the long-tail companion to the equi-width
  q_histogram: bucket = length(bin(cents)) - 1 (floor(log2) computed
  on the BINARY STRING, never via libm log2 whose last-ulp can flip
  floor at powers of two), per-bucket count/min/max + share.
* q_survival_curve — discrete user-lifetime survival function:
  lifespan = days between first and last event per user; for every
  observed lifespan d, S(d) = count(lifespan >= d)/n via ONE reverse
  cumulative sum over the lifespan rollup — counting, not hazard
  products, so no logs and no libm.
* q_cohort_ltv — cumulative revenue per user by signup cohort: users
  cohorted by first-seen week, (cohort, active-week) exact-cents
  rollup, running sum across week index, divided once by cohort size
  — the LTV curve every growth team reads next to q_cohort_retention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table

_VC = "CAST(ROUND(value * 100) AS BIGINT)"  # exact cents

# The float readout shared by both engines verbatim (BIGINT inputs +
# IEEE + - * / only => bit-identical): theta's numerator/denominator
# cleared of divisions via n * sums.
_THETA = (
    "(CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
    " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
)


@register(
    "q_cuped",
    category="analytics",
    cost=1,
    doc=(
        "CUPED variance-reduced A/B readout: per-user pre-period X / "
        "experiment Y cents, theta = cov(X,Y)/var(X) from exact "
        "BIGINT power sums (1-row broadcast), per-cohort adjusted "
        "mean via one shared libm-free IEEE expression tree."
    ),
    oracle=f"""
        WITH u AS (
          SELECT user_id, user_id % 2 AS cohort,
                 CAST(SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                               THEN {_VC} ELSE 0 END) AS BIGINT) AS x,
                 CAST(SUM(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
                               THEN {_VC} ELSE 0 END) AS BIGINT) AS y
          FROM events GROUP BY user_id
        ), g AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(x * y) AS BIGINT) AS sxy
          FROM u
        )
        SELECT cohort,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               {_THETA} AS theta,
               CAST(SUM(y) AS DOUBLE) / COUNT(*) AS mean_y,
               CAST(SUM(y) AS DOUBLE) / COUNT(*)
                 - {_THETA}
                   * (CAST(SUM(x) AS DOUBLE) / COUNT(*)
                      - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                   AS mean_y_adj
        FROM u CROSS JOIN g
        GROUP BY cohort, n, sx, sy, sxx, sxy
    """,
)
def q_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'"
                f" THEN {_VC} ELSE 0 END) AS BIGINT)"
            ).alias("x"),
            F.expr(
                "CAST(SUM(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'"
                f" THEN {_VC} ELSE 0 END) AS BIGINT)"
            ).alias("y"),
        )
        .withColumn("cohort", F.col("user_id") % 2)
    )
    g = u.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("x * x")).cast("bigint").alias("sxx"),
        F.sum(F.expr("x * y")).cast("bigint").alias("sxy"),
    )
    return (
        u.crossJoin(F.broadcast(g))
        .groupBy("cohort", "n", "sx", "sy", "sxx", "sxy")
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("y").cast("bigint").alias("_sy_c"),
            F.sum("x").cast("bigint").alias("_sx_c"),
        )
        .select(
            "cohort",
            "n_users",
            F.expr(_THETA).alias("theta"),
            F.expr("CAST(_sy_c AS DOUBLE) / n_users").alias("mean_y"),
            F.expr(
                "CAST(_sy_c AS DOUBLE) / n_users"
                f" - {_THETA}"
                " * (CAST(_sx_c AS DOUBLE) / n_users"
                "    - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
            ).alias("mean_y_adj"),
        )
    )


@register(
    "q_histogram_log_bins",
    category="statistics",
    cost=1,
    doc=(
        "Power-of-two histogram of order cents (long-tail companion "
        "to the equi-width q_histogram): bucket = length(bin(c)) - 1 "
        "— floor(log2) off the binary STRING, never libm log2 (whose "
        "last-ulp flips floor at exact powers); count/min/max/share "
        "per bucket."
    ),
    oracle="""
        WITH c AS (
          SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
          FROM orders WHERE o_totalprice > 0
        ), b AS (
          SELECT cents,
                 CAST(length(bin(cents)) - 1 AS INT) AS bucket
          FROM c
        )
        SELECT bucket,
               CAST(COUNT(*) AS BIGINT) AS n,
               MIN(cents) AS min_cents,
               MAX(cents) AS max_cents,
               CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER () AS share
        FROM b GROUP BY bucket
    """,
)
def q_histogram_log_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias(
                "cents"
            )
        )
        .select(
            "cents",
            F.expr("CAST(length(bin(cents)) - 1 AS INT)").alias("bucket"),
        )
    )
    g = b.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
    )
    w_all = Window.partitionBy()
    return g.select(
        "bucket",
        "n",
        "min_cents",
        "max_cents",
        (F.col("n").cast("double") / F.sum("n").over(w_all)).alias("share"),
    )


@register(
    "q_survival_curve",
    category="analytics",
    cost=1,
    doc=(
        "Discrete user-lifetime survival function: lifespan = days "
        "between first and last event per user; S(d) = "
        "count(lifespan >= d)/n via ONE reverse cumulative sum over "
        "the lifespan rollup — counting, no hazard products, no libm."
    ),
    oracle="""
        WITH u AS (
          SELECT user_id,
                 date_diff('day', MIN(CAST(ts AS DATE)),
                           MAX(CAST(ts AS DATE))) AS lifespan
          FROM events GROUP BY user_id
        ), r AS (
          SELECT CAST(lifespan AS BIGINT) AS lifespan,
                 CAST(COUNT(*) AS BIGINT) AS n_ending
          FROM u GROUP BY lifespan
        )
        SELECT lifespan, n_ending,
               CAST(SUM(n_ending) OVER (ORDER BY lifespan DESC
                                        ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS n_surviving,
               CAST(SUM(n_ending) OVER (ORDER BY lifespan DESC
                                        ROWS UNBOUNDED PRECEDING)
                    AS DOUBLE)
                   / SUM(n_ending) OVER () AS survival
        FROM r
    """,
)
def q_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.datediff(
                F.max(F.col("ts").cast("date")),
                F.min(F.col("ts").cast("date")),
            )
            .cast("bigint")
            .alias("lifespan")
        )
    )
    r = u.groupBy("lifespan").agg(
        F.count("*").cast("bigint").alias("n_ending")
    )
    w_rev = Window.orderBy(F.col("lifespan").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy()
    return r.select(
        "lifespan",
        "n_ending",
        F.sum("n_ending").over(w_rev).cast("bigint").alias("n_surviving"),
        (
            F.sum("n_ending").over(w_rev).cast("double")
            / F.sum("n_ending").over(w_all)
        ).alias("survival"),
    )


@register(
    "q_cohort_ltv",
    category="analytics",
    cost=1,
    doc=(
        "Cumulative revenue per user by signup cohort: users cohorted "
        "by first-seen week, (cohort, week) exact-cents rollup, "
        "running sum across the week index, ONE division by cohort "
        "size — the LTV curve beside q_cohort_retention."
    ),
    oracle=f"""
        WITH first_seen AS (
          SELECT user_id,
                 MIN(weekofyear(ts)) AS cohort_week
          FROM events GROUP BY user_id
        ), sized AS (
          SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS cohort_size
          FROM first_seen GROUP BY cohort_week
        ), rev AS (
          SELECT f.cohort_week,
                 weekofyear(e.ts) AS active_week,
                 CAST(SUM({_VC.replace('value', 'e.value')}) AS BIGINT)
                     AS cents
          FROM events e JOIN first_seen f USING (user_id)
          GROUP BY 1, 2
        )
        SELECT CAST(r.cohort_week AS BIGINT) AS cohort_week,
               CAST(r.active_week AS BIGINT) AS active_week,
               s.cohort_size,
               CAST(SUM(r.cents) OVER (PARTITION BY r.cohort_week
                                       ORDER BY r.active_week
                                       ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum_cents,
               CAST(SUM(r.cents) OVER (PARTITION BY r.cohort_week
                                       ORDER BY r.active_week
                                       ROWS UNBOUNDED PRECEDING)
                    AS DOUBLE) / s.cohort_size / 100.0
                   AS ltv_per_user
        FROM rev r JOIN sized s USING (cohort_week)
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.min(F.weekofyear("ts")).alias("cohort_week")
    )
    sized = first_seen.groupBy("cohort_week").agg(
        F.count("*").cast("bigint").alias("cohort_size")
    )
    rev = (
        ev.join(first_seen, "user_id")
        .groupBy("cohort_week", F.weekofyear("ts").alias("active_week"))
        .agg(F.expr(f"CAST(SUM({_VC}) AS BIGINT)").alias("cents"))
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("active_week")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        rev.join(F.broadcast(sized), "cohort_week")
        .select(
            F.col("cohort_week").cast("bigint").alias("cohort_week"),
            F.col("active_week").cast("bigint").alias("active_week"),
            "cohort_size",
            F.sum("cents").over(w).cast("bigint").alias("cum_cents"),
            (
                F.sum("cents").over(w).cast("double")
                / F.col("cohort_size")
                / 100.0
            ).alias("ltv_per_user"),
        )
    )
