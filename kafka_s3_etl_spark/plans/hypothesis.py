"""Hypothesis testing + calibration + interpolation (round 8, batch 15):

* q_chi_square — chi-square independence decomposition of the
  (event_type x cohort) contingency table: observed counts from ONE
  map-side-combined rollup, row/col/grand totals as integer window
  sums OVER THE ROLLUP (k x 2 cells, never the fact), expected =
  rs*cs/n as one exact division, per-cell contribution
  (o - e)^2 / e with an identical IEEE op order on both engines.
  The per-CELL decomposition is the deliverable (which cells deviate);
  the scalar statistic is the sum of `contribution` — summing IEEE
  doubles has no cross-engine order guarantee, so the engine leaves
  the one terminal fold to the caller rather than hash-gamble on it.
* q_permutation_test — the B-replicate permutation test done the
  100 TB way, the exact companion to q_bootstrap_ci: instead of B
  shuffles, each user gets an md5-derived pseudo-cohort per replicate
  (pmod(md5_int32(user#b), 2) — RNG-free, identical on both engines),
  so ALL B=200 replicate mean-differences ride ONE explode of the
  per-user rollup (users x B tiny rows, map-side combined). p-value =
  (1 + #extreme) / (valid replicates + 1) — one terminal division;
  replicates with an empty side are excluded identically on both
  engines (Spark NULL vs DuckDB Inf on x/0 is a latent hash
  divergence otherwise — the q_confusion_prf lesson).
* q_calibration_bins — reliability table for the mleval scored frame
  (score = acctbal cents, label = placed-urgent-order): fixed-width
  score bins via non-negative integer division ((c + 100000) DIV
  100000 — shifted first: Spark DIV truncates toward zero but DuckDB
  // floors, so operands must be non-negative), per-bin n, mean score
  and observed positive rate each ONE exact-BIGINT division.
* q_gap_fill_interpolate — linear interpolation onto the dense
  per-user daily grid, completing the resample family beside
  q_resample_ffill's locf: per-user daily cents rollup, ONE lead
  window pairs each observation with the next, and a sequence-explode
  emits the in-between days valued (v_prev*(d_next - d) +
  v_next*(d - d_prev)) / (d_next - d_prev) — integer day weights,
  exact BIGINT numerator, one division per row. No grid join: output
  rows == the per-user lo..hi grid exactly, work == observations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_s3_etl_spark.plans.mleval import _SCORED_SQL, _scored
from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table

_VC = "CAST(ROUND(value * 100) AS BIGINT)"

_EXPECTED = "CAST(rs * cs AS DOUBLE) / n"
_CONTRIB = (
    f"(CAST(obs AS DOUBLE) - {_EXPECTED}) "
    f"* (CAST(obs AS DOUBLE) - {_EXPECTED}) / ({_EXPECTED})"
)


@register(
    "q_chi_square",
    category="statistics",
    cost=1,
    doc=(
        "Chi-square independence decomposition of event_type x cohort: "
        "one map-combined rollup to k x 2 cells, integer window totals "
        "over the rollup, expected = rs*cs/n (one exact division), "
        "per-cell contribution (o-e)^2/e with identical IEEE op order "
        "on both engines. Per-cell output; the scalar is the caller's "
        "one fold (IEEE sum order is engine-unspecified)."
    ),
    oracle=f"""
        WITH o AS (
          SELECT event_type, CAST(user_id % 2 AS BIGINT) AS cohort,
                 CAST(COUNT(*) AS BIGINT) AS obs
          FROM events GROUP BY 1, 2
        ), t AS (
          SELECT event_type, cohort, obs,
                 CAST(SUM(obs) OVER (PARTITION BY event_type) AS BIGINT)
                     AS rs,
                 CAST(SUM(obs) OVER (PARTITION BY cohort) AS BIGINT) AS cs,
                 CAST(SUM(obs) OVER () AS BIGINT) AS n
          FROM o
        )
        SELECT event_type, cohort, obs,
               {_EXPECTED} AS expected,
               {_CONTRIB} AS contribution
        FROM t
    """,
)
def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    o = events.groupBy(
        "event_type", F.expr("CAST(user_id % 2 AS BIGINT)").alias("cohort")
    ).agg(F.count("*").cast("bigint").alias("obs"))
    t = o.select(
        "event_type",
        "cohort",
        "obs",
        F.sum("obs")
        .over(Window.partitionBy("event_type"))
        .cast("bigint")
        .alias("rs"),
        F.sum("obs")
        .over(Window.partitionBy("cohort"))
        .cast("bigint")
        .alias("cs"),
        F.sum("obs").over(Window.partitionBy()).cast("bigint").alias("n"),
    )
    return t.select(
        "event_type",
        "cohort",
        "obs",
        F.expr(_EXPECTED).alias("expected"),
        F.expr(_CONTRIB).alias("contribution"),
    )


# ---------------------------------------------------------------------------
# q_permutation_test

_PB = 200  # replicates

# One replicate's mean difference; NULL (excluded) when a side is empty.
_DIFF = (
    "CASE WHEN SUM(CASE WHEN pg = 1 THEN 1 ELSE 0 END) > 0"
    " AND SUM(CASE WHEN pg = 0 THEN 1 ELSE 0 END) > 0 THEN"
    " (CAST(SUM(CASE WHEN pg = 1 THEN t ELSE 0 END) AS DOUBLE)"
    "  / SUM(CASE WHEN pg = 1 THEN 1 ELSE 0 END))"
    " - (CAST(SUM(CASE WHEN pg = 0 THEN t ELSE 0 END) AS DOUBLE)"
    "    / SUM(CASE WHEN pg = 0 THEN 1 ELSE 0 END)) END"
)
_OBS_DIFF = (
    "(CAST(SUM(CASE WHEN g = 1 THEN t ELSE 0 END) AS DOUBLE)"
    " / SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END))"
    " - (CAST(SUM(CASE WHEN g = 0 THEN t ELSE 0 END) AS DOUBLE)"
    "   / SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END))"
)


@register(
    "q_permutation_test",
    category="statistics",
    cost=1,
    doc=(
        "Permutation test of the cohort mean-spend difference, B=200 "
        "replicates in ONE pass: md5-derived pseudo-cohorts per "
        "(user, b) replace B shuffles, replicate diffs are exact-BIGINT "
        "divisions, degenerate replicates excluded identically on both "
        "engines, p = (1 + extreme) / (valid + 1)."
    ),
    oracle=f"""
        WITH u AS (
          SELECT user_id, CAST(user_id % 2 AS BIGINT) AS g,
                 CAST(SUM({_VC}) AS BIGINT) AS t
          FROM events GROUP BY user_id
        ), obs AS (
          SELECT {_OBS_DIFF} AS obs_diff FROM u
        ), reps AS (
          SELECT b,
                 CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR) || '#'
                      || CAST(b AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS pg,
                 t
          FROM u, (SELECT unnest(generate_series(1, {_PB})) AS b) bs
        ), d AS (
          SELECT b, {_DIFF} AS diff
          FROM reps GROUP BY b
        )
        SELECT obs_diff,
               CAST(COUNT(diff) AS BIGINT) AS n_reps,
               CAST(SUM(CASE WHEN ABS(diff) >= ABS(obs_diff)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
               CAST(1 + SUM(CASE WHEN ABS(diff) >= ABS(obs_diff)
                                 THEN 1 ELSE 0 END) AS DOUBLE)
                   / (COUNT(diff) + 1) AS p_value
        FROM d CROSS JOIN obs
        GROUP BY obs_diff
    """,
)
def q_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_s3_etl_spark.operators.prep import md5_int32

    events = load_table(spark, sf_dir, "events")
    u = events.groupBy("user_id").agg(
        F.sum(F.expr(_VC)).cast("bigint").alias("t")
    ).select(
        "user_id", F.expr("CAST(user_id % 2 AS BIGINT)").alias("g"), "t"
    )
    obs = u.agg(F.expr(_OBS_DIFF).alias("obs_diff"))
    reps = u.select(
        "user_id",
        "t",
        F.explode(F.sequence(F.lit(1), F.lit(_PB))).alias("b"),
    ).select(
        "b",
        (
            md5_int32(
                F.concat_ws(
                    "#",
                    F.col("user_id").cast("string"),
                    F.col("b").cast("string"),
                )
            )
            % 2
        ).alias("pg"),
        "t",
    )
    d = reps.groupBy("b").agg(F.expr(_DIFF).alias("diff"))
    # 1-row broadcast constant join (house pattern) to compare every
    # replicate against the observed statistic.
    joined = d.crossJoin(F.broadcast(obs))
    return joined.groupBy("obs_diff").agg(
        F.count("diff").cast("bigint").alias("n_reps"),
        F.sum(
            F.expr("CASE WHEN ABS(diff) >= ABS(obs_diff) THEN 1 ELSE 0 END")
        )
        .cast("bigint")
        .alias("n_extreme"),
        F.expr(
            "CAST(1 + SUM(CASE WHEN ABS(diff) >= ABS(obs_diff)"
            " THEN 1 ELSE 0 END) AS DOUBLE) / (COUNT(diff) + 1)"
        ).alias("p_value"),
    )


# ---------------------------------------------------------------------------
# q_calibration_bins


@register(
    "q_calibration_bins",
    category="mleval",
    cost=1,
    doc=(
        "Reliability table for the mleval scored frame: fixed-width "
        "score bins via shifted non-negative integer division (Spark "
        "DIV truncates, DuckDB // floors — equal only when operands "
        "are non-negative), per-bin n, mean score cents and observed "
        "positive rate each one exact-BIGINT division."
    ),
    oracle=_SCORED_SQL
    + """
        , b AS (
          SELECT (c + 100000) // 100000 AS bin, c, y FROM scored
        )
        SELECT CAST(bin AS BIGINT) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE) / COUNT(*)
                   AS mean_score_cents,
               CAST(CAST(SUM(y) AS BIGINT) AS DOUBLE) / COUNT(*)
                   AS pos_rate
        FROM b GROUP BY bin
    """,
)
def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _scored(spark, sf_dir).select(
        F.expr("CAST((c + 100000) DIV 100000 AS BIGINT)").alias("bin"),
        "c",
        "y",
    )
    return b.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
        F.expr("CAST(SUM(c) AS DOUBLE) / COUNT(*)").alias(
            "mean_score_cents"
        ),
        F.expr("CAST(SUM(y) AS DOUBLE) / COUNT(*)").alias("pos_rate"),
    )


# ---------------------------------------------------------------------------
# q_gap_fill_interpolate


@register(
    "q_gap_fill_interpolate",
    category="temporal",
    cost=1,
    doc=(
        "Linear interpolation onto the dense per-user daily grid "
        "(completes the resample family beside locf): one lead window "
        "pairs each daily observation with the next, a sequence-explode "
        "emits the in-between days at (v_lo*(d_hi-d) + v_hi*(d-d_lo)) "
        "/ (d_hi-d_lo) — integer day weights, exact BIGINT numerator, "
        "one division per row, no grid join."
    ),
    oracle=f"""
        WITH daily AS (
          SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
                 CAST(SUM({_VC}) AS BIGINT) AS v
          FROM events WHERE value IS NOT NULL GROUP BY 1, 2
        ), g AS (
          SELECT user_id, day, v,
                 LEAD(day) OVER w AS nd, LEAD(v) OVER w AS nv
          FROM daily WINDOW w AS (PARTITION BY user_id ORDER BY day)
        ), e AS (
          SELECT user_id, day, v, nd, nv,
                 CAST(UNNEST(generate_series(
                     CAST(day AS TIMESTAMP),
                     CAST(COALESCE(nd - 1, day) AS TIMESTAMP),
                     INTERVAL 1 DAY)) AS DATE) AS gday
          FROM g
        )
        SELECT user_id, gday AS day,
               CASE WHEN gday = day THEN CAST(v AS DOUBLE)
                    ELSE CAST(v * date_diff('day', gday, nd)
                            + nv * date_diff('day', day, gday) AS DOUBLE)
                         / date_diff('day', day, nd)
               END AS value_cents,
               gday = day AS observed
        FROM e
    """,
)
def q_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.filter(F.col("value").isNotNull())
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.expr(_VC)).cast("bigint").alias("v"))
    )
    w = Window.partitionBy("user_id").orderBy("day")
    g = daily.select(
        "user_id",
        "day",
        "v",
        F.lead("day").over(w).alias("nd"),
        F.lead("v").over(w).alias("nv"),
    )
    e = g.select(
        "user_id",
        "day",
        "v",
        "nd",
        "nv",
        F.explode(
            F.sequence(
                F.col("day"),
                F.coalesce(F.date_sub("nd", 1), F.col("day")),
            )
        ).alias("gday"),
    )
    return e.select(
        "user_id",
        F.col("gday").alias("day"),
        F.expr(
            "CASE WHEN gday = day THEN CAST(v AS DOUBLE)"
            " ELSE CAST(v * datediff(nd, gday)"
            "         + nv * datediff(gday, day) AS DOUBLE)"
            "      / datediff(nd, day) END"
        ).alias("value_cents"),
        (F.col("gday") == F.col("day")).alias("observed"),
    )
