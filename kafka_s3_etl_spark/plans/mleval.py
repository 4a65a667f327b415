"""Model-evaluation metrics (round 7, batch 8b): the offline scoring
suite a training pipeline runs over (score, label) pairs — ROC AUC,
decile lift / cumulative gains, and the thresholded confusion matrix.

The "model" under evaluation is a deterministic proxy derivable from
the warehouse on both engines: score = account balance in exact cents,
label = "customer ever placed a 1-URGENT order" (an EXISTS semi-join).
The metrics' math is the interesting part and is engine-portable:

* AUC via the Mann-Whitney rank-sum identity with proper midrank tie
  handling, kept in integers by doubling: with r = min-rank of a score
  and t = tie-group size, midrank*2 = 2r + t - 1 is integral, so
  U*2 = sum(midrank2 | positives) - n_pos*(n_pos+1) is an exact BIGINT
  and AUC = U2 / (2 * n_pos * n_neg) is ONE shared division. No float
  ranks, no sort-order sensitivity — ties contribute identically on
  both engines by construction.
* decile lift: NTILE(10) over the (cents DESC, custkey) TOTAL order
  (deterministic tie placement), per-decile conversion vs the global
  base rate as the cross-multiplied integer ratio
  (n_pos * N) / (n * P), plus the cumulative-gains curve.
* confusion matrix at a fixed threshold: tp/fp/fn/tn as conditional
  integer sums; precision/recall/F1/accuracy each ONE division.

Scale notes (100 TB): labels come from one semi-join of the fact table
collapsed to distinct positive keys (map-side combinable, broadcast at
dim scale); ranks run over the customer-grain rollup, never the fact.
AUC's window partitions by segment (5 partitions) and the decile
NTILE is a GLOBAL window (one sort task over the rollup) — same
task-size caveat and two-phase-rank escape hatch as plans/diststats.py
(a histogram of score counts turns NTILE boundaries into a merged
prefix-sum lookup without a global sort).
Overflow: midrank2 sums <= 2*n^2 per segment — BIGINT-safe to ~2e9
customers per segment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table

# (segment, custkey, score cents, label 0/1) — the shared scored frame.
_SCORED_SQL = """
        WITH scored AS (
          SELECT c_mktsegment AS seg, c_custkey AS k,
                 CAST(ROUND(c_acctbal * 100) AS BIGINT) AS c,
                 CASE WHEN c_custkey IN (
                        SELECT o_custkey FROM orders
                        WHERE o_orderpriority = '1-URGENT')
                      THEN 1 ELSE 0 END AS y
          FROM customer
        )
"""


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
        .distinct()
    )
    pos = urgent.withColumn("y", F.lit(1))
    return (
        cust.join(pos, cust.c_custkey == pos.o_custkey, "left")
        .select(
            F.col("c_mktsegment").alias("seg"),
            F.col("c_custkey").alias("k"),
            F.expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)").alias("c"),
            F.coalesce("y", F.lit(0)).cast("int").alias("y"),
        )
    )


_AUC = (
    "CAST(spos - n_pos * (n_pos + 1) AS DOUBLE)"
    " / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))"
)


@register(
    "q_auc",
    category="mleval",
    cost=1,
    doc=(
        "Exact ROC AUC per segment via the Mann-Whitney rank-sum with "
        "integral doubled midranks (2r + t - 1): BIGINT sums, one "
        "shared division — hash-exact, tie-correct. Segments missing "
        "either class are excluded (AUC undefined)."
    ),
    oracle=_SCORED_SQL
    + f"""
        , r AS (
          SELECT seg, y,
                 2 * CAST(RANK() OVER (PARTITION BY seg ORDER BY c)
                          AS BIGINT)
                   + CAST(COUNT(*) OVER (PARTITION BY seg, c) AS BIGINT)
                   - 1 AS midrank2
          FROM scored
        ), s AS (
          SELECT seg,
                 CAST(SUM(y) AS BIGINT) AS n_pos,
                 CAST(SUM(1 - y) AS BIGINT) AS n_neg,
                 CAST(SUM(CASE WHEN y = 1 THEN midrank2 ELSE 0 END)
                      AS BIGINT) AS spos
          FROM r GROUP BY seg
          HAVING SUM(y) > 0 AND SUM(1 - y) > 0
        )
        SELECT seg AS c_mktsegment, n_pos, n_neg,
               {_AUC} AS auc
        FROM s
    """,
)
def q_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _scored(spark, sf_dir).select(
        "seg",
        "y",
        (
            2 * F.rank().over(Window.partitionBy("seg").orderBy("c")).cast("bigint")
            + F.count("*").over(Window.partitionBy("seg", "c")).cast("bigint")
            - 1
        ).alias("midrank2"),
    )
    s = (
        r.groupBy("seg")
        .agg(
            F.sum("y").cast("bigint").alias("n_pos"),
            F.sum(F.expr("1 - y")).cast("bigint").alias("n_neg"),
            F.sum(F.expr("CASE WHEN y = 1 THEN midrank2 ELSE 0 END"))
            .cast("bigint")
            .alias("spos"),
        )
        .filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
    )
    return s.select(
        F.col("seg").alias("c_mktsegment"),
        "n_pos",
        "n_neg",
        F.expr(_AUC).alias("auc"),
    )


# Shared by q_decile_lift and plans/ranks.py::q_decile_lift_scalable —
# the scalable twin must hash-match this exact oracle.
_DECILE_BODY = """
        , d AS (
          SELECT CAST(NTILE(10) OVER (ORDER BY c DESC, k) AS INTEGER)
                     AS decile,
                 y
          FROM scored
        ), s AS (
          SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(y) AS BIGINT) AS n_pos
          FROM d GROUP BY decile
        ), t AS (
          SELECT decile, n, n_pos,
                 SUM(n) OVER () AS nn, SUM(n_pos) OVER () AS pp,
                 SUM(n_pos) OVER (ORDER BY decile
                                  ROWS UNBOUNDED PRECEDING) AS cum_pos
          FROM s
        )
        SELECT decile, n, n_pos,
               CAST(n_pos AS DOUBLE) / n AS conv_rate,
               CAST(n_pos * nn AS DOUBLE)
                   / (CAST(n AS DOUBLE) * CAST(pp AS DOUBLE)) AS lift,
               CAST(cum_pos AS DOUBLE) / pp AS cum_capture
        FROM t
    """


@register(
    "q_decile_lift",
    category="mleval",
    cost=1,
    doc=(
        "Decile lift + cumulative gains over the global score order "
        "(NTILE(10) on the (cents DESC, custkey) total order): "
        "per-decile conversion, lift vs base rate as cross-multiplied "
        "exact integers, running positive capture — three divisions, "
        "all over BIGINTs. ORACLE-PARITY TWIN, not the headline shape "
        "(excluded from bench.py HEADLINE): the NTILE window is an "
        "unpartitioned single-task sort of the scored frame — "
        "q_decile_lift_scalable hash-matches this oracle via the "
        "bucketed two-phase rank and is the shape to run at scale."
    ),
    oracle=_SCORED_SQL + _DECILE_BODY,
)
def q_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _scored(spark, sf_dir).select(
        F.ntile(10)
        .over(Window.orderBy(F.col("c").desc(), F.col("k")))
        .cast("int")
        .alias("decile"),
        "y",
    )
    return _lift_from_deciles(d)


def _lift_from_deciles(d: DataFrame) -> DataFrame:
    """(decile, y) -> the lift/gains table; shared with the scalable
    twin so both entries aggregate identically."""
    s = d.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
    )
    w_all = Window.partitionBy()
    w_cum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    t = s.select(
        "decile",
        "n",
        "n_pos",
        F.sum("n").over(w_all).alias("nn"),
        F.sum("n_pos").over(w_all).alias("pp"),
        F.sum("n_pos").over(w_cum).alias("cum_pos"),
    )
    return t.select(
        "decile",
        "n",
        "n_pos",
        F.expr("CAST(n_pos AS DOUBLE) / n").alias("conv_rate"),
        F.expr(
            "CAST(n_pos * nn AS DOUBLE)"
            " / (CAST(n AS DOUBLE) * CAST(pp AS DOUBLE))"
        ).alias("lift"),
        F.expr("CAST(cum_pos AS DOUBLE) / pp").alias("cum_capture"),
    )


@register(
    "q_confusion_prf",
    category="mleval",
    cost=1,
    doc=(
        "Confusion matrix per segment at a fixed score threshold "
        "(acctbal > $50.00 * 100 cents): tp/fp/fn/tn as conditional "
        "BIGINT sums in ONE scan, then precision/recall/F1/accuracy as "
        "single divisions of exact integers (F1 via the 2tp/(2tp+fp+fn) "
        "identity — one division, not a mean of two). Degenerate "
        "denominators (a segment with zero predicted or zero actual "
        "positives) are CASE-guarded to NULL on BOTH engines — Spark "
        "yields NULL on x/0 but DuckDB's IEEE floats yield Inf/NaN, a "
        "latent hash divergence without the guard (r7 advice)."
    ),
    oracle=_SCORED_SQL
    + """
        , s AS (
          SELECT seg,
                 CAST(SUM(CASE WHEN c > 500000 AND y = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS tp,
                 CAST(SUM(CASE WHEN c > 500000 AND y = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS fp,
                 CAST(SUM(CASE WHEN c <= 500000 AND y = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS fn,
                 CAST(SUM(CASE WHEN c <= 500000 AND y = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS tn
          FROM scored GROUP BY seg
        )
        SELECT seg AS c_mktsegment, tp, fp, fn, tn,
               CASE WHEN tp + fp > 0
                    THEN CAST(tp AS DOUBLE) / (tp + fp) END AS precision,
               CASE WHEN tp + fn > 0
                    THEN CAST(tp AS DOUBLE) / (tp + fn) END AS recall,
               CASE WHEN 2 * tp + fp + fn > 0
                    THEN CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn)
                    END AS f1,
               CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn) AS accuracy
        FROM s
    """,
)
def q_confusion_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _scored(spark, sf_dir).groupBy("seg").agg(
        F.sum(F.expr("CASE WHEN c > 500000 AND y = 1 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("tp"),
        F.sum(F.expr("CASE WHEN c > 500000 AND y = 0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("fp"),
        F.sum(F.expr("CASE WHEN c <= 500000 AND y = 1 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("fn"),
        F.sum(F.expr("CASE WHEN c <= 500000 AND y = 0 THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("tn"),
    )
    return s.select(
        F.col("seg").alias("c_mktsegment"),
        "tp",
        "fp",
        "fn",
        "tn",
        F.expr(
            "CASE WHEN tp + fp > 0"
            " THEN CAST(tp AS DOUBLE) / (tp + fp) END"
        ).alias("precision"),
        F.expr(
            "CASE WHEN tp + fn > 0"
            " THEN CAST(tp AS DOUBLE) / (tp + fn) END"
        ).alias("recall"),
        F.expr(
            "CASE WHEN 2 * tp + fp + fn > 0"
            " THEN CAST(2 * tp AS DOUBLE) / (2 * tp + fp + fn) END"
        ).alias("f1"),
        F.expr("CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn)").alias(
            "accuracy"
        ),
    )
