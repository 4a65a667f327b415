"""Scalable global ranking (round 8, batch 16): the escape hatch for
the one remaining single-task shape in the catalog.

q_decile_lift (plans/mleval.py) is correct but its NTILE(10) OVER
(ORDER BY c DESC, k) funnels the whole scored frame through ONE sort
task — fine at sf0.1, the bottleneck at 100 TB. q_decile_lift_scalable
produces the IDENTICAL table (same oracle SQL, hash-matched) from a
bucketed two-phase rank (operators/ranks.py):

  1. bucket = (c + shift) DIV width — an integer projection;
  2. bucket counts roll up map-side; the prefix-sum window runs over
     the few-thousand-row ROLLUP, not the data;
  3. per-bucket row_number windows sort bounded slices in parallel;
  4. offsets broadcast back; NTILE becomes closed-form integer
     arithmetic on (rn, n).

The pair is the engine's strongest self-check of the pattern: two
physically different plans, one hash. The same operator generalizes to
any exact global-order statistic (top-N pagination, global median,
percentile ranks) whose direct form would global-sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_s3_etl_spark.operators.ranks import (
    bucketed_global_row_number,
    ntile_expr,
)
from kafka_s3_etl_spark.plans.mleval import (
    _DECILE_BODY,
    _SCORED_SQL,
    _lift_from_deciles,
    _scored,
)
from kafka_s3_etl_spark.plans.registry import register

from pyspark.sql import functions as F


@register(
    "q_decile_lift_scalable",
    category="mleval",
    cost=1,
    doc=(
        "q_decile_lift without the global window sort: bucketed "
        "two-phase global row_number (histogram prefix sum over the "
        "bucket rollup + per-bucket parallel windows + broadcast "
        "offsets), NTILE(10) as closed-form integer arithmetic on "
        "(rn, n). Hash-matches q_decile_lift's exact oracle — two "
        "physically different plans, one result."
    ),
    oracle=_SCORED_SQL + _DECILE_BODY,
)
def q_decile_lift_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    # acctbal >= -999.99 => c + 100000 >= 1; width 256 gives ~4.3k
    # buckets over the cents range regardless of data size.
    ranked = bucketed_global_row_number(
        _scored(spark, sf_dir),
        "c",
        "k",
        shift=100_000,
        width=256,
        descending=True,
    )
    d = ranked.select(F.expr(ntile_expr(10)).alias("decile"), "y")
    return _lift_from_deciles(d)
