"""Round-11 batch 63: training-mix balancing.

Temperature-based language/source rebalancing is the knob every
multilingual / multi-source pretraining pipeline ships (sample lang l
with probability proportional to n_l^alpha, alpha < 1, so head
languages shrink toward the tail — XLM-R's alpha = 0.3-0.7 family).
The catalog already has reproducible uniform hash sampling
(q_sample_hash) and RNG stratified sampling (q_sample_stratified,
rows-only); this adds the NON-uniform, corpus-statistics-driven rate
with the whole pipeline still exactly replayable:

* per-language keep probability sqrt(n_min / n_l) (alpha = 0.5
  flattening toward the smallest language), realized as one integer
  threshold per language: t_l = floor(sqrt(n_min/n_l * 2^40)) over a
  20-bit md5 hash of the doc id. sqrt and the single division are
  each ONE correctly-rounded IEEE op on the same inputs in both
  engines, and the quantization to t_l happens once per DISTINCT
  LANGUAGE (the q_lm_score discipline), so the per-doc keep decision
  h < t_l is an exact integer compare — reproducible under any
  partitioning, any engine, any rerun, unlike rand()-based sampling.
* the doc-level decision needs only (doc_id, lang): two column-pruned
  scans (one for the 5-row rate table, one for the decision rollup)
  and a broadcast join — no wide shuffle anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table

# 2^40: the threshold scale. h is 5 hex chars = 20 bits, t_l is
# floor(sqrt(ratio) * 2^20) = floor(sqrt(ratio * 2^40)).
_T_SCALE = 1099511627776


@register(
    "q_sample_temperature",
    cost=1,
    category="prep",
    doc=(
        "Temperature-flattened language mix (alpha = 0.5): per-lang "
        "keep probability sqrt(n_min/n_l) via one integer threshold "
        "per language (floor(sqrt(n_min/n_l * 2^40))) against a "
        "20-bit md5(doc_id) hash — head languages downsample toward "
        "the tail, reproducibly (hash-threshold, never rand()). "
        "Output is the per-language audit rollup: corpus count, kept "
        "count, the threshold, and realized rate. Exact integer "
        "compares everywhere; sqrt/division are single "
        "correctly-rounded IEEE ops quantized once per language."
    ),
    oracle=f"""
        WITH n AS (
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_l
          FROM documents GROUP BY lang
        ),
        mn AS (SELECT MIN(n_l) AS n_min FROM n),
        t AS (
          SELECT lang, n_l,
                 CAST(floor(sqrt(CAST(n_min AS DOUBLE)
                                 / CAST(n_l AS DOUBLE)
                                 * {_T_SCALE})) AS BIGINT) AS t_l
          FROM n CROSS JOIN mn
        )
        SELECT d.lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN ('0x' || substr(
                        md5(CAST(d.doc_id AS VARCHAR)), 1, 5))::BIGINT
                        < t.t_l THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               CAST(MIN(t.t_l) AS BIGINT) AS t_threshold,
               CAST(CAST(SUM(CASE WHEN ('0x' || substr(
                        md5(CAST(d.doc_id AS VARCHAR)), 1, 5))::BIGINT
                        < t.t_l THEN 1 ELSE 0 END) AS BIGINT) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) AS keep_rate
        FROM documents d JOIN t ON d.lang = t.lang
        GROUP BY d.lang
    """,
)
def q_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    n = docs.groupBy("lang").agg(F.count("*").cast("bigint").alias("n_l"))
    mn = n.agg(F.min("n_l").alias("n_min"))
    t = n.crossJoin(F.broadcast(mn)).select(
        "lang",
        F.expr(
            f"CAST(FLOOR(SQRT(CAST(n_min AS DOUBLE)"
            f" / CAST(n_l AS DOUBLE) * {_T_SCALE})) AS BIGINT)"
        ).alias("t_l"),
    )
    kept = F.expr(
        "CASE WHEN CAST(conv(substring(md5(CAST(doc_id AS STRING)),"
        " 1, 5), 16, 10) AS BIGINT) < t_l THEN 1 ELSE 0 END"
    )
    return (
        docs.join(F.broadcast(t), "lang")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(kept).cast("bigint").alias("n_kept"),
            F.min("t_l").cast("bigint").alias("t_threshold"),
        )
        .select(
            "lang",
            "n_docs",
            "n_kept",
            "t_threshold",
            F.expr(
                "CAST(n_kept AS DOUBLE) / CAST(n_docs AS DOUBLE)"
            ).alias("keep_rate"),
        )
    )
