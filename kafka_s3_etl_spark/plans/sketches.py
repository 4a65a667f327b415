"""Round-6 batch 6c: bounded-memory summary operators
(operators/sketch.py) — beyond-reference tier.

* q_heavy_hitters — exact frequent-token mining via the two-pass
  Misra-Gries pattern: per-partition m=2k-counter summaries (map-only,
  memory independent of the token domain) produce a guaranteed
  candidate SUPERSET, then a broadcast semi-join + exact count makes
  the output identical to GROUP BY/HAVING — approximation in the plan,
  not the result, so it hash-checks against a plain SQL oracle. The
  MG guarantee itself (skewed domains, forced decrements) is
  property-tested in tests/test_sketch_ops.py.
* q_skyline — 2-D Pareto frontier (minimize p_size, p_retailprice):
  one map-side-combined min-per-x corpus pass, a strict-prefix running
  min over |distinct x| rows, broadcast semi-join back. Oracle is the
  NOT EXISTS dominance definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_s3_etl_spark.operators.sketch import heavy_hitters, skyline_2d
from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table


@register(
    "q_heavy_hitters",
    category="sketch",
    doc=(
        "Exact tokens with count >= n/100 via per-partition Misra-"
        "Gries candidates (bounded memory) + exact verify pass; "
        "hash-identical to GROUP BY/HAVING."
    ),
    oracle="""
        WITH toks AS (SELECT UNNEST(string_split(text, ' ')) AS token
                      FROM documents),
             n AS (SELECT COUNT(*) AS n_total FROM toks)
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM toks, n
        GROUP BY token, n.n_total
        HAVING COUNT(*) * 100 >= n.n_total
    """,
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    tokens = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("token")
    )
    return heavy_hitters(tokens, "token", k=100)


@register(
    "q_skyline",
    category="mining",
    doc=(
        "2-D skyline of parts (minimize size and retail price): "
        "min-per-size agg, strict-prefix running min over distinct "
        "sizes, broadcast semi-join back — never an all-pairs "
        "dominance join."
    ),
    oracle="""
        SELECT p.p_size, p.p_retailprice, p.p_partkey
        FROM part p
        WHERE NOT EXISTS (
          SELECT 1 FROM part q
          WHERE q.p_size <= p.p_size AND q.p_retailprice <= p.p_retailprice
            AND (q.p_size < p.p_size OR q.p_retailprice < p.p_retailprice)
        )
    """,
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    return skyline_2d(
        load_table(spark, sf_dir, "part"), "p_size", "p_retailprice", "p_partkey"
    )


@register(
    "q_sketch_mergeability",
    category="sketch",
    doc=(
        "HLL sketch mergeability (Apache DataSketches, Spark 4 "
        "built-ins): per-day partial user sketches union-merged to a "
        "corpus estimate, beside the direct one-pass estimate and the "
        "exact distinct count. Register-max union is associative and "
        "deterministic, so merged == direct EXACTLY "
        "(property-pinned) — the pre-aggregate-per-partition, "
        "merge-later pattern that lets 100 TB distinct counts roll up "
        "from shard summaries without re-touching data. Rows-only: no "
        "DuckDB twin of this sketch."
    ),
)
def q_sketch_mergeability(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), "user_id"
    )
    daily = ev.groupBy("d").agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = daily.agg(
        F.count("*").alias("n_days"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est"),
    )
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias(
            "direct_est"
        ),
        F.count_distinct("user_id").alias("exact_users"),
    )
    return merged.join(F.broadcast(direct))
