"""Tabular feature-engineering shapes (round 7, batch 7d): the
encode/scale/bin steps a training-data pipeline runs between raw tables
and a trainer, expressed as pure JVM plans.

* q_feature_minmax — per-group min-max scaling: group min/max via one
  window pass, then ONE IEEE division of exactly-representable cents
  integers per row — bit-identical across engines by construction.
  At 100 TB this is one shuffle on the group key, no second scan.
* q_target_encode — leave-one-out target encoding of a categorical
  against an exact-cents target: (sum - x) / (n - 1) from one windowed
  sum, the standard leakage-free mean encoding. Same one-division
  exactness pattern; NULL for singleton groups on both engines.
* q_feature_hash — the hashing trick over categoricals: md5-derived
  bucket index + sign bit per feature and for the crossed feature,
  2^18-dim addressable space in O(1) memory. md5 is the house
  cross-engine hash (operators/prep.py::md5_int32) — xxhash64 exists only in
  Spark, so portable feature hashing pins md5.
* q_quantile_bins — equal-frequency (quartile) binning: ntile over a
  TOTAL order (cents, then unique key — ties broken identically in
  both engines), then per-bin support and exact dollar edges. Rank
  math only; no floats until the final /100 presentation division.

100 TB notes: every entry is one window/agg shuffle on its group key —
no self-joins, no collects, no Python. Scaling/encoding stats ride the
same pass that emits the rows (map-side combine for the bin summary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_s3_etl_spark.operators.prep import md5_int32 as _SPARK_MD5_INT
from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table

_O_CENTS = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"


def _duck_md5_int(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


@register(
    "q_feature_minmax",
    category="mlfeat",
    doc=(
        "Per-group min-max feature scaling: window min/max of the "
        "exact-cents order total within o_orderpriority, then one IEEE "
        "division per row — (c - min) / (max - min) over "
        "exactly-representable integers is bit-identical across "
        "engines. One shuffle on the group key, stats ride the row "
        "pass."
    ),
    oracle=f"""
        SELECT o_orderkey, o_orderpriority,
               CAST(CASE WHEN mx > mn
                    THEN CAST(c - mn AS DOUBLE) / (mx - mn) END
                    AS DOUBLE) AS price_scaled
        FROM (
          SELECT o_orderkey, o_orderpriority, {_O_CENTS} AS c,
                 min({_O_CENTS}) OVER w AS mn,
                 max({_O_CENTS}) OVER w AS mx
          FROM orders
          WINDOW w AS (PARTITION BY o_orderpriority)
        )
    """,
)
def q_feature_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority")
    c = F.expr(_O_CENTS)
    mn, mx = F.min(c).over(w), F.max(c).over(w)
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.when(
                mx > mn, (c - mn).cast("double") / (mx - mn)
            ).alias("price_scaled"),
        )
    )


@register(
    "q_target_encode",
    category="mlfeat",
    doc=(
        "Leave-one-out target encoding: each order's priority encoded "
        "as the mean total of the OTHER orders sharing it — "
        "(sum - x) / (n - 1) from one windowed exact-cents sum, the "
        "leakage-free categorical encoding. NULL for singleton groups; "
        "identical division order on both engines keeps doubles "
        "bit-exact."
    ),
    oracle=f"""
        SELECT o_orderkey, o_orderpriority,
               CAST(CASE WHEN n > 1
                    THEN CAST(s - c AS DOUBLE) / (n - 1) / 100 END
                    AS DOUBLE) AS loo_mean_total
        FROM (
          SELECT o_orderkey, o_orderpriority, {_O_CENTS} AS c,
                 sum({_O_CENTS}) OVER w AS s,
                 count(*) OVER w AS n
          FROM orders
          WINDOW w AS (PARTITION BY o_orderpriority)
        )
    """,
)
def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderpriority")
    c = F.expr(_O_CENTS)
    s, n = F.sum(c).over(w), F.count(F.lit(1)).over(w)
    return (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.when(
                n > 1, (s - c).cast("double") / (n - 1) / 100
            ).alias("loo_mean_total"),
        )
    )


_HASH_DIM = 1 << 18  # 262144-dim hashed feature space


def _spark_hashed(col, tag: str):
    """(bucket, sign) of the tagged categorical value — tag prevents
    cross-column collisions sharing buckets systematically."""
    h = _SPARK_MD5_INT(F.concat(F.lit(tag + "="), col))
    sign = F.when(h % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    return (h % _HASH_DIM).alias(f"idx_{tag}"), sign.alias(f"sign_{tag}")


def _duck_hashed(expr: str, tag: str) -> str:
    h = _duck_md5_int(f"'{tag}=' || {expr}")
    return (
        f"CAST({h} % {_HASH_DIM} AS BIGINT) AS idx_{tag}, "
        f"CAST(CASE WHEN {h} % 2 = 0 THEN 1 ELSE -1 END AS INT) "
        f"AS sign_{tag}"
    )


@register(
    "q_feature_hash",
    category="mlfeat",
    doc=(
        "Hashing-trick featurization: md5-derived (bucket, sign) in a "
        "2^18-dim space for two categoricals and their cross — fixed "
        "memory regardless of cardinality, no vocabulary pass, pure "
        "row-local JVM expressions (embarrassingly parallel at any "
        "scale). md5 keeps the indices engine-portable."
    ),
    oracle=f"""
        SELECT o_orderkey,
               {_duck_hashed("o_orderpriority", "prio")},
               {_duck_hashed("o_orderstatus", "status")},
               {_duck_hashed("o_orderpriority || '#' || o_orderstatus",
                             "cross")}
        FROM orders
    """,
)
def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    ip, sp = _spark_hashed(F.col("o_orderpriority"), "prio")
    ist, sst = _spark_hashed(F.col("o_orderstatus"), "status")
    ic, sc = _spark_hashed(
        F.concat_ws("#", "o_orderpriority", "o_orderstatus"), "cross"
    )
    return o.select("o_orderkey", ip, sp, ist, sst, ic, sc)


@register(
    "q_quantile_bins",
    category="mlfeat",
    doc=(
        "Equal-frequency quartile binning: ntile(4) over the TOTAL "
        "order (cents, unique key) within each priority — identical "
        "tie-breaking in both engines — then per-bin support and exact "
        "dollar edges. Rank math end-to-end; the only float op is the "
        "final presentation division."
    ),
    oracle=f"""
        SELECT o_orderpriority, bin,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MIN(c) AS DOUBLE) / 100 AS lo_total,
               CAST(MAX(c) AS DOUBLE) / 100 AS hi_total
        FROM (
          SELECT o_orderpriority, {_O_CENTS} AS c,
                 CAST(ntile(4) OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY {_O_CENTS}, o_orderkey
                 ) AS INT) AS bin
          FROM orders
        )
        GROUP BY o_orderpriority, bin
    """,
)
def q_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = F.expr(_O_CENTS)
    w = Window.partitionBy("o_orderpriority").orderBy(c, F.col("o_orderkey"))
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderpriority", c.alias("c"), F.ntile(4).over(w).alias("bin"))
        .groupBy("o_orderpriority", "bin")
        .agg(
            F.count("*").alias("n"),
            (F.min("c").cast("double") / 100).alias("lo_total"),
            (F.max("c").cast("double") / 100).alias("hi_total"),
        )
    )
