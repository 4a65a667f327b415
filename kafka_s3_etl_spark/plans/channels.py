"""TPC-DS-flavored warehouse shapes the TPC-H set doesn't cover
(round 7, VERDICT r6 optional-depth item): sales-vs-returns outer-join
rollups and cross-channel / cross-period window comparisons.

The TPC-DS patterns re-parameterized to the driver's testdata:

* q_ds_net_returns — the catalog_sales LEFT/FULL JOIN catalog_returns
  rollup family (Q77/Q80 shape): two independent fact rollups (gross
  per brand; returned per brand) FULL-OUTER-joined on the dimension
  key with COALESCE'd measures. The 100 TB shape: each side is one
  map-side-combined aggregate over the (broadcast-pruned) fact, the
  outer join runs on the tiny |brands| rollup outputs — the fact is
  never joined row-to-row against returns.
* q_ds_channel_wow — the web/store/catalog cross-channel week-over-week
  comparison (Q2 shape): per (channel, week) counts, then LAG within
  each channel ordered by week. One corpus aggregation; the window
  runs over |channels x weeks| rollup rows.
* q_ds_yoy_growth — the year-over-year customer-growth family
  (Q74/Q31 shape): per (customer, year) exact-cents spend, LAG by year
  within customer, integer cross-multiply for the >10% growth filter
  (cur*10 > prev*11 — no float threshold on a rounding boundary), one
  IEEE division for the reported ratio.

Exactness follows the house convention (plans/warehouse.py): money in
BIGINT cents summed exactly and divided ONCE; DuckDB SUM(BIGINT)
widens to HUGEINT so oracles CAST; COUNT and year() cast to the Spark
type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table

_LI_CENTS = "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
_O_CENTS = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"


@register(
    "q_ds_net_returns",
    category="relational",
    doc=(
        "TPC-DS sales/returns rollup (Q77/Q80 shape): per-brand gross "
        "vs returned revenue via two map-combined fact rollups FULL-"
        "OUTER-joined on the broadcast part dimension's brand; the "
        "outer join touches only |brands| rollup rows, never the fact."
    ),
    oracle=f"""
        WITH sales AS (
          SELECT p.p_brand, SUM({_LI_CENTS}) AS gross_c
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          GROUP BY p.p_brand
        ),
        rets AS (
          SELECT p.p_brand, SUM({_LI_CENTS}) AS ret_c,
                 COUNT(*) AS n_ret
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
          WHERE l.l_returnflag = 'R'
          GROUP BY p.p_brand
        )
        SELECT COALESCE(s.p_brand, r.p_brand) AS p_brand,
               CAST(COALESCE(s.gross_c, 0) AS DOUBLE) / 100 AS gross,
               CAST(COALESCE(r.ret_c, 0) AS DOUBLE) / 100 AS returned,
               CAST(COALESCE(s.gross_c, 0) - COALESCE(r.ret_c, 0)
                    AS DOUBLE) / 100 AS net,
               CAST(COALESCE(r.n_ret, 0) AS BIGINT) AS n_return_lines
        FROM sales s FULL OUTER JOIN rets r ON s.p_brand = r.p_brand
    """,
)
def q_ds_net_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    brand = F.broadcast(
        load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    )
    cents = F.expr(_LI_CENTS)
    sales = (
        li.join(brand, li.l_partkey == brand.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(cents).alias("gross_c"))
    )
    rets = (
        li.filter(F.col("l_returnflag") == "R")
        .join(brand, li.l_partkey == brand.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(cents).alias("ret_c"), F.count("*").alias("n_ret"))
    )
    s, r = sales.alias("s"), rets.alias("r")
    return (
        s.join(r, F.col("s.p_brand") == F.col("r.p_brand"), "full_outer")
        .select(
            F.coalesce(F.col("s.p_brand"), F.col("r.p_brand")).alias("p_brand"),
            (F.coalesce("gross_c", F.lit(0)).cast("double") / 100).alias("gross"),
            (F.coalesce("ret_c", F.lit(0)).cast("double") / 100).alias("returned"),
            (
                (F.coalesce("gross_c", F.lit(0)) - F.coalesce("ret_c", F.lit(0)))
                .cast("double")
                / 100
            ).alias("net"),
            F.coalesce("n_ret", F.lit(0)).cast("bigint").alias("n_return_lines"),
        )
    )


@register(
    "q_ds_channel_wow",
    category="analytics",
    doc=(
        "TPC-DS cross-channel week-over-week comparison (Q2 shape): "
        "per (event_type, week) counts from ONE map-combined corpus "
        "aggregation, then LAG within each channel — the window runs "
        "over |channels x weeks| rollup rows, corpus-independent."
    ),
    oracle="""
        WITH wk AS (
          SELECT event_type,
                 CAST(date_trunc('week', ts) AS DATE) AS week,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2
        )
        SELECT event_type, week, n,
               CAST(LAG(n) OVER (
                 PARTITION BY event_type ORDER BY week
               ) AS BIGINT) AS n_prev,
               CAST(n - LAG(n) OVER (
                 PARTITION BY event_type ORDER BY week
               ) AS BIGINT) AS wow_delta
        FROM wk
    """,
)
def q_ds_channel_wow(spark: SparkSession, sf_dir: str) -> DataFrame:
    wk = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.date_trunc("week", "ts").cast("date").alias("week"),
        )
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("event_type").orderBy("week")
    return wk.select(
        "event_type",
        "week",
        "n",
        F.lag("n").over(w).alias("n_prev"),
        (F.col("n") - F.lag("n").over(w)).alias("wow_delta"),
    )


@register(
    "q_ds_yoy_growth",
    category="analytics",
    doc=(
        "TPC-DS year-over-year growth (Q74/Q31 shape): per (customer, "
        "year) exact-cents spend, LAG by year within customer, >10% "
        "growth kept via integer cross-multiply (cur*10 > prev*11) and "
        "the ratio reported through one IEEE division — bit-identical "
        "across engines with zero float thresholds."
    ),
    oracle=f"""
        WITH yr AS (
          SELECT o_custkey, CAST(year(o_orderdate) AS INT) AS yr,
                 SUM({_O_CENTS}) AS cents
          FROM orders GROUP BY 1, 2
        ),
        lagged AS (
          SELECT o_custkey, yr, cents,
                 LAG(cents) OVER (
                   PARTITION BY o_custkey ORDER BY yr
                 ) AS prev_cents
          FROM yr
        )
        SELECT o_custkey, yr,
               CAST(cents AS DOUBLE) / 100 AS cur_spend,
               CAST(prev_cents AS DOUBLE) / 100 AS prev_spend,
               CAST(cents AS DOUBLE) / CAST(prev_cents AS DOUBLE) AS growth
        FROM lagged
        WHERE prev_cents IS NOT NULL AND cents * 10 > prev_cents * 11
    """,
)
def q_ds_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    yr = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            "o_custkey",
            F.year("o_orderdate").alias("yr"),
        )
        .agg(F.sum(F.expr(_O_CENTS)).alias("cents"))
    )
    w = Window.partitionBy("o_custkey").orderBy("yr")
    lagged = yr.withColumn("prev_cents", F.lag("cents").over(w))
    return lagged.filter(
        F.col("prev_cents").isNotNull()
        & (F.col("cents") * 10 > F.col("prev_cents") * 11)
    ).select(
        "o_custkey",
        "yr",
        (F.col("cents").cast("double") / 100).alias("cur_spend"),
        (F.col("prev_cents").cast("double") / 100).alias("prev_spend"),
        (F.col("cents").cast("double") / F.col("prev_cents").cast("double")).alias(
            "growth"
        ),
    )
