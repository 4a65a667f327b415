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


@register(
    "q_ds_timeband_counts",
    category="olap",
    doc=(
        "TPC-DS Q88 shape: store traffic by time-of-day band. Q88 "
        "writes 8 self-joined subqueries; here all bands are "
        "conditional aggregates in ONE scan/pass (plan-pinned single "
        "scan) — at 100 TB the difference between 1 and 8 reads of the "
        "fact. Per event_type: counts in four 6-hour bands + exact "
        "cents value per band."
    ),
    oracle="""
        SELECT event_type,
               CAST(SUM(CASE WHEN h BETWEEN 0 AND 5 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_night,
               CAST(SUM(CASE WHEN h BETWEEN 6 AND 11 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_morning,
               CAST(SUM(CASE WHEN h BETWEEN 12 AND 17 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_afternoon,
               CAST(SUM(CASE WHEN h BETWEEN 18 AND 23 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_evening,
               CAST(SUM(CASE WHEN h BETWEEN 18 AND 23 THEN c ELSE 0 END)
                    AS DOUBLE) / 100 AS evening_value
        FROM (
          SELECT event_type, CAST(hour(ts) AS INT) AS h,
                 CAST(ROUND(value * 100) AS BIGINT) AS c
          FROM events
        )
        GROUP BY event_type
    """,
)
def q_ds_timeband_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").alias("h"),
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("c"),
    )

    def band(lo: int, hi: int, col=None):
        cond = F.col("h").between(lo, hi)
        return F.sum(F.when(cond, col if col is not None else 1).otherwise(0))

    return ev.groupBy("event_type").agg(
        band(0, 5).alias("n_night"),
        band(6, 11).alias("n_morning"),
        band(12, 17).alias("n_afternoon"),
        band(18, 23).alias("n_evening"),
        (band(18, 23, F.col("c")).cast("double") / 100).alias(
            "evening_value"
        ),
    )


@register(
    "q_ds_cume_share",
    category="olap",
    doc=(
        "TPC-DS Q51 shape: two channels' day-by-day CUMULATIVE totals "
        "compared on a shared spine — clicks vs purchases, full outer "
        "on day, missing days as 0, running exact-cents sums, emit the "
        "days where the click channel's cumulative value leads. One "
        "rollup per channel + one merge; the windows run over the "
        "tiny day spine, never the fact."
    ),
    oracle="""
        WITH daily AS (
          SELECT CAST(ts AS DATE) AS d, event_type,
                 SUM(CAST(ROUND(value * 100) AS BIGINT)) AS c
          FROM events
          WHERE event_type IN ('click', 'purchase')
          GROUP BY 1, 2
        ), merged AS (
          SELECT COALESCE(a.d, b.d) AS d,
                 COALESCE(a.c, 0) AS click_c,
                 COALESCE(b.c, 0) AS buy_c
          FROM (SELECT d, c FROM daily WHERE event_type = 'click') a
          FULL JOIN (SELECT d, c FROM daily WHERE event_type = 'purchase') b
            ON a.d = b.d
        )
        SELECT d,
               CAST(SUM(click_c) OVER w AS DOUBLE) / 100 AS cum_click,
               CAST(SUM(buy_c) OVER w AS DOUBLE) / 100 AS cum_purchase
        FROM merged
        WINDOW w AS (ORDER BY d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        QUALIFY SUM(click_c) OVER w > SUM(buy_c) OVER w
    """,
)
def q_ds_cume_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .groupBy(
            F.to_date("ts").alias("d"),
            "event_type",
        )
        .agg(F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)")).alias("c"))
    )
    a = daily.filter(F.col("event_type") == "click").select("d", F.col("c").alias("click_c"))
    b = daily.filter(F.col("event_type") == "purchase").select(
        F.col("d").alias("bd"), F.col("c").alias("buy_c")
    )
    merged = (
        a.join(b, a.d == b.bd, "full_outer")
        .select(
            F.coalesce(a.d, F.col("bd")).alias("d"),
            F.coalesce("click_c", F.lit(0)).alias("click_c"),
            F.coalesce("buy_c", F.lit(0)).alias("buy_c"),
        )
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = merged.select(
        "d",
        F.sum("click_c").over(w).alias("cc"),
        F.sum("buy_c").over(w).alias("cb"),
    )
    return cum.filter(F.col("cc") > F.col("cb")).select(
        "d",
        (F.col("cc").cast("double") / 100).alias("cum_click"),
        (F.col("cb").cast("double") / 100).alias("cum_purchase"),
    )


@register(
    "q_ds_topk_rollup",
    category="olap",
    doc=(
        "TPC-DS Q67 shape: rank WITHIN each rollup level — "
        "ROLLUP(priority, status) exact-cents totals, then rank rows "
        "inside their own grouping level (grand total, per-priority, "
        "leaf) by total, keep the top 3 per level. The window runs "
        "over the tiny rollup output, never the fact; NULL grouping "
        "cells are disambiguated via GROUPING() on both engines."
    ),
    oracle="""
        WITH r AS (
          SELECT o_orderpriority, o_orderstatus,
                 GROUPING(o_orderpriority) AS gp,
                 GROUPING(o_orderstatus) AS gs,
                 SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS c
          FROM orders
          GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
        )
        SELECT o_orderpriority, o_orderstatus,
               CAST(gp AS INT) AS gp, CAST(gs AS INT) AS gs,
               CAST(c AS DOUBLE) / 100 AS total,
               CAST(rnk AS INT) AS rnk
        FROM (
          SELECT *,
                 row_number() OVER (
                   PARTITION BY gp, gs
                   ORDER BY c DESC, COALESCE(o_orderpriority, ''),
                            COALESCE(o_orderstatus, '')
                 ) AS rnk
          FROM r
        )
        WHERE rnk <= 3
    """,
)
def q_ds_topk_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping("o_orderpriority").cast("int").alias("gp"),
            F.grouping("o_orderstatus").cast("int").alias("gs"),
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).alias(
                "c"
            ),
        )
    )
    w = Window.partitionBy("gp", "gs").orderBy(
        F.col("c").desc(),
        F.coalesce("o_orderpriority", F.lit("")),
        F.coalesce("o_orderstatus", F.lit("")),
    )
    return (
        r.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            "o_orderpriority",
            "o_orderstatus",
            "gp",
            "gs",
            (F.col("c").cast("double") / 100).alias("total"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )
