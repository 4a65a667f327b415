"""Relational query catalog: SURVEY.md section 2b rows M1-M5.

Row ops, joins, aggregation, windows, set ops, semi-structured. Every
query here is DuckDB-oracle-checkable; the Spark side is pure
DataFrame API (spark.sql only for GROUPING SETS, where SQL is the spec).

Scale notes (100 TB stance):
* filters/projections sit directly on the parquet scan so Catalyst
  pushes them down (verified via .explain in tests);
* the nation x region join broadcasts the 5-row dim explicitly;
* the theta/range self-join keeps an equi key (user_id) so Spark uses a
  hash join with a range residual instead of a cartesian product;
* aggregates rely on partial (map-side) aggregation — no collect()
  anywhere.

Flagship parity: q_filter_conj reproduces the reference's only query
(src/sql_to_kafka.py:147-151 -- status equality + date >= threshold)
plus the ordering contract its test asserts
(test/test_sql_to_kafka.py:190-192, most-recent-first), on typed
timestamps per SURVEY.md section 1.4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table

# Flagship threshold: injected constant, not now() — the reference's
# wall-clock-relative predicate is non-reproducible (SURVEY 1.4.2).
FLAGSHIP_STATUS = "O"
FLAGSHIP_THRESHOLD = "1998-01-01"


# --------------------------------------------------------------- M1 row ops


@register(
    "q_scan_project",
    category="rowops",
    doc="Parquet scan + column pruning (reference A1/A6).",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@register(
    "q_filter_conj",
    category="rowops",
    doc=(
        "FLAGSHIP: conjunctive equality + date-threshold filter + sort desc "
        "(reference A4+A5+A11, src/sql_to_kafka.py:147-151)."
    ),
    oracle=f"""
        SELECT * FROM orders
        WHERE o_orderstatus = '{FLAGSHIP_STATUS}'
          AND o_orderdate >= TIMESTAMP '{FLAGSHIP_THRESHOLD} 00:00:00'
        ORDER BY o_orderdate DESC, o_orderkey
    """,
)
def q_filter_conj(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderstatus") == FLAGSHIP_STATUS)
            & (F.col("o_orderdate") >= F.lit(FLAGSHIP_THRESHOLD).cast("timestamp"))
        )
        .orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey"))
    )


@register(
    "q_expr_arith",
    category="rowops",
    doc=(
        "Computed columns: discounted price and charge. No rounding: per-row "
        "IEEE arithmetic with identical association order is bit-identical "
        "across engines, while ROUND semantics differ at half boundaries "
        "(Spark BigDecimal HALF_UP vs DuckDB binary rounding)."
    ),
    oracle="""
        SELECT l_orderkey, l_linenumber,
               l_extendedprice * (1 - l_discount) AS disc_price,
               l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
        FROM lineitem
    """,
)
def q_expr_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc.alias("disc_price"),
        (disc * (1 + F.col("l_tax"))).alias("charge"),
    )


@register(
    "q_null_handling",
    category="rowops",
    doc="coalesce/nullif/CASE-null (reference CSV has null prices, SURVEY 1.2).",
    oracle="""
        SELECT c_custkey,
               COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
               CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_nonneg,
               (c_acctbal IS NOT NULL AND c_acctbal >= 0) AS bal_ok
        FROM customer
    """,
)
def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.when(F.col("c_acctbal") < 0, F.lit(None).cast("double"))
        .otherwise(F.col("c_acctbal"))
        .alias("bal_nonneg"),
        (F.col("c_acctbal").isNotNull() & (F.col("c_acctbal") >= 0)).alias("bal_ok"),
    )


@register(
    "q_case_when",
    category="rowops",
    doc="Conditional bucketing (status-style CASE).",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice > 200000 THEN 'big'
                    WHEN o_totalprice > 100000 THEN 'mid'
                    ELSE 'small' END AS bucket
        FROM orders
    """,
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
        .alias("bucket"),
    )


@register(
    "q_string_funcs",
    category="rowops",
    doc="upper/lower/substring/concat/length/LIKE/regexp (product-name ops).",
    oracle="""
        SELECT p_partkey,
               UPPER(p_name) AS up_name,
               LOWER(p_brand) AS lo_brand,
               SUBSTRING(p_name, 1, 5) AS name5,
               p_brand || '#' || p_type AS brand_type,
               CAST(LENGTH(p_name) AS INTEGER) AS name_len,
               (p_name LIKE '%a%') AS has_a,
               COALESCE(NULLIF(regexp_extract(p_name, '([a-z]+)', 1), ''), '') AS first_word
        FROM part
    """,
)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_brand").alias("lo_brand"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.col("p_name").like("%a%").alias("has_a"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
    )


@register(
    "q_date_funcs",
    category="rowops",
    doc="Date functions on typed timestamps (reference A5 semantics, SURVEY 1.4).",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(month(o_orderdate) AS INTEGER) AS o_month,
               CAST(day(o_orderdate) AS INTEGER) AS o_day,
               CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
               CAST(datediff('day', o_orderdate, TIMESTAMP '1999-01-01 00:00:00')
                    AS INTEGER) AS days_to_1999,
               CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start
        FROM orders
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofmonth("o_orderdate").alias("o_day"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("plus30"),
        F.datediff(F.lit("1999-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias(
            "days_to_1999"
        ),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
    )


@register(
    "q_math_funcs",
    category="rowops",
    doc="round/abs/ceil/floor/pow/sqrt.",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               ROUND(l_extendedprice, 3) AS price_r3,
               ABS(l_discount - 0.05) AS disc_dev,
               CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
               CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
               POW(l_quantity, 2) AS qty_sq,
               SQRT(l_extendedprice) AS price_sqrt
        FROM lineitem
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # price has 2 decimal digits, so ROUND(..., 3) never sits on a half
    # boundary (see q_expr_arith note); sqrt is IEEE correctly-rounded on
    # both engines, so it needs no rounding at all.
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 3).alias("price_r3"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        F.pow("l_quantity", F.lit(2)).alias("qty_sq"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
    )


@register(
    "q_sort_limit",
    category="rowops",
    doc="ORDER BY multi-key + LIMIT (top-k, tie-broken on unique key).",
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


# ----------------------------------------------------------------- M2 joins


@register(
    "q_join_inner",
    category="joins",
    doc="Equi hash join orders x customer.",
    oracle="""
        SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name"
    )


@register(
    "q_join_left",
    category="joins",
    doc="Left outer join customer -> orders.",
    oracle="""
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "q_join_full",
    category="joins",
    doc="Full outer join orders x customer.",
    oracle="""
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
        FROM customer c FULL JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@register(
    "q_join_semi",
    category="joins",
    doc="Existence join (LEFT SEMI == EXISTS).",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "q_join_anti",
    category="joins",
    doc="Anti join (LEFT ANTI == NOT EXISTS).",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "q_join_broadcast",
    category="joins",
    doc="Star-dim join with explicit broadcast of the 5-row region dim.",
    oracle="""
        SELECT n.n_nationkey, n.n_name, r.r_name
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "n_name", "r_name"
    )


@register(
    "q_join_theta_range",
    category="joins",
    doc=(
        "Range join: follow-up events within 1h per user. Keeps user_id as an "
        "equi key so Spark hash-joins with a range residual (no cartesian)."
    ),
    oracle="""
        SELECT e1.event_id AS a_id,
               CAST(COUNT(e2.event_id) AS BIGINT) AS n_followups
        FROM events e1
        JOIN events e2
          ON e1.user_id = e2.user_id
         AND e2.ts > e1.ts
         AND e2.ts <= e1.ts + INTERVAL 1 HOUR
        GROUP BY e1.event_id
    """,
)
def q_join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Range-bucket join (operators/temporal.py): candidates limited to
    # same/adjacent 1h buckets per user instead of every same-user pair,
    # so per-user cost stays linear in events-per-hour at any scale.
    from kafka_s3_etl_spark.operators.temporal import range_bucket_join

    events = load_table(spark, sf_dir, "events")
    left = events.select(F.col("event_id").alias("a_id"), "user_id", "ts")
    right = events.select(
        F.col("user_id").alias("r_user_id"), F.col("ts").alias("r_ts")
    )
    joined = range_bucket_join(
        left,
        right,
        key="user_id",
        right_key="r_user_id",
        left_ts="ts",
        right_ts="r_ts",
        window_micros=3_600_000_000,
    )
    return joined.groupBy("a_id").agg(F.count("*").alias("n_followups"))


@register(
    "q_join_multiway",
    category="joins",
    doc="3+ table star join region->nation->customer->orders, rolled up by region.",
    oracle="""
        SELECT r.r_name,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
               ROUND(SUM(o.o_totalprice), 2) AS total_spend
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        GROUP BY r.r_name
    """,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
    )


# ----------------------------------------------------------- M3 aggregation


@register(
    "q_agg_global",
    category="aggregates",
    doc="Global count/sum/avg/min/max (single partial-agg pass).",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(AVG(l_extendedprice), 4) AS avg_price,
               MIN(l_shipdate) AS min_ship,
               MAX(l_shipdate) AS max_ship
        FROM lineitem
    """,
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


@register(
    "q_agg_group",
    category="aggregates",
    doc="TPC-H Q1-shaped hash aggregation (map-side partial agg + 1 shuffle).",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_extendedprice), 4) AS avg_price,
               ROUND(AVG(l_discount), 4) AS avg_disc,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q_agg_distinct",
    category="aggregates",
    doc="COUNT(DISTINCT ...) per group (expand + two-phase agg in Spark).",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps
        FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@register(
    "q_agg_approx_distinct",
    category="aggregates",
    doc="HLL approximate distinct — rows-only (HLL impls differ from DuckDB).",
    oracle=None,
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts")
    )


@register(
    "q_rollup",
    category="aggregates",
    doc="ROLLUP grouping hierarchy.",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n")
    )


@register(
    "q_cube",
    category="aggregates",
    doc="CUBE over two grouping columns.",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n")
    )


@register(
    "q_grouping_sets",
    category="aggregates",
    doc="GROUPING SETS via spark.sql (SQL form is the spec here).",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# -------------------------------------------------------------- M4 windows


@register(
    "q_window_rank",
    category="windows",
    doc="rank/dense_rank per partition (tie-stable, deterministic).",
    oracle="""
        SELECT o_orderkey, o_orderstatus,
               CAST(RANK() OVER w AS BIGINT) AS rnk,
               CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC)
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(F.col("o_totalprice").desc())
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
    )


@register(
    "q_window_lag_lead",
    category="windows",
    doc="lag/lead per user ordered by (ts, event_id) — tie-broken, deterministic.",
    oracle="""
        SELECT event_id, user_id,
               LAG(value) OVER w AS prev_value,
               LEAD(value) OVER w AS next_value
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
    )


@register(
    "q_window_running",
    category="windows",
    doc="Running sum frame (ROWS UNBOUNDED PRECEDING), deterministic order.",
    oracle="""
        SELECT o_orderkey, o_custkey,
               ROUND(SUM(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total
        FROM orders
    """,
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("run_total"),
    )


@register(
    "q_topk_per_group",
    category="windows",
    doc="Top-3 orders per customer (row_number window, tie-broken on key).",
    oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey) AS rn
            FROM orders
        ) WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


# -------------------------------------------- M5 set ops + semi-structured


@register(
    "q_union_all",
    category="setops",
    doc="UNION ALL of two tagged projections.",
    oracle="""
        SELECT c_nationkey AS nationkey, 'customer' AS src FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey, 'supplier' AS src FROM supplier
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("src")
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("src")
    )
    return c.unionAll(s)


@register(
    "q_union_distinct",
    category="setops",
    doc="UNION (distinct).",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "q_intersect",
    category="setops",
    doc="INTERSECT (distinct).",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "q_except",
    category="setops",
    doc="EXCEPT (distinct).",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@register(
    "q_array_explode",
    category="semistructured",
    doc="Explode array column (reference JSON itemSellingPrices shape, B2/F3).",
    oracle="""
        SELECT vec_id, label, CAST(UNNEST(embedding) AS DOUBLE) AS val
        FROM embeddings
    """,
)
def q_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select("vec_id", "label", F.explode("embedding").alias("v")).select(
        "vec_id", "label", F.col("v").cast("double").alias("val")
    )


@register(
    "q_json_extract",
    category="semistructured",
    doc="JSON extraction from a string column (events.props, reference B2).",
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


# ----------------------------------------------- analytics extensions


@register(
    "q_pivot",
    category="aggregation",
    doc="Pivot: returnflag columns of summed quantity per linestatus "
    "(explicit value list keeps the plan a single pass, no value scan).",
    oracle="""
        SELECT l_linestatus,
               ROUND(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS A,
               ROUND(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS N,
               ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS R
        FROM lineitem GROUP BY l_linestatus
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pv = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    return pv


@register(
    "q_percentiles",
    category="aggregation",
    doc=(
        "Exact percentiles (median/p90) per order priority: Spark "
        "percentile() == DuckDB quantile_cont (both linear-interpolate); "
        "rounded to 4dp because the engines associate the interpolation "
        "arithmetic differently (2-decimal inputs make 4dp exact)."
    ),
    oracle="""
        SELECT o_orderpriority,
               ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
               ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90
        FROM orders GROUP BY o_orderpriority
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
    )


@register(
    "q_histogram",
    category="aggregation",
    doc=(
        "Fixed-width histogram of order totals: shared floor((x-lo)/step) "
        "bucket arithmetic on both engines (DuckDB lacks width_bucket)."
    ),
    oracle="""
        SELECT CAST(LEAST(FLOOR(o_totalprice / 50000.0), 9) AS INTEGER) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM orders GROUP BY 1
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000.0), F.lit(9)).cast("int")
    return o.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("n"))


@register(
    "q_join_salted",
    category="joins",
    doc=(
        "Skew-mitigation salted join (operators/skew.py): fact rows spray "
        "over (key, salt) sub-keys, dim replicated salt_n times. Result is "
        "row-identical to the plain join — the oracle IS the plain join."
    ),
    oracle="""
        SELECT l_orderkey, l_linenumber, o_orderstatus, o_totalprice
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_s3_etl_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return salted_join(
        li, o, key="l_orderkey", dim_key="o_orderkey",
        fact_salt_cols=["l_orderkey", "l_linenumber"],
    ).select("l_orderkey", "l_linenumber", "o_orderstatus", "o_totalprice")


@register(
    "q_window_range_frame",
    category="windows",
    doc=(
        "RANGE frame: count of same-priority orders within 10k price "
        "below each order (value-based frame, vs the ROWS frame of "
        "q_window_running)."
    ),
    oracle="""
        SELECT o_orderkey, o_orderpriority,
               CAST(COUNT(*) OVER (
                   PARTITION BY o_orderpriority ORDER BY o_totalprice
                   RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS n_near_below
        FROM orders
    """,
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.count("*").over(w).alias("n_near_below"),
    )


@register(
    "q_window_ntile",
    category="windows",
    doc=(
        "Distribution windows: decile bucket (ntile), percent_rank, "
        "cume_dist per order over price within status — the quality-"
        "decile shape a curation pipeline uses to keep the top slice of "
        "a corpus. Ordering key includes the unique o_orderkey so every "
        "rank is deterministic; percent_rank/cume_dist are exact integer "
        "ratios, bit-identical across engines."
    ),
    oracle="""
        SELECT o_orderkey, o_orderstatus,
               CAST(NTILE(10) OVER w AS INTEGER) AS decile,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.ntile(10).over(w).alias("decile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "q_agg_approx_quantile",
    category="aggregation",
    doc=(
        "Sketch-family quantiles: percentile_approx over lineitem price "
        "per returnflag. Rows-only: Spark's GK sketch and DuckDB's "
        "t-digest give different approximations; the error bound vs the "
        "exact percentile is asserted in tests."
    ),
    oracle=None,
)
def q_agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 1000).alias(
            "approx_pcts"
        )
    )


@register(
    "q_scalar_subquery",
    category="joins",
    doc=(
        "Correlated scalar subquery: orders priced above their status's "
        "average — Catalyst decorrelates it into an aggregate + join, "
        "never a per-row re-execution (the plan-shape test pins the "
        "absence of nested loops). ROUND(avg) on both sides so the "
        "comparison threshold is identical."
    ),
    oracle="""
        SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice
        FROM orders o
        WHERE o.o_totalprice > (
            SELECT ROUND(AVG(i.o_totalprice), 2) FROM orders i
            WHERE i.o_orderstatus = o.o_orderstatus
        )
    """,
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_ssq")
    return spark.sql(
        """
        SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice
        FROM orders_ssq o
        WHERE o.o_totalprice > (
            SELECT ROUND(AVG(i.o_totalprice), 2) FROM orders_ssq i
            WHERE i.o_orderstatus = o.o_orderstatus
        )
        """
    )


@register(
    "q_variant_extract",
    category="semi-structured",
    doc=(
        "VARIANT semi-structured path (Spark 4): parse_json into the "
        "binary variant encoding, typed field extraction with "
        "try_variant_get — the schema-on-read shape for heterogeneous "
        "event payloads (vs q_json_extract's string-path get_json_object)."
    ),
    oracle="""
        SELECT event_id,
               CAST(props->>'$.k' AS INTEGER) AS k,
               (CAST(props->>'$.k' AS INTEGER) >= 50) AS k_high
        FROM events
    """,
)
def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "int")
    return ev.select(
        "event_id",
        k.alias("k"),
        (k >= 50).alias("k_high"),
    )


@register(
    "q_unpivot",
    category="aggregation",
    doc=(
        "UNPIVOT/melt — the inverse of q_pivot: wide per-line measures "
        "(quantity, price, discount) to long (measure, value) rows. "
        "Pure row expansion (3x Generate), no shuffle."
    ),
    oracle="""
        SELECT l_orderkey, l_linenumber, measure, value
        FROM (SELECT l_orderkey, l_linenumber,
                     l_quantity, l_extendedprice, l_discount
              FROM lineitem)
        UNPIVOT (value FOR measure IN (l_quantity, l_extendedprice, l_discount))
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
    ).unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="value",
    )
