"""Round-6 batch: the remaining classic TPC-H query shapes.

Beyond-reference tier (same policy as plans/analytics.py/olap.py): the
reference's users run warehouse workloads; these are the canonical
subquery/semi-join/anti-join patterns not yet represented in the
catalog, each re-parameterized to the synthetic testdata schema (no
l_receiptdate/l_commitdate/partsupp columns exist, so "late" is
l_shipdate > o_orderdate + 60 days and supplier-part linkage rides
lineitem).

Catalog (SURVEY.md 2j):

* q_tpch_priority     — Q4 shape: EXISTS-correlated semi-join with a
  condition on BOTH sides (late lineitem vs its order's own date);
  Spark expresses it as a left-semi join with a compound condition, so
  the probe side is the date-filtered orders slice, never the fact.
* q_tpch_returned     — Q10 shape: returned-revenue top-20 customers;
  exact-cents revenue, total (revenue DESC, c_custkey) order so the
  LIMIT cut is engine-deterministic.
* q_tpch_promo        — Q14 shape: conditional revenue share over one
  ship-month; CASE-summed exact e4 units divided once.
* q_tpch_top_supplier — Q15 shape: argmax over an aggregate (the
  "revenue view"): per-supplier exact-e4 revenue, global max via a
  1-row broadcast cross join (never a global sort), equality filter.
* q_tpch_parts_supp   — Q16 shape: distinct-supplier count per part
  attribute with a NOT IN supplier blacklist; blacklist and part dim
  both broadcast, one distinct-agg shuffle on the group key.
* q_tpch_small_qty    — Q17 shape: correlated per-part average
  threshold; brand filter broadcasts FIRST so the threshold agg and
  the probe both run on the 1/25-selectivity lineitem slice; the
  per-part thresholds re-enter via broadcast. avg(l_quantity) is a sum
  of integral doubles (exact in any accumulation order) divided once,
  and 0.2*avg is one IEEE multiply — bit-identical across engines.
* q_tpch_waiting      — Q21 shape: the EXISTS + NOT-EXISTS double
  correlation ("only supplier who was late in a multi-supplier
  order"), reformulated as two map-side-combined per-order aggregates
  (n_suppliers, n_late_suppliers) joined back to the late rows:
  n_supp >= 2 == EXISTS other-supplier, n_late == 1 == NOT EXISTS
  other-late-supplier (the row itself is late, so its supplier is in
  the late set). One order-key shuffle feeds all three consumers —
  no correlated re-scan of the fact, which is the whole 100 TB point.
* q_tpch_idle_customers — Q22 shape: scalar-subquery threshold
  (average positive balance, exact cents) + anti-join against orders;
  the threshold is a 1-row broadcast, the anti-join shuffles on the
  customer key only.

Exactness: money stays in BIGINT cents / e4 units summed exactly and
divided ONCE (plans/analytics.py convention); DuckDB SUM(BIGINT)
widens to HUGEINT so oracles CAST before exposure; COUNT casts to
BIGINT. Integral l_quantity makes double avg() exact on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table

_CENTS = "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
_DPC = "CAST(ROUND(l_discount * 100) AS BIGINT)"
_E4 = f"{_CENTS} * (100 - {_DPC})"
_ACB_CENTS = "CAST(ROUND(c_acctbal * 100) AS BIGINT)"


@register(
    "q_tpch_priority",
    category="relational",
    doc=(
        "TPC-H Q4 shape: order-priority counts for one quarter, "
        "EXISTS a lineitem shipped >60 days after its own order date; "
        "left-semi join with a compound (key AND date) condition."
    ),
    oracle="""
        SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
          AND o.o_orderdate <  TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY 1
    """,
)
def q_tpch_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    ords = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.expr("TIMESTAMP '1996-07-01'"))
            & (F.col("o_orderdate") < F.expr("TIMESTAMP '1996-10-01'"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late_exists = ords.join(
        li,
        (ords.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > ords.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late_exists.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


@register(
    "q_tpch_returned",
    category="relational",
    doc=(
        "TPC-H Q10 shape: top-20 customers by returned-item revenue in "
        "one quarter; exact-cents revenue, (revenue DESC, c_custkey) "
        "total order makes the LIMIT cut deterministic."
    ),
    oracle=f"""
        SELECT c.c_custkey, c.c_name, n.n_name, c.c_acctbal,
               CAST(SUM({_E4}) AS DOUBLE) / 1e4 AS revenue
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1996-04-01'
        GROUP BY 1, 2, 3, 4
        ORDER BY SUM({_E4}) DESC, c.c_custkey
        LIMIT 20
    """,
)
def q_tpch_returned(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", F.expr(_E4).alias("e4"))
    )
    ords = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.expr("TIMESTAMP '1996-01-01'"))
            & (F.col("o_orderdate") < F.expr("TIMESTAMP '1996-04-01'"))
        )
        .select("o_orderkey", "o_custkey")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(cust, ords.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.sum("e4").alias("rev_e4"))
        .orderBy(F.col("rev_e4").desc(), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "c_acctbal",
            (F.col("rev_e4").cast("double") / F.lit(1e4)).alias("revenue"),
        )
    )


@register(
    "q_tpch_promo",
    category="relational",
    doc=(
        "TPC-H Q14 shape: promo-type revenue share over one ship-month; "
        "CASE-summed exact e4 units, both ratios divided once."
    ),
    oracle=f"""
        SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_E4} ELSE 0 END)
                    AS DOUBLE)
                 / CAST(SUM({_E4}) AS DOUBLE) AS promo_share,
               CAST(SUM({_E4}) AS DOUBLE) / 1e4 AS revenue_total
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1996-03-01'
          AND l.l_shipdate <  TIMESTAMP '1996-04-01'
    """,
)
def q_tpch_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP '1996-03-01'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP '1996-04-01'"))
        )
        .select("l_partkey", F.expr(_E4).alias("e4"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    return joined.agg(
        (
            F.sum(F.when(F.col("p_type") == "PROMO", F.col("e4")).otherwise(F.lit(0)))
            .cast("double")
            / F.sum("e4").cast("double")
        ).alias("promo_share"),
        (F.sum("e4").cast("double") / F.lit(1e4)).alias("revenue_total"),
    )


@register(
    "q_tpch_top_supplier",
    category="relational",
    doc=(
        "TPC-H Q15 shape: supplier(s) with the maximum quarterly "
        "revenue; exact-e4 per-supplier agg, global max re-enters as a "
        "1-row broadcast cross join (no global sort), BIGINT equality."
    ),
    oracle=f"""
        WITH rev AS (
          SELECT l_suppkey, CAST(SUM({_E4}) AS BIGINT) AS rev_e4
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate <  TIMESTAMP '1996-04-01'
          GROUP BY 1
        )
        SELECT s.s_suppkey, s.s_name,
               CAST(r.rev_e4 AS DOUBLE) / 1e4 AS total_revenue
        FROM rev r JOIN supplier s ON r.l_suppkey = s.s_suppkey
        WHERE r.rev_e4 = (SELECT MAX(rev_e4) FROM rev)
    """,
)
def q_tpch_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP '1996-01-01'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP '1996-04-01'"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.expr(_E4)).alias("rev_e4"))
    )
    top = rev.agg(F.max("rev_e4").alias("max_e4"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(top))
        .filter(F.col("rev_e4") == F.col("max_e4"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_e4").cast("double") / F.lit(1e4)).alias("total_revenue"),
        )
    )


@register(
    "q_tpch_parts_supp",
    category="relational",
    doc=(
        "TPC-H Q16 shape: distinct-supplier count per part attribute, "
        "NOT IN supplier blacklist; part dim and blacklist broadcast "
        "(the blacklist as a broadcast anti-join), one distinct-agg "
        "shuffle on the group key."
    ),
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_size IN (1, 14, 23, 45)
          AND l.l_suppkey NOT IN
              (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
        GROUP BY 1, 2, 3
    """,
)
def q_tpch_parts_supp(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size").isin(1, 14, 23, 45))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_tpch_small_qty",
    category="relational",
    doc=(
        "TPC-H Q17 shape: lineitems under 20% of their part's average "
        "quantity for one brand; brand broadcast-filters lineitem "
        "FIRST, the per-part threshold agg runs on that slice and "
        "re-enters via broadcast. Integral quantities keep avg() "
        "bit-exact across engines."
    ),
    oracle=f"""
        SELECT CAST(SUM({_CENTS}) AS DOUBLE) / 700.0 AS avg_yearly,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand = 'Brand#23'
          AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                              FROM lineitem l2
                              WHERE l2.l_partkey = l.l_partkey)
    """,
)
def q_tpch_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    pdim = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    fli = li.join(F.broadcast(pdim), li.l_partkey == pdim.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thresh = fli.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        fli.join(F.broadcast(thresh), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            (F.sum(F.expr(_CENTS)).cast("double") / F.lit(700.0)).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q_tpch_waiting",
    category="relational",
    cost=1,
    doc=(
        "TPC-H Q21 shape: only-late-supplier in multi-supplier orders "
        "(EXISTS + NOT EXISTS double correlation) as two per-order "
        "aggregates joined back to the late rows — one order-key "
        "shuffle, no correlated fact re-scan."
    ),
    oracle="""
        WITH fli AS (
          SELECT l.l_orderkey, l.l_suppkey, l.l_shipdate, o.o_orderdate
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE o.o_orderstatus = 'F'
        ),
        late AS (
          SELECT * FROM fli
          WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        )
        SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM late l1
        JOIN supplier s ON l1.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_3'
          AND EXISTS (SELECT 1 FROM fli l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY 1
        ORDER BY numwait DESC, s.s_name
        LIMIT 100
    """,
)
def q_tpch_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    ords = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    fli = li.join(ords, li.l_orderkey == ords.o_orderkey).select(
        "l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate"
    )
    late = fli.filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    n_supp = fli.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp")
    )
    n_late = late.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_late")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_name") == "NATION_3")
        .select("s_suppkey", "s_name")
    )
    return (
        late.join(n_supp, "l_orderkey")
        .join(n_late, "l_orderkey")
        .filter((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@register(
    "q_tpch_idle_customers",
    category="relational",
    doc=(
        "TPC-H Q22 shape: per-nation count/balance of above-average-"
        "balance customers with no RECENT orders (>= 2000-07); "
        "exact-cents scalar threshold as a 1-row broadcast, anti-join "
        "against the date-filtered orders slice on the customer key."
    ),
    oracle=f"""
        WITH thr AS (
          SELECT CAST(SUM({_ACB_CENTS}) AS DOUBLE) / COUNT(*) AS avg_cents
          FROM customer WHERE c_acctbal > 0.0
        )
        SELECT c.c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM({_ACB_CENTS}) AS DOUBLE) / 100.0 AS totacctbal
        FROM customer c, thr
        WHERE CAST({_ACB_CENTS} AS DOUBLE) > thr.avg_cents
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-07-01')
        GROUP BY 1
    """,
)
def q_tpch_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", F.expr(_ACB_CENTS).alias("cents")
    )
    thr = cust.filter(F.col("cents") > 0).agg(
        (F.sum("cents").cast("double") / F.count("*")).alias("avg_cents")
    )
    ords = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.expr("TIMESTAMP '2000-07-01'"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(thr))
        .filter(F.col("cents").cast("double") > F.col("avg_cents"))
        .join(ords, cust.c_custkey == ords.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum("cents").cast("double") / F.lit(100.0)).alias("totacctbal"),
        )
    )


# ---- batch 6b: the scan/disjunction/outer-join TPC-H shapes ----------

@register(
    "q_tpch_forecast",
    category="relational",
    doc=(
        "TPC-H Q6 shape: forecast revenue change — a pure scan-filter-"
        "aggregate with every predicate pushed to the parquet scan; "
        "discount matched on exact integer basis points."
    ),
    oracle=f"""
        SELECT CAST(SUM({_CENTS} * {_DPC}) AS DOUBLE) / 1e4 AS revenue_delta,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
          AND {_DPC} BETWEEN 5 AND 7
          AND l_quantity < 24.0
    """,
)
def q_tpch_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP '1996-01-01'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP '1997-01-01'"))
            & F.expr(f"{_DPC} BETWEEN 5 AND 7")
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            (F.sum(F.expr(f"{_CENTS} * {_DPC}")).cast("double") / F.lit(1e4)).alias(
                "revenue_delta"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@register(
    "q_tpch_nation_volume",
    category="relational",
    doc=(
        "TPC-H Q7 shape: shipping volume between two nations by year; "
        "nation joins in BOTH dimension roles (supplier side, customer "
        "side) with a symmetric pair predicate; all dims broadcast, "
        "lineitem->orders is the only big join."
    ),
    oracle=f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INT) AS l_year,
               CAST(SUM({_E4}) AS DOUBLE) / 1e4 AS revenue
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3
    """,
)
def q_tpch_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP '1996-01-01'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP '1998-01-01'"))
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            F.year("l_shipdate").alias("l_year"),
            F.expr(_E4).alias("e4"),
        )
    )
    ords = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg((F.sum("e4").cast("double") / F.lit(1e4)).alias("revenue"))
    )


@register(
    "q_tpch_profit",
    category="relational",
    doc=(
        "TPC-H Q9 shape: product-line profit per supplier nation-year "
        "(cost adapted to 50% of p_retailprice — no partsupp table); "
        "part-name filter broadcast-prunes lineitem first; profit stays "
        "exact e4 BIGINT until one final division."
    ),
    oracle=f"""
        SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
               CAST(SUM({_E4}
                        - CAST(ROUND(p.p_retailprice * 100) AS BIGINT) * 50
                          * CAST(ROUND(l.l_quantity) AS BIGINT))
                    AS DOUBLE) / 1e4 AS profit
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE p.p_name LIKE '%red%'
        GROUP BY 1, 2
    """,
)
def q_tpch_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select(
            "p_partkey",
            F.expr("CAST(ROUND(p_retailprice * 100) AS BIGINT)").alias(
                "retail_cents"
            ),
        )
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        F.expr(_E4).alias("e4"),
        F.expr("CAST(ROUND(l_quantity) AS BIGINT)").alias("qty"),
    )
    ords = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(ords, li.l_orderkey == ords.o_orderkey)
        .groupBy("nation", "o_year")
        .agg(
            (
                F.sum(
                    F.col("e4") - F.col("retail_cents") * F.lit(50) * F.col("qty")
                ).cast("double")
                / F.lit(1e4)
            ).alias("profit")
        )
    )


@register(
    "q_tpch_linestatus_priority",
    category="relational",
    doc=(
        "TPC-H Q12 shape (no l_shipmode column: grouped by "
        "l_linestatus): late lineitems split into high/low order "
        "priority via CASE-summed counts — the dual-conditional-count "
        "pattern; one fact->orders join, map-side-combined agg."
    ),
    oracle="""
        SELECT l.l_linestatus,
               CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
               CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_count
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY 1
    """,
)
def q_tpch_linestatus_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP '1997-01-01'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP '1998-01-01'"))
        )
        .select("l_orderkey", "l_linestatus", "l_shipdate")
    )
    ords = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_count"),
        )
    )


@register(
    "q_tpch_custdist",
    category="relational",
    doc=(
        "TPC-H Q13 shape: customer distribution by order count — LEFT "
        "join with the filter INSIDE the join condition (zero-order "
        "customers must survive), then a histogram of the per-customer "
        "counts; both aggs map-side-combined."
    ),
    oracle="""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (
          SELECT c.c_custkey,
                 CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
          FROM customer c
          LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                            AND o.o_orderpriority <> '4-NOT SPECIFIED'
          GROUP BY 1
        )
        GROUP BY 1
    """,
)
def q_tpch_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    ords = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_cust = (
        cust.join(
            ords,
            (cust.c_custkey == ords.o_custkey)
            & (ords.o_orderpriority != "4-NOT SPECIFIED"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q_tpch_disjunctive",
    category="relational",
    doc=(
        "TPC-H Q19 shape: OR-of-ANDs join predicate (brand x size x "
        "quantity bands); part broadcast, the disjunction evaluated as "
        "the join filter — never a fan-out-then-filter; quantities "
        "integral so band edges are exact."
    ),
    oracle=f"""
        SELECT CAST(SUM({_E4}) AS DOUBLE) / 1e4 AS revenue,
               CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
               AND l.l_quantity BETWEEN 1.0 AND 11.0)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
               AND l.l_quantity BETWEEN 10.0 AND 20.0)
           OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 20.0 AND 30.0)
    """,
)
def q_tpch_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", F.expr(_E4).alias("e4")
    )
    band = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1.0, 11.0)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10.0, 20.0)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20.0, 30.0)
    )
    return (
        li.join(F.broadcast(part), (li.l_partkey == part.p_partkey) & band)
        .agg(
            (F.sum("e4").cast("double") / F.lit(1e4)).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


# ---- batch 6d: the partsupp-derived shapes (Q2 / Q11 / Q20), -------
# ---- completing a shape-equivalent for all 22 TPC-H queries --------

@register(
    "q_tpch_min_supplier",
    category="relational",
    doc=(
        "TPC-H Q2 shape (no partsupp: supply cost = lineitem revenue "
        "per part-supplier): cheapest regional supplier per STANDARD "
        "part. Lineitem is broadcast-semi-filtered by part and regional "
        "supplier BEFORE its one map-side-combined agg; the per-part "
        "argmin is a named-struct min (total order via suppkey), never "
        "a sort."
    ),
    oracle=f"""
        WITH rsupp AS (
          SELECT s.s_suppkey, s.s_name, n.n_name
          FROM supplier s
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
          WHERE r.r_name = 'ASIA'
        ),
        cost AS (
          SELECT l.l_partkey, l.l_suppkey,
                 CAST(SUM({_CENTS}) AS BIGINT) AS sum_cents
          FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey
          WHERE p.p_type = 'STANDARD'
            AND l.l_suppkey IN (SELECT s_suppkey FROM rsupp)
          GROUP BY 1, 2
        )
        SELECT c.l_partkey AS p_partkey, s.s_name, s.n_name,
               CAST(c.sum_cents AS DOUBLE) / 100.0 AS total_cost
        FROM cost c JOIN rsupp s ON c.l_suppkey = s.s_suppkey
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY c.l_partkey ORDER BY c.sum_cents, c.l_suppkey) = 1
    """,
)
def q_tpch_min_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rsupp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    pdim = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", F.expr(_CENTS).alias("cents")
    )
    cost = (
        li.join(F.broadcast(pdim), li.l_partkey == pdim.p_partkey, "left_semi")
        .join(
            F.broadcast(rsupp.select("s_suppkey")),
            li.l_suppkey == F.col("s_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("cents").alias("sum_cents"))
    )
    best = cost.groupBy("l_partkey").agg(
        F.min(F.struct("sum_cents", "l_suppkey")).alias("m")
    )
    return (
        best.select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("m.sum_cents").alias("sum_cents"),
            F.col("m.l_suppkey").alias("l_suppkey"),
        )
        .join(F.broadcast(rsupp), F.col("l_suppkey") == rsupp.s_suppkey)
        .select(
            "p_partkey",
            "s_name",
            "n_name",
            (F.col("sum_cents").cast("double") / F.lit(100.0)).alias("total_cost"),
        )
    )


@register(
    "q_tpch_important_parts",
    category="relational",
    doc=(
        "TPC-H Q11 shape: parts whose revenue from one nation's "
        "suppliers exceeds 0.1% of that nation's total — the HAVING-"
        "against-scalar-subquery pattern with an exact BIGINT "
        "cross-multiply (value*1000 > total) instead of a float "
        "threshold."
    ),
    oracle=f"""
        WITH nli AS (
          SELECT l.l_partkey, {_E4} AS e4
          FROM lineitem l
          WHERE l.l_suppkey IN (
            SELECT s_suppkey FROM supplier s
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE n.n_name = 'NATION_5')
        ),
        tot AS (SELECT CAST(SUM(e4) AS BIGINT) AS total_e4 FROM nli)
        SELECT l_partkey AS p_partkey,
               CAST(CAST(SUM(e4) AS BIGINT) AS DOUBLE) / 1e4 AS part_value
        FROM nli, tot
        GROUP BY l_partkey, tot.total_e4
        HAVING CAST(SUM(e4) AS BIGINT) * 1000 > tot.total_e4
    """,
)
def q_tpch_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    nsupp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .filter(F.col("n_name") == "NATION_5")
        .select("s_suppkey")
    )
    nli = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", F.expr(_E4).alias("e4"))
        .join(F.broadcast(nsupp), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
    )
    per_part = nli.groupBy("l_partkey").agg(F.sum("e4").alias("value_e4"))
    total = per_part.agg(F.sum("value_e4").alias("total_e4"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_e4") * 1000 > F.col("total_e4"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            (F.col("value_e4").cast("double") / F.lit(1e4)).alias("part_value"),
        )
    )


@register(
    "q_tpch_dominant_supplier",
    category="relational",
    doc=(
        "TPC-H Q20 shape: suppliers (in one region) who shipped a "
        "majority of some part's annual volume — the semi-join-on-an-"
        "aggregate-derived-set chain; dominance via exact integer "
        "cross-multiply (2*supp_qty > part_qty). The fact is touched "
        "ONCE by a map-side-combined rollup; every later shuffle and "
        "join runs on the (part, supplier, year) rollup, never the "
        "raw fact."
    ),
    oracle="""
        WITH psy AS (
          SELECT l_partkey, l_suppkey,
                 CAST(year(l_shipdate) AS INT) AS l_year,
                 CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS qty
          FROM lineitem GROUP BY 1, 2, 3
        ),
        py AS (
          SELECT l_partkey, l_year, CAST(SUM(qty) AS BIGINT) AS total_qty
          FROM psy GROUP BY 1, 2
        )
        SELECT s.s_suppkey, s.s_name,
               CAST(COUNT(*) AS BIGINT) AS n_dominant
        FROM psy JOIN py ON psy.l_partkey = py.l_partkey
                        AND psy.l_year = py.l_year
        JOIN supplier s ON psy.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE psy.qty * 2 > py.total_qty AND r.r_name = 'EUROPE'
        GROUP BY 1, 2
    """,
)
def q_tpch_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.year("l_shipdate").alias("l_year"),
        F.expr("CAST(ROUND(l_quantity) AS BIGINT)").alias("q"),
    )
    psy = li.groupBy("l_partkey", "l_suppkey", "l_year").agg(
        F.sum("q").alias("qty")
    )
    py = psy.groupBy("l_partkey", "l_year").agg(F.sum("qty").alias("total_qty"))
    esupp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").filter(
                    F.col("r_name") == "EUROPE"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name")
    )
    # shuffle_hash: at real part x supplier x year density the rollup
    # barely combines, so the (part, year) join meets two large sides
    # whose output needs no ordering — the SMJ sorts are pure waste
    # (measured 1.7s -> ~1.0s at sf0.1)
    return (
        psy.join(py.hint("shuffle_hash"), ["l_partkey", "l_year"])
        .filter(F.col("qty") * 2 > F.col("total_qty"))
        .join(F.broadcast(esupp), psy.l_suppkey == esupp.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("n_dominant"))
    )
