"""Distribution & concentration statistics (round 7, batch 8a): the
inequality / concentration measures an analytics engine reports over
revenue-like columns — Gini, Pareto cutoff, Herfindahl, and a
two-sample Kolmogorov-Smirnov test.

All four reduce to the house exact-arithmetic pattern
(plans/analytics.py): accumulate BIGINT/DECIMAL sums of cent-quantized
values (o_totalprice is cent-quantized by the generator, so
``ROUND(x * 100)`` is exact on both engines), then combine them in ONE
shared double expression interpolated verbatim into both the Spark
select and the DuckDB oracle — identical expression trees, identical
IEEE results, driver-hash-exact floats.

Rank-dependent measures (Gini, Pareto, KS) need a TOTAL order so both
engines rank identically: (cents, custkey) for per-customer rows, and
for KS the per-(group, value) rollup is unique by construction.

Scale notes (100 TB):
* every entry first collapses the fact table to a per-customer /
  per-(group, value) rollup — ONE map-side-combinable shuffle — so the
  window phase ranks the 1000x-smaller rollup, never the fact;
* the rank windows partition by a LOW-cardinality group (5 market
  segments), so each segment's rollup sorts in one task. That is fine
  while |customers per segment| fits a task (~10^8 rows); past that the
  exact rank can be two-phased (value-histogram partial ranks per
  partition, merged prefix offsets) without changing the formulas —
  the sums the formulas consume are rank-weighted, not order-sensitive
  beyond the total order itself.

Overflow bounds (documented per entry, same convention as
q_stats_moments): rank * cents <= n_seg * max_spend_cents; at sf10
(~3e5 customers/segment, ~2e7 cents spend) the Gini rank-weighted sum
is ~1e18 — inside BIGINT; Herfindahl squares cents so it accumulates
in DECIMAL(38,0) instead (exact to ~1e38).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table


# Per-customer lifetime spend in exact cents, with the customer's
# market segment — the shared rollup all three concentration measures
# rank. One shuffle on the customer key; map-side combined.
_SPEND_SQL = """
        WITH spend AS (
          SELECT c.c_mktsegment AS seg, o.o_custkey AS k,
                 CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                      AS BIGINT) AS c
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          GROUP BY 1, 2
        )
"""


def _spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == cust.c_custkey,
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_custkey").alias("k"),
        )
        .agg(
            F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)"))
            .cast("bigint")
            .alias("c")
        )
    )


# Gini from the rank-weighted sum: G = (2*sum(i*x_i) - (n+1)*sum(x))
# / (n * sum(x)) over values sorted ascending with rank i in 1..n.
# Shared verbatim (see module doc).
_GINI = (
    "CAST(2 * swx - (n + 1) * sx AS DOUBLE)"
    " / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))"
)


@register(
    "q_gini",
    category="statistics",
    cost=1,
    doc=(
        "Per-segment Gini coefficient of customer lifetime spend: "
        "row_number over the (cents, custkey) total order, exact "
        "BIGINT rank-weighted sum, one shared double combination — "
        "hash-exact across engines. Rank ties resolve identically on "
        "both sides because the order is total."
    ),
    oracle=_SPEND_SQL
    + f"""
        , r AS (
          SELECT seg, c,
                 CAST(ROW_NUMBER() OVER (PARTITION BY seg ORDER BY c, k)
                      AS BIGINT) AS i
          FROM spend
        ), s AS (
          SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(c) AS BIGINT) AS sx,
                 CAST(SUM(i * c) AS BIGINT) AS swx
          FROM r GROUP BY seg
        )
        SELECT seg AS c_mktsegment, n AS n_customers,
               {_GINI} AS gini
        FROM s
    """,
)
def q_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("seg").orderBy("c", "k")
    s = (
        _spend(spark, sf_dir)
        .withColumn("i", F.row_number().over(w).cast("bigint"))
        .groupBy("seg")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("c").alias("sx"),
            F.sum(F.expr("i * c")).alias("swx"),
        )
    )
    return s.select(
        F.col("seg").alias("c_mktsegment"),
        F.col("n").alias("n_customers"),
        F.expr(_GINI).alias("gini"),
    )


@register(
    "q_pareto_cutoff",
    category="statistics",
    cost=1,
    doc=(
        "Pareto 80/20 cutoff per segment: the smallest number of "
        "top-spend customers whose running exact-cents sum covers 80% "
        "of segment revenue — the threshold test is the integer "
        "cross-multiply cum*5 >= total*4 (no float compare), the share "
        "is one division of exact BIGINTs."
    ),
    oracle=_SPEND_SQL
    + """
        , r AS (
          SELECT seg,
                 CAST(ROW_NUMBER() OVER
                      (PARTITION BY seg ORDER BY c DESC, k) AS BIGINT)
                     AS rk,
                 CAST(SUM(c) OVER
                      (PARTITION BY seg ORDER BY c DESC, k
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
                 CAST(SUM(c) OVER (PARTITION BY seg) AS BIGINT) AS tot,
                 CAST(COUNT(*) OVER (PARTITION BY seg) AS BIGINT) AS n
          FROM spend
        )
        SELECT c_mktsegment, n_customers, top80_n,
               CAST(top80_n AS DOUBLE) / n_customers AS top80_share
        FROM (
          SELECT seg AS c_mktsegment,
                 CAST(MAX(n) AS BIGINT) AS n_customers,
                 CAST(MIN(rk) AS BIGINT) AS top80_n
          FROM r WHERE cum * 5 >= tot * 4
          GROUP BY seg
        )
    """,
)
def q_pareto_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    order = [F.col("c").desc(), F.col("k")]
    wp = Window.partitionBy("seg")
    r = _spend(spark, sf_dir).select(
        "seg",
        F.row_number().over(wp.orderBy(*order)).cast("bigint").alias("rk"),
        F.sum("c")
        .over(wp.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cum"),
        F.sum("c").over(wp).cast("bigint").alias("tot"),
        F.count("*").over(wp).cast("bigint").alias("n"),
    )
    agg = (
        r.filter(F.expr("cum * 5 >= tot * 4"))
        .groupBy(F.col("seg").alias("c_mktsegment"))
        .agg(
            F.max("n").cast("bigint").alias("n_customers"),
            F.min("rk").cast("bigint").alias("top80_n"),
        )
    )
    return agg.select(
        "c_mktsegment",
        "n_customers",
        "top80_n",
        F.expr("CAST(top80_n AS DOUBLE) / n_customers").alias("top80_share"),
    )


# HHI = sum(share_i^2) = sum(c_i^2) / (sum c_i)^2; the squared-cents
# sum rides DECIMAL(38,0) (cents^2 ~ 4e14/customer overflows BIGINT
# past ~2e4 customers/segment). Shared verbatim.
_HHI = "CAST(ssq AS DOUBLE) / (CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"


@register(
    "q_herfindahl",
    category="statistics",
    cost=1,
    doc=(
        "Herfindahl-Hirschman concentration index of customer spend "
        "per segment, plus the effective number of customers (1/HHI): "
        "exact DECIMAL(38,0) sum of squared cents over one aggregation "
        "(no rank window at all), one shared double combination."
    ),
    oracle=_SPEND_SQL
    + f"""
        , s AS (
          SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(c) AS BIGINT) AS sx,
                 SUM(CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0)))
                     AS ssq
          FROM spend GROUP BY seg
        )
        SELECT seg AS c_mktsegment, n AS n_customers,
               {_HHI} AS hhi,
               1.0 / ({_HHI}) AS effective_n
        FROM s
    """,
)
def q_herfindahl(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _spend(spark, sf_dir).groupBy("seg").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("c").cast("bigint").alias("sx"),
        F.sum(
            F.expr(
                "CAST(c AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))"
            )
        ).alias("ssq"),
    )
    return s.select(
        F.col("seg").alias("c_mktsegment"),
        F.col("n").alias("n_customers"),
        F.expr(_HHI).alias("hhi"),
        F.expr(f"1.0 / ({_HHI})").alias("effective_n"),
    )


@register(
    "q_ks_test",
    category="statistics",
    cost=1,
    doc=(
        "Two-sample Kolmogorov-Smirnov statistic per order priority, "
        "comparing open ('O') vs filled ('F') order-value "
        "distributions: D = max|F1(v) - F2(v)| evaluated as the exact "
        "integer max|c1*n2 - c2*n1| over per-value cumulative counts, "
        "divided once. ECDF steps land on the distinct-cents rollup "
        "(unique per (priority, cents)), so running sums are "
        "order-deterministic without a tiebreaker."
    ),
    oracle="""
        WITH v AS (
          SELECT o_orderpriority AS pri,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
                 CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                      AS BIGINT) AS f1,
                 CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                      AS BIGINT) AS f2
          FROM orders WHERE o_orderstatus IN ('O', 'F')
          GROUP BY 1, 2
        ), r AS (
          SELECT pri,
                 SUM(f1) OVER (PARTITION BY pri ORDER BY c
                               ROWS UNBOUNDED PRECEDING) AS c1,
                 SUM(f2) OVER (PARTITION BY pri ORDER BY c
                               ROWS UNBOUNDED PRECEDING) AS c2,
                 SUM(f1) OVER (PARTITION BY pri) AS n1,
                 SUM(f2) OVER (PARTITION BY pri) AS n2
          FROM v
        )
        SELECT o_orderpriority, n_open, n_filled, d_num,
               CAST(d_num AS DOUBLE)
                   / (CAST(n_open AS DOUBLE) * CAST(n_filled AS DOUBLE))
                   AS ks_stat
        FROM (
          SELECT pri AS o_orderpriority,
                 CAST(MAX(n1) AS BIGINT) AS n_open,
                 CAST(MAX(n2) AS BIGINT) AS n_filled,
                 CAST(MAX(ABS(c1 * n2 - c2 * n1)) AS BIGINT) AS d_num
          FROM r GROUP BY pri
        )
    """,
)
def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    v = (
        orders.filter(F.col("o_orderstatus").isin("O", "F"))
        .groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("c"),
        )
        .agg(
            F.sum(F.expr("CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("f1"),
            F.sum(F.expr("CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("f2"),
        )
    )
    wp = Window.partitionBy("pri")
    wrun = wp.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    r = v.select(
        "pri",
        F.sum("f1").over(wrun).alias("c1"),
        F.sum("f2").over(wrun).alias("c2"),
        F.sum("f1").over(wp).alias("n1"),
        F.sum("f2").over(wp).alias("n2"),
    )
    agg = r.groupBy(F.col("pri").alias("o_orderpriority")).agg(
        F.max("n1").cast("bigint").alias("n_open"),
        F.max("n2").cast("bigint").alias("n_filled"),
        F.max(F.expr("ABS(c1 * n2 - c2 * n1)")).cast("bigint").alias("d_num"),
    )
    return agg.select(
        "o_orderpriority",
        "n_open",
        "n_filled",
        "d_num",
        F.expr(
            "CAST(d_num AS DOUBLE)"
            " / (CAST(n_open AS DOUBLE) * CAST(n_filled AS DOUBLE))"
        ).alias("ks_stat"),
    )


# ---------------------------------------------------- round 10, batch 52

_PSI_SPLIT = "2024-07-01 00:00:00"  # H1 2024 = baseline, H2 = current


@register(
    "q_drift_psi",
    category="statistics",
    cost=1,
    doc=(
        "Population Stability Index per event_type between the H1 and "
        "H2 2024 event-value distributions — the drift monitor a "
        "production feature pipeline runs between snapshots. Unit-wide "
        "integer value bins, Laplace-smoothed so single-sided bins "
        "stay finite; the log-ratio is quantized to integer micro-nats "
        "ONCE per bin (the q_lm_score discipline — the only float "
        "hazard is a quantization boundary within ~1 ulp of a "
        "cross-engine ln difference), and PSI accumulates as TWO "
        "linear BIGINT sums sa=SUM((ca+1)*lq), sb=SUM((cb+1)*lq) "
        "combined at the end by the fixed-order IEEE chain "
        "(sa/Da - sb/Db)/1e6 — algebraically equal to the r10 "
        "quadratic form SUM(dnum*lq)/(1e6*Da*Db) but with BIGINT "
        "products bounded by corpus_size * max|lq| (~N*6e7: safe to "
        "~1e11 events per type) instead of the square of the corpus "
        "(the r10 form overflowed once per-type counts reached ~1e9 — "
        "ADVICE r10). Two aggregations with map-side combine, no "
        "window over the corpus, no Python."
    ),
    oracle=f"""
        WITH b AS (
          SELECT event_type AS t,
                 CAST(FLOOR(value) AS BIGINT) AS bin,
                 CAST(SUM(CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}'
                               THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                 CAST(SUM(CASE WHEN ts >= TIMESTAMP '{_PSI_SPLIT}'
                               THEN 1 ELSE 0 END) AS BIGINT) AS cb
          FROM events GROUP BY 1, 2
        ),
        tot AS (
          SELECT t,
                 CAST(SUM(ca) AS BIGINT) AS na,
                 CAST(SUM(cb) AS BIGINT) AS nb,
                 CAST(COUNT(*) AS BIGINT) AS nbins
          FROM b GROUP BY t
        ),
        terms AS (
          SELECT b.t,
                 b.ca, b.cb,
                 CAST(ROUND(ln(
                     (CAST(b.ca + 1 AS DOUBLE)
                        * CAST(tot.nb + tot.nbins AS DOUBLE))
                     / (CAST(b.cb + 1 AS DOUBLE)
                          * CAST(tot.na + tot.nbins AS DOUBLE))
                   ) * 1000000) AS BIGINT) AS lq
          FROM b JOIN tot USING (t)
        )
        SELECT terms.t AS event_type,
               CAST(MAX(tot.na) AS BIGINT) AS n_baseline,
               CAST(MAX(tot.nb) AS BIGINT) AS n_current,
               CAST(MAX(tot.nbins) AS BIGINT) AS n_bins,
               CAST(SUM((terms.ca + 1) * terms.lq) AS BIGINT) AS psi_a_num,
               CAST(SUM((terms.cb + 1) * terms.lq) AS BIGINT) AS psi_b_num,
               (CAST(CAST(SUM((terms.ca + 1) * terms.lq) AS BIGINT)
                     AS DOUBLE)
                  / CAST(MAX(tot.na + tot.nbins) AS DOUBLE)
                - CAST(CAST(SUM((terms.cb + 1) * terms.lq) AS BIGINT)
                       AS DOUBLE)
                    / CAST(MAX(tot.nb + tot.nbins) AS DOUBLE))
                 / 1e6 AS psi
        FROM terms JOIN tot ON tot.t = terms.t
        GROUP BY terms.t
    """,
)
def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # The bin rollup feeds BOTH the totals re-agg and the term join:
    # materialize it once (types x unit-bins rows — tiny) so the
    # totals branch never re-scans the corpus (the q_collocations_lift
    # lesson).
    b = events.groupBy(
        F.col("event_type").alias("t"),
        F.expr("CAST(FLOOR(value) AS BIGINT)").alias("bin"),
    ).agg(
        F.sum(
            F.expr(f"CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT}' "
                   "THEN 1 ELSE 0 END")
        ).cast("bigint").alias("ca"),
        F.sum(
            F.expr(f"CASE WHEN ts >= TIMESTAMP '{_PSI_SPLIT}' "
                   "THEN 1 ELSE 0 END")
        ).cast("bigint").alias("cb"),
    ).localCheckpoint()
    tot = b.groupBy("t").agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
        F.count("*").alias("nbins"),
    )
    terms = b.join(F.broadcast(tot), "t").select(
        "t",
        "ca",
        "cb",
        F.expr(
            "CAST(ROUND(ln((CAST(ca + 1 AS DOUBLE)"
            " * CAST(nb + nbins AS DOUBLE))"
            " / (CAST(cb + 1 AS DOUBLE)"
            " * CAST(na + nbins AS DOUBLE))) * 1000000) AS BIGINT)"
        ).alias("lq"),
        "na",
        "nb",
        "nbins",
    )
    return (
        terms.groupBy(F.col("t").alias("event_type"))
        .agg(
            F.max("na").cast("bigint").alias("n_baseline"),
            F.max("nb").cast("bigint").alias("n_current"),
            F.max("nbins").cast("bigint").alias("n_bins"),
            F.sum(F.expr("(ca + 1) * lq")).cast("bigint").alias("psi_a_num"),
            F.sum(F.expr("(cb + 1) * lq")).cast("bigint").alias("psi_b_num"),
            F.max(F.expr("na + nbins")).alias("_da"),
            F.max(F.expr("nb + nbins")).alias("_db"),
        )
        .select(
            "event_type",
            "n_baseline",
            "n_current",
            "n_bins",
            "psi_a_num",
            "psi_b_num",
            F.expr(
                "(CAST(psi_a_num AS DOUBLE) / CAST(_da AS DOUBLE)"
                " - CAST(psi_b_num AS DOUBLE) / CAST(_db AS DOUBLE))"
                " / 1e6"
            ).alias("psi"),
        )
    )
