"""Revenue-operations suite (round 8, batch 18):

* q_attribution_position — position-based (U-shaped 40/20/40)
  multi-touch attribution, the q_attribution sibling that distributes
  CREDIT instead of identifying touches: per user the non-purchase
  touch path gets 40% of conversion value at the first touch, 40% at
  the last, 20% split across the middle. The whole credit is ONE
  exact division per (user, channel) row over a common integer
  denominator — credit = v * (4*k_mid*[first] + 4*k_mid*[last]
  + 2*m_c) / (10*k_mid) for paths of length >= 3, with CASE-exact
  k = 1 (100%) and k = 2 (50/50) degenerate paths. Credits are
  emitted at the (user, channel) ledger grain: summing the IEEE
  doubles across users would be engine-order-unspecified (the house
  no-double-sums rule), and the ledger is what a marketing warehouse
  stores anyway. Identity Σ_channel credit = v is property-tested.
* q_ar_aging — accounts-receivable aging: open (non-'F') orders
  bucketed by days outstanding against the corpus max order date
  (1-row broadcast reference, the house constant-join pattern),
  per-segment conditional BIGINT sums for 0-30/31-60/61-90/90+ and
  one overdue-share division. The classic finance rollup: one fact
  scan, dims broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table

_VC = "CAST(ROUND(value * 100) AS BIGINT)"
_OC = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"

# Shared credit expression: one division, common denominator 10*k_mid.
_CREDIT = """
    CASE WHEN k = 1 THEN CAST(v AS DOUBLE)
         WHEN k = 2 THEN CAST(v * (5 * is_first + 5 * is_last) AS DOUBLE)
                         / 10
         ELSE CAST(v * (4 * (k - 2) * is_first + 4 * (k - 2) * is_last
                        + 2 * m_c) AS DOUBLE) / (10 * (k - 2))
    END
"""


@register(
    "q_attribution_position",
    category="temporal",
    cost=1,
    doc=(
        "U-shaped (40/20/40) multi-touch attribution at the "
        "(user, channel) ledger grain: first/last touch via min/max "
        "struct over the (ts, event_id) total order, middle-touch "
        "counts per channel, conversion cents distributed by ONE exact "
        "division over the common denominator 10*(k-2); CASE-exact "
        "k=1/k=2 paths. Sum over channels provably equals the user's "
        "conversion value."
    ),
    oracle=f"""
        WITH t AS (
          SELECT user_id, event_type,
                 {{'ts': ts, 'eid': event_id, 'etype': event_type}} AS s
          FROM events WHERE event_type != 'purchase'
        ), u AS (
          SELECT user_id,
                 CAST(COUNT(*) AS BIGINT) AS k,
                 (min(s)).etype AS f,
                 (max(s)).etype AS l
          FROM t GROUP BY user_id
        ), v AS (
          SELECT user_id,
                 CAST(SUM(CASE WHEN event_type = 'purchase'
                               THEN {_VC} ELSE 0 END) AS BIGINT) AS v
          FROM events GROUP BY user_id
        ), c AS (
          SELECT user_id, event_type AS channel,
                 CAST(COUNT(*) AS BIGINT) AS n_c
          FROM t GROUP BY user_id, event_type
        ), g AS (
          SELECT c.user_id, c.channel, c.n_c, u.k, v.v,
                 CASE WHEN c.channel = u.f THEN 1 ELSE 0 END AS is_first,
                 CASE WHEN c.channel = u.l THEN 1 ELSE 0 END AS is_last,
                 c.n_c - CASE WHEN c.channel = u.f THEN 1 ELSE 0 END
                       - CASE WHEN c.channel = u.l THEN 1 ELSE 0 END
                     AS m_c
          FROM c JOIN u ON c.user_id = u.user_id
                 JOIN v ON c.user_id = v.user_id
        )
        SELECT user_id, channel, n_c AS n_touches, k AS path_len, v
                   AS conv_cents,
               {_CREDIT} AS credit_cents
        FROM g
    """,
)
def q_attribution_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    touches = events.filter(F.col("event_type") != "purchase").select(
        "user_id",
        "event_type",
        F.struct(
            F.col("ts"),
            F.col("event_id").alias("eid"),
            F.col("event_type").alias("etype"),
        ).alias("s"),
    )
    u = touches.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("k"),
        F.min("s").getField("etype").alias("f"),
        F.max("s").getField("etype").alias("l"),
    )
    v = events.groupBy("user_id").agg(
        F.sum(
            F.expr(f"CASE WHEN event_type = 'purchase' THEN {_VC} ELSE 0 END")
        )
        .cast("bigint")
        .alias("v")
    )
    c = touches.groupBy(
        "user_id", F.col("event_type").alias("channel")
    ).agg(F.count("*").cast("bigint").alias("n_c"))
    g = (
        c.join(u, "user_id")
        .join(v, "user_id")
        .select(
            "user_id",
            "channel",
            "n_c",
            "k",
            "v",
            F.expr("CASE WHEN channel = f THEN 1 ELSE 0 END").alias(
                "is_first"
            ),
            F.expr("CASE WHEN channel = l THEN 1 ELSE 0 END").alias(
                "is_last"
            ),
            F.expr(
                "n_c - CASE WHEN channel = f THEN 1 ELSE 0 END"
                " - CASE WHEN channel = l THEN 1 ELSE 0 END"
            ).alias("m_c"),
        )
    )
    return g.select(
        "user_id",
        "channel",
        F.col("n_c").alias("n_touches"),
        F.col("k").alias("path_len"),
        F.col("v").alias("conv_cents"),
        F.expr(_CREDIT).alias("credit_cents"),
    )


_BUCKET_SUM = (
    "CAST(SUM(CASE WHEN age {cond} THEN c ELSE 0 END) AS BIGINT)"
)


@register(
    "q_ar_aging",
    category="analytics",
    cost=1,
    doc=(
        "Accounts-receivable aging per market segment: open (non-'F') "
        "orders bucketed by days outstanding vs the corpus max order "
        "date (1-row broadcast reference), conditional BIGINT cents "
        "sums for 0-30/31-60/61-90/90+, overdue share as one division."
    ),
    oracle=f"""
        WITH ref AS (SELECT MAX(o_orderdate) AS ref_d FROM orders),
        a AS (
          SELECT c.c_mktsegment,
                 date_diff('day', o.o_orderdate, ref.ref_d) AS age,
                 {_OC} AS c
          FROM orders o
          JOIN customer c ON o.o_custkey = c.c_custkey
          CROSS JOIN ref
          WHERE o.o_orderstatus != 'F'
        )
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_open,
               {_BUCKET_SUM.format(cond="<= 30")} AS due_0_30,
               {_BUCKET_SUM.format(cond="BETWEEN 31 AND 60")} AS due_31_60,
               {_BUCKET_SUM.format(cond="BETWEEN 61 AND 90")} AS due_61_90,
               {_BUCKET_SUM.format(cond="> 90")} AS due_over_90,
               CAST({_BUCKET_SUM.format(cond="> 90")} AS DOUBLE)
                   / CAST(SUM(c) AS BIGINT) AS overdue_share
        FROM a GROUP BY c_mktsegment
    """,
)
def q_ar_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") != "F"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    ref = load_table(spark, sf_dir, "orders").agg(
        F.max("o_orderdate").alias("ref_d")
    )
    a = (
        orders.join(
            cust, orders.o_custkey == cust.c_custkey
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "c_mktsegment",
            F.datediff("ref_d", "o_orderdate").cast("bigint").alias("age"),
            F.expr(_OC).alias("c"),
        )
    )
    return a.groupBy("c_mktsegment").agg(
        F.count("*").cast("bigint").alias("n_open"),
        F.expr(_BUCKET_SUM.format(cond="<= 30")).alias("due_0_30"),
        F.expr(_BUCKET_SUM.format(cond="BETWEEN 31 AND 60")).alias(
            "due_31_60"
        ),
        F.expr(_BUCKET_SUM.format(cond="BETWEEN 61 AND 90")).alias(
            "due_61_90"
        ),
        F.expr(_BUCKET_SUM.format(cond="> 90")).alias("due_over_90"),
        F.expr(
            f"CAST({_BUCKET_SUM.format(cond='> 90')} AS DOUBLE)"
            " / CAST(SUM(c) AS BIGINT)"
        ).alias("overdue_share"),
    )
