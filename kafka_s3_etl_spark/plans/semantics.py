"""SQL-semantics breadth (round 7, batch 7g): the three-valued-logic
corners users actually hit, each with the plan Spark should pick.

* q_join_nullsafe — null-safe equality join (``<=>`` / IS NOT DISTINCT
  FROM): the NULL group participates like any other key. Spark hashes
  null-safe keys like equi-keys, so this stays a hash join — no
  degradation to a nested loop (plan-pinned).
* q_not_in_null — NOT IN against a NULLABLE subquery column: the
  three-valued trap (one NULL in the list empties the result) that
  Spark must execute as a null-aware anti join (NAAJ, plan-pinned)
  rather than a per-row scan of the list. The subquery column is
  nullable by type but never NULL at runtime, so the result is the
  honest anti-join set on both engines.
* q_array_algebra — higher-order array functions done the house way:
  ONE split + ONE aggregate() pass with a struct accumulator computes
  word count, long-word count, and total characters. HOF lambdas get
  no common-subexpression elimination and CollapseProject re-inlines
  pre-projections (CLAUDE.md), so every metric rides a single lambda
  over a single array evaluation instead of three re-evaluated
  transforms.

Exactness: counts are BIGINT; the one share division is exact-int /
exact-int, IEEE-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table


@register(
    "q_join_nullsafe",
    category="relational",
    doc=(
        "Null-safe equality join: per-(key, user-bucket) counts joined "
        "to per-key totals on k <=> k where k = NULLIF(event_type, "
        "'error') — the NULL group joins like any key (no dropped "
        "rows), and the join stays a hash join because null-safe keys "
        "hash like equi-keys (plan-pinned). share = exact-int/exact-int."
    ),
    oracle="""
        WITH l AS (
          SELECT NULLIF(event_type, 'error') AS k,
                 user_id % 10 AS b, COUNT(*) AS n
          FROM events GROUP BY 1, 2
        ), r AS (
          SELECT NULLIF(event_type, 'error') AS k, COUNT(*) AS t
          FROM events GROUP BY 1
        )
        SELECT l.k, CAST(l.b AS BIGINT) AS b,
               CAST(l.n AS BIGINT) AS n, CAST(r.t AS BIGINT) AS t,
               CAST(l.n AS DOUBLE) / r.t AS share
        FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k
    """,
)
def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.nullif("event_type", F.lit("error")).alias("k"),
        (F.col("user_id") % 10).alias("b"),
    )
    left = ev.groupBy("k", "b").agg(F.count("*").alias("n"))
    right = (
        ev.groupBy("k")
        .agg(F.count("*").alias("t"))
        .withColumnRenamed("k", "rk")
    )
    return (
        left.join(F.broadcast(right), left.k.eqNullSafe(F.col("rk")))
        .select(
            "k",
            "b",
            "n",
            "t",
            (F.col("n").cast("double") / F.col("t")).alias("share"),
        )
    )


@register(
    "q_not_in_null",
    category="relational",
    doc=(
        "NOT IN over a NULLABLE subquery column — the three-valued "
        "corner where one NULL empties the result. Spark must plan a "
        "null-aware anti join (NAAJ, pinned), not a per-row IN-list "
        "probe; the column is nullable by type (NULLIF) but never NULL "
        "at runtime, so both engines emit the honest anti-join set: "
        "order totals of customers outside the BUILDING segment."
    ),
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100 AS total_value
        FROM orders
        WHERE o_custkey NOT IN (
          SELECT NULLIF(c_custkey, -1) FROM customer
          WHERE c_mktsegment = 'BUILDING'
        )
        GROUP BY o_orderpriority
    """,
)
def q_not_in_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "naaj_orders"
    )
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "naaj_customer"
    )
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                    AS DOUBLE) / 100 AS total_value
        FROM naaj_orders
        WHERE o_custkey NOT IN (
          SELECT NULLIF(c_custkey, -1) FROM naaj_customer
          WHERE c_mktsegment = 'BUILDING'
        )
        GROUP BY o_orderpriority
        """
    )


@register(
    "q_array_algebra",
    category="llm",
    doc=(
        "Single-pass array algebra: ONE split + ONE aggregate() with a "
        "struct accumulator yields word count, long-word (>6 chars) "
        "count, and total characters per document — HOFs get no CSE "
        "and CollapseProject re-inlines projections, so all metrics "
        "share one lambda over one array evaluation (the house "
        "repetition_score lesson, applied)."
    ),
    oracle="""
        SELECT doc_id,
               CAST(len(split(text, ' ')) AS BIGINT) AS n_words,
               CAST(len(list_filter(split(text, ' '),
                                    w -> length(w) > 6)) AS BIGINT)
                   AS n_long,
               CAST(list_sum(list_transform(split(text, ' '),
                                            w -> length(w))) AS BIGINT)
                   AS n_chars
        FROM documents
    """,
)
def q_array_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            """
            aggregate(
              split(text, ' '),
              named_struct('nw', CAST(0 AS BIGINT),
                           'nl', CAST(0 AS BIGINT),
                           'nc', CAST(0 AS BIGINT)),
              (acc, w) -> named_struct(
                'nw', acc.nw + 1L,
                'nl', acc.nl + IF(length(w) > 6, 1L, 0L),
                'nc', acc.nc + length(w))
            ) AS m
            """
        ).alias("m"),
    ).select(
        "doc_id",
        F.col("m.nw").alias("n_words"),
        F.col("m.nl").alias("n_long"),
        F.col("m.nc").alias("n_chars"),
    )
