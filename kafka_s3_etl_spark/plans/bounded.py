"""Bounded-memory / sketch-prefilter scale patterns (round 8, batch 9
— r7 verdict #7's "optional depth, in order of real-user frequency"):

* q_decontaminate_bloom — the 100 TB decontamination shape: a Bloom
  filter over the training split's shingle hashes (built as a
  broadcastable (word, bits) bitmap table with one map-side-combined
  bit_or aggregation — Spark's bloom_filter_agg/might_contain are
  Catalyst-internal, not SQL-callable) prefilters the eval split's
  shingles before the exact verify semi-join. No false negatives, so
  the result is IDENTICAL to q_decontaminate and shares its oracle;
  false positives only waste verify work.
* q_approx_topk — Count-Min + top-k heap, the ONE-PASS bounded-state
  frequency regime Misra-Gries' two-pass exact pattern (q_heavy_
  hitters) can't serve: per-task state is depth*width counters
  regardless of the token domain, shards merge by addition, estimates
  overestimate by <= eps*n. Rows-only by design (sketch-valued
  output); the overestimate/mergeability/recall properties are pinned
  in tests/test_sketch_ops.py.
* q_percentile_disc — exact DISCRETE percentiles (p25/p50/p75 of
  order value cents per priority) via rank math over a total order:
  the value at row ceil(p*n) — integer arithmetic end-to-end
  ((n+3) DIV 4 etc.), BIGINT cents out, hash-exact.
* q_median_exact — per-segment interpolated median as ONE division of
  exact BIGINTs: sum of the two middle cents (the same row twice for
  odd n) divided by 2.0 — engine-exact doubles, completing the
  quantile matrix (approx: q_agg_approx_quantile; ntile bins:
  q_quantile_bins; discrete: q_percentile_disc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_s3_etl_spark.operators.dedup import decontaminate_bloom
from kafka_s3_etl_spark.operators.sketch import countmin_topk
from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table

# Shared with q_decontaminate (plans/llm.py): the bloom prefilter has
# no false negatives, so both entries must produce the same rows.
_DECONTAMINATE_ORACLE = """
        WITH sh AS (
          SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            UNNEST(list_transform(range(len(w) - 7), i ->
              w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4] || ' ' ||
              w[i+5] || ' ' || w[i+6] || ' ' || w[i+7] || ' ' || w[i+8])) AS t(s)
          WHERE len(w) >= 8
        )
        SELECT d.doc_id,
               EXISTS (SELECT 1 FROM sh e JOIN sh t
                       ON t.s = e.s AND t.doc_id % 10 != 0
                       WHERE e.doc_id = d.doc_id) AS contaminated
        FROM documents d WHERE d.doc_id % 10 = 0
    """


@register(
    "q_decontaminate_bloom",
    category="dedup",
    cost=1,
    doc=(
        "Bloom-prefiltered decontamination: the training split's "
        "shingle hashes build a broadcastable bitmap table (map-side "
        "bit_or), eval shingles keep only all-k-bits-set candidates, "
        "and the exact semi-join verifies the survivors — identical "
        "output to q_decontaminate (blooms have no false negatives), "
        "but at 100 TB the broadcast bitmap kills most non-matching "
        "eval shingles BEFORE the big shuffle."
    ),
    oracle=_DECONTAMINATE_ORACLE,
)
def q_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decontaminate_bloom(load_table(spark, sf_dir, "documents"))


@register(
    "q_approx_topk",
    category="sketch",
    cost=1,
    doc=(
        "Approximate top-20 tokens by Count-Min estimate: one corpus "
        "pass into a depth*width counter table (map-side combined, "
        "domain-independent state), broadcast-probe by the distinct "
        "tokens, min over depth cells, TakeOrdered top-k with a "
        "deterministic (est DESC, token) tie-break. Rows-only: "
        "estimates are sketch-valued (always >= truth); "
        "overestimate/mergeability/recall are property-tested."
    ),
)
def q_approx_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    tokens = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("token")
    )
    return countmin_topk(tokens, "token", k=20)


@register(
    "q_percentile_disc",
    category="statistics",
    cost=1,
    doc=(
        "Exact discrete percentiles (p25/p50/p75) of order value cents "
        "per priority: row_number over the (cents, o_orderkey) total "
        "order, the value at row ceil(p*n) picked with pure integer "
        "arithmetic ((n+3) DIV 4, (n+1) DIV 2, (3n+3) DIV 4) — BIGINT "
        "in, BIGINT out, hash-exact; one window over the fact, one "
        "rollup."
    ),
    oracle="""
        WITH r AS (
          SELECT o_orderpriority,
                 CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
                 o_orderkey
          FROM orders
        ), s AS (
          SELECT o_orderpriority, c,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                    ORDER BY c, o_orderkey) AS rn,
                 COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
          FROM r
        )
        SELECT o_orderpriority,
               CAST(MAX(n) AS BIGINT) AS n_orders,
               MAX(CASE WHEN rn = (n + 3) // 4 THEN c END) AS p25_cents,
               MAX(CASE WHEN rn = (n + 1) // 2 THEN c END) AS p50_cents,
               MAX(CASE WHEN rn = (3 * n + 3) // 4 THEN c END) AS p75_cents
        FROM s GROUP BY o_orderpriority
    """,
)
def q_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    r = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("c"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_orderpriority")
    s = r.select(
        "o_orderpriority",
        "c",
        F.row_number().over(w.orderBy("c", "o_orderkey")).alias("rn"),
        F.count("*").over(w).alias("n"),
    )
    return s.groupBy("o_orderpriority").agg(
        F.max("n").cast("bigint").alias("n_orders"),
        F.max(F.expr("CASE WHEN rn = (n + 3) DIV 4 THEN c END")).alias(
            "p25_cents"
        ),
        F.max(F.expr("CASE WHEN rn = (n + 1) DIV 2 THEN c END")).alias(
            "p50_cents"
        ),
        F.max(F.expr("CASE WHEN rn = (3 * n + 3) DIV 4 THEN c END")).alias(
            "p75_cents"
        ),
    )


@register(
    "q_median_exact",
    category="statistics",
    cost=1,
    doc=(
        "Per-segment exact interpolated median of customer balances: "
        "sum of the two middle cents under the (cents, custkey) total "
        "order (the middle row counted twice when n is odd), divided "
        "ONCE by 2.0 — a single division of exact BIGINTs, bit-exact "
        "across engines; the built-in median() would interpolate in "
        "floats on each engine's own summation order."
    ),
    oracle="""
        WITH r AS (
          SELECT c_mktsegment,
                 CAST(ROUND(c_acctbal * 100) AS BIGINT) AS c,
                 c_custkey
          FROM customer
        ), s AS (
          SELECT c_mktsegment, c,
                 ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                    ORDER BY c, c_custkey) AS rn,
                 COUNT(*) OVER (PARTITION BY c_mktsegment) AS n
          FROM r
        )
        SELECT c_mktsegment,
               CAST(MAX(n) AS BIGINT) AS n_customers,
               CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN c ELSE 0 END)
                    + SUM(CASE WHEN rn = (n + 2) // 2 THEN c ELSE 0 END)
                    AS BIGINT) AS mid2_cents,
               (SUM(CASE WHEN rn = (n + 1) // 2 THEN c ELSE 0 END)
                + SUM(CASE WHEN rn = (n + 2) // 2 THEN c ELSE 0 END))
                   / 2.0 / 100.0 AS median_balance
        FROM s GROUP BY c_mktsegment
    """,
)
def q_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    r = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        F.expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)").alias("c"),
        "c_custkey",
    )
    w = Window.partitionBy("c_mktsegment")
    s = r.select(
        "c_mktsegment",
        "c",
        F.row_number().over(w.orderBy("c", "c_custkey")).alias("rn"),
        F.count("*").over(w).alias("n"),
    )
    return s.groupBy("c_mktsegment").agg(
        F.max("n").cast("bigint").alias("n_customers"),
        (
            F.sum(F.expr("CASE WHEN rn = (n + 1) DIV 2 THEN c ELSE 0 END"))
            + F.sum(F.expr("CASE WHEN rn = (n + 2) DIV 2 THEN c ELSE 0 END"))
        )
        .cast("bigint")
        .alias("mid2_cents"),
        (
            (
                F.sum(
                    F.expr("CASE WHEN rn = (n + 1) DIV 2 THEN c ELSE 0 END")
                )
                + F.sum(
                    F.expr("CASE WHEN rn = (n + 2) DIV 2 THEN c ELSE 0 END")
                )
            )
            / 2.0
            / 100.0
        ).alias("median_balance"),
    )
