"""Warehouse-diagnostics depth (round 8, batch 10): the queries an
operator of a 100 TB warehouse actually runs between the "real"
queries — fraud screening, weighted robust statistics, association
rules, shuffle-skew planning, cross-fact audience segmentation, and
the guaranteed-complete similarity join.

* q_benford_law — first-digit distribution of order values vs
  Benford's expectation (the classic anomaly/fraud screen): digit
  from the exact-cents BIGINT's decimal string, share as ONE division,
  expected shares as SHARED literal constants (the identical decimal
  text is embedded in both engines' expressions, so both parse to the
  same double and the arithmetic is bit-exact).
* q_weighted_percentile — quantity-weighted median price per return
  flag: running weight sums over the (cents, orderkey, linenumber)
  total order, lower weighted median where 2*cumw >= totw — pure
  integer rank math, the weighted companion to q_percentile_disc.
* q_assoc_rules — association rules over the apriori-pruned pair
  counts (q_frequent_pairs' plan): both directed rules per pair with
  confidence n_ab/n_a and lift n_ab*N/(n_a*n_b) — divisions of exact
  BIGINT products only at the end.
* q_skew_diagnostic — the pre-shuffle skew profile (run it BEFORE
  choosing salting/caps): per-key counts of events.user_id rolled to
  n_keys / max / p50 / p99 (discrete rank math) / top-key share /
  max-to-median ratio. The numbers q_join_salted's and the capped
  graph ops' knobs are chosen from.
* q_ds_exists_matrix — TPC-DS Q35-shape audience segmentation:
  customers bucketed by (has any order, has a >$200k order) EXISTS
  flags, counted per cell — the cross-fact EXISTS matrix one scan of
  each side computes (flags from ONE orders rollup, never correlated
  subqueries per row).
* q_simjoin_prefix — PPJoin-style prefix-filtered set-similarity
  join (operators/dedup.py::set_similarity_join) over the
  EXACT-DEDUPED corpus: EVERY distinct-text doc pair with word-set
  Jaccard >= 0.9 (the templated corpus is word-set-dense: at 0.6 more
  than half of ALL pairs qualify, so the entry uses the near-dup
  threshold where the prefix is ~1/10 of each doc), guaranteed
  complete (prefix-filtering theorem), hot tokens confined to
  suffixes — the exact companion to the probabilistic MinHash-LSH
  candidates. The exact-dedup prefix is load-bearing at scale: ALL
  all-pairs similarity output is multiplicative under duplication
  (k copies of a c-doc near-dup cluster emit k^2*c^2 pairs — the 10x
  twinned probe corpus made the raw join 100x-output-bound), so the
  canonical pipeline removes identical texts first and the join is
  bounded by UNIQUE content.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_s3_etl_spark.operators.dedup import set_similarity_join
from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table

# Benford expected shares as decimal literals shared by BOTH engines:
# identical text -> identical nearest-double -> bit-exact arithmetic.
_BENFORD_CASE = (
    "CASE leading_digit "
    + " ".join(
        f"WHEN {d} THEN {math.log10(1 + 1 / d)!r}" for d in range(1, 10)
    )
    + " END"
)


@register(
    "q_benford_law",
    category="statistics",
    cost=1,
    doc=(
        "Benford's-law screen on order values: leading digit of the "
        "exact-cents BIGINT, per-digit counts from one scan, observed "
        "share as one division, expected share from shared literal "
        "constants, excess = share - expected on identical operands."
    ),
    oracle=f"""
        WITH d AS (
          SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                                  AS VARCHAR), 1, 1) AS INT)
                     AS leading_digit
          FROM orders
          WHERE o_totalprice > 0
        ), c AS (
          SELECT leading_digit, CAST(COUNT(*) AS BIGINT) AS n
          FROM d GROUP BY leading_digit
        )
        SELECT leading_digit, n,
               CAST(n AS DOUBLE) / SUM(n) OVER () AS share,
               {_BENFORD_CASE} AS expected_share,
               CAST(n AS DOUBLE) / SUM(n) OVER ()
                   - {_BENFORD_CASE} AS excess
        FROM c
    """,
)
def q_benford_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.expr(
                "CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)"
                " AS STRING), 1, 1) AS INT)"
            ).alias("leading_digit")
        )
        .groupBy("leading_digit")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    w_all = Window.partitionBy()
    return c.select(
        "leading_digit",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w_all)).alias("share"),
        F.expr(_BENFORD_CASE).alias("expected_share"),
        (
            F.col("n").cast("double") / F.sum("n").over(w_all)
            - F.expr(_BENFORD_CASE)
        ).alias("excess"),
    )


@register(
    "q_weighted_percentile",
    category="statistics",
    cost=1,
    doc=(
        "Quantity-weighted median price per return flag: running "
        "integer weight sums over the (cents, orderkey, linenumber) "
        "total order, lower weighted median at 2*cumw >= totw — "
        "integer rank math end-to-end, one window + one rollup."
    ),
    oracle="""
        WITH r AS (
          SELECT l_returnflag,
                 CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c,
                 CAST(l_quantity AS BIGINT) AS q,
                 l_orderkey, l_linenumber
          FROM lineitem
        ), s AS (
          SELECT l_returnflag, c, q,
                 SUM(q) OVER (PARTITION BY l_returnflag
                              ORDER BY c, l_orderkey, l_linenumber
                              ROWS UNBOUNDED PRECEDING) AS cumw,
                 SUM(q) OVER (PARTITION BY l_returnflag) AS totw
          FROM r
        )
        SELECT l_returnflag,
               CAST(MAX(totw) AS BIGINT) AS total_qty,
               CAST(MIN(CASE WHEN 2 * cumw >= totw THEN c END)
                    AS BIGINT) AS wmedian_cents,
               CAST(MIN(CASE WHEN 2 * cumw >= totw THEN c END) AS DOUBLE)
                   / 100.0 AS wmedian_price
        FROM s GROUP BY l_returnflag
    """,
)
def q_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").alias("c"),
        F.expr("CAST(l_quantity AS BIGINT)").alias("q"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("l_returnflag")
    s = r.select(
        "l_returnflag",
        "c",
        "q",
        F.sum("q")
        .over(
            w.orderBy("c", "l_orderkey", "l_linenumber").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .alias("cumw"),
        F.sum("q").over(w).alias("totw"),
    )
    return s.groupBy("l_returnflag").agg(
        F.max("totw").cast("bigint").alias("total_qty"),
        F.min(F.expr("CASE WHEN 2 * cumw >= totw THEN c END"))
        .cast("bigint")
        .alias("wmedian_cents"),
        (
            F.min(F.expr("CASE WHEN 2 * cumw >= totw THEN c END")).cast(
                "double"
            )
            / 100.0
        ).alias("wmedian_price"),
    )


@register(
    "q_assoc_rules",
    category="mining",
    cost=1,
    doc=(
        "Association rules from the apriori-pruned basket pairs "
        "(q_frequent_pairs' bounded plan): each frequent pair emits "
        "both directed rules with confidence n_ab/n_ant and lift "
        "n_ab*N/(n_ant*n_cons) — BIGINT counts throughout, divisions "
        "only at the end; the basket total N rides a 1-row broadcast."
    ),
    oracle="""
        WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        n_orders AS (
          SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS nb FROM items
        ),
        icnt AS (
          SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_item
          FROM items GROUP BY l_partkey
        ),
        freq AS (SELECT l_partkey FROM icnt WHERE n_item >= 2),
        f_items AS (
          SELECT i.l_orderkey, i.l_partkey FROM items i
          JOIN freq USING (l_partkey)
        ),
        pairs AS (
          SELECT a.l_partkey AS pa, b.l_partkey AS pb,
                 CAST(COUNT(*) AS BIGINT) AS n_pair
          FROM f_items a
          JOIN f_items b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ),
        rules AS (
          SELECT pa AS antecedent, pb AS consequent, n_pair FROM pairs
          UNION ALL
          SELECT pb, pa, n_pair FROM pairs
        )
        SELECT r.antecedent, r.consequent, r.n_pair,
               ia.n_item AS n_ant,
               CAST(r.n_pair AS DOUBLE) / ia.n_item AS confidence,
               CAST(r.n_pair * n_orders.nb AS DOUBLE)
                   / (ia.n_item * ic.n_item) AS lift
        FROM rules r
        JOIN icnt ia ON ia.l_partkey = r.antecedent
        JOIN icnt ic ON ic.l_partkey = r.consequent
        CROSS JOIN n_orders
    """,
)
def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    min_support = 2
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        # three consumers: basket total, item counts, basket pairs
        .localCheckpoint()
    )
    n_orders = items.agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("nb")
    )
    icnt = items.groupBy("l_partkey").agg(
        F.count("*").cast("bigint").alias("n_item")
    )
    freq = icnt.filter(F.col("n_item") >= min_support).select("l_partkey")
    baskets = (
        items.join(F.broadcast(freq), "l_partkey", "left_semi")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("basket"))
    )
    pairs = (
        baskets.select(
            F.explode(
                F.expr(
                    "flatten(transform(basket, (x, i) ->"
                    " transform(slice(basket, i + 2, size(basket)),"
                    " y -> struct(x AS pa, y AS pb))))"
                )
            ).alias("p")
        )
        .select("p.pa", "p.pb")
        .groupBy("pa", "pb")
        .agg(F.count("*").cast("bigint").alias("n_pair"))
        .filter(F.col("n_pair") >= min_support)
    )
    rules = pairs.select(
        F.explode(
            F.expr(
                "array(struct(pa AS antecedent, pb AS consequent),"
                " struct(pb AS antecedent, pa AS consequent))"
            )
        ).alias("r"),
        "n_pair",
    ).select("r.antecedent", "r.consequent", "n_pair")
    ia = icnt.select(
        F.col("l_partkey").alias("antecedent"),
        F.col("n_item").alias("n_ant"),
    )
    ic = icnt.select(
        F.col("l_partkey").alias("consequent"),
        F.col("n_item").alias("n_cons"),
    )
    return (
        rules.join(ia, "antecedent")
        .join(ic, "consequent")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "antecedent",
            "consequent",
            "n_pair",
            "n_ant",
            F.expr("CAST(n_pair AS DOUBLE) / n_ant").alias("confidence"),
            F.expr(
                "CAST(n_pair * nb AS DOUBLE) / (n_ant * n_cons)"
            ).alias("lift"),
        )
    )


@register(
    "q_skew_diagnostic",
    category="quality",
    cost=1,
    doc=(
        "Pre-shuffle key-skew profile of events.user_id: per-key "
        "counts rolled up to n_keys / n_rows / max / p50 / p99 "
        "(discrete rank math) / top-key share / max-to-median ratio "
        "— the numbers salting and degree-cap knobs are chosen from. "
        "Scale shape (r9): the per-key counts roll up AGAIN into a "
        "value histogram (one row per distinct count), so the only "
        "window in the plan is the prefix sum over that tiny "
        "histogram — the percentile positions need the VALUE at a "
        "global rank, and within a run of equal counts every "
        "position holds the same value, so no per-row row_number "
        "(r8's unpartitioned O(n_keys) single-task sort) is needed "
        "at all."
    ),
    oracle="""
        WITH k AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM events GROUP BY user_id
        ), s AS (
          SELECT cnt,
                 ROW_NUMBER() OVER (ORDER BY cnt, user_id) AS rn,
                 COUNT(*) OVER () AS nk,
                 SUM(cnt) OVER () AS nr
          FROM k
        )
        SELECT CAST(MAX(nk) AS BIGINT) AS n_keys,
               CAST(MAX(nr) AS BIGINT) AS n_rows,
               MAX(cnt) AS max_cnt,
               CAST(MAX(CASE WHEN rn = (nk + 1) // 2 THEN cnt END)
                    AS BIGINT) AS p50_cnt,
               CAST(MAX(CASE WHEN rn = (99 * nk + 99) // 100 THEN cnt END)
                    AS BIGINT) AS p99_cnt,
               CAST(MAX(cnt) AS DOUBLE) / MAX(nr) AS top_share,
               CAST(MAX(cnt) AS DOUBLE)
                   / MAX(CASE WHEN rn = (nk + 1) // 2 THEN cnt END)
                   AS skew_ratio
        FROM s
    """,
)
def q_skew_diagnostic(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    # Value histogram: one row per DISTINCT per-key count — bounded by
    # max(cnt), not by n_keys, and map-side combinable. The prefix-sum
    # and total windows below run over THIS rollup only.
    h = k.groupBy("cnt").agg(F.count("*").cast("bigint").alias("nv"))
    w_cum = Window.orderBy("cnt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    s = h.select(
        "cnt",
        "nv",
        F.sum("nv").over(w_cum).alias("cum"),
        F.sum("nv").over(w_all).alias("nk"),
    )
    # The cnt value at global ascending position pos is the smallest
    # cnt whose cumulative count reaches pos (tie order within equal
    # counts cannot change the value).
    return s.agg(
        F.max("nk").cast("bigint").alias("n_keys"),
        F.sum(F.expr("cnt * nv")).cast("bigint").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.min(F.expr("CASE WHEN cum >= (nk + 1) DIV 2 THEN cnt END"))
        .cast("bigint")
        .alias("p50_cnt"),
        F.min(F.expr("CASE WHEN cum >= (99 * nk + 99) DIV 100 THEN cnt END"))
        .cast("bigint")
        .alias("p99_cnt"),
        F.expr(
            "CAST(MAX(cnt) AS DOUBLE) / SUM(cnt * nv)"
        ).alias("top_share"),
        F.expr(
            "CAST(MAX(cnt) AS DOUBLE)"
            " / MIN(CASE WHEN cum >= (nk + 1) DIV 2 THEN cnt END)"
        ).alias("skew_ratio"),
    )


@register(
    "q_ds_exists_matrix",
    category="relational",
    cost=1,
    doc=(
        "TPC-DS Q35-shape audience segmentation: customers bucketed by "
        "(has any order, has a >$200k order) and counted per cell — "
        "both EXISTS flags come from ONE orders rollup left-joined to "
        "the customer dimension, never per-row correlated subqueries."
    ),
    oracle="""
        WITH o AS (
          SELECT o_custkey,
                 TRUE AS has_orders,
                 MAX(o_totalprice > 200000.0) AS has_big
          FROM orders GROUP BY o_custkey
        )
        SELECT COALESCE(o.has_orders, FALSE) AS has_orders,
               COALESCE(o.has_big, FALSE) AS has_big_order,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM customer c LEFT JOIN o ON o.o_custkey = c.c_custkey
        GROUP BY 1, 2
    """,
)
def q_ds_exists_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.lit(True).alias("has_orders"),
            F.max(F.col("o_totalprice") > 200000.0).alias("has_big"),
        )
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .select(
            F.coalesce("has_orders", F.lit(False)).alias("has_orders"),
            F.coalesce("has_big", F.lit(False)).alias("has_big_order"),
        )
        .groupBy("has_orders", "has_big_order")
        .agg(F.count("*").cast("bigint").alias("n_customers"))
    )


@register(
    "q_simjoin_prefix",
    category="dedup",
    cost=1,
    doc=(
        "PPJoin-style prefix-filtered set-similarity join: every doc "
        "pair of DISTINCT texts with word-set Jaccard >= 0.9 (exact-dedup "
        "first — all-pairs output is multiplicative under duplication, "
        "so the join is bounded by unique content), complete by the "
        "prefix-filtering theorem (rare-first global token order; two "
        "above-threshold docs must share a prefix token), hot tokens "
        "confined to suffixes, threshold tested by integer "
        "cross-multiply — the exact companion to MinHash-LSH."
    ),
    oracle="""
        WITH uniq AS (
          SELECT doc_id, text FROM (
            SELECT doc_id, text,
                   ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id)
                       AS rn
            FROM documents) WHERE rn = 1
        ), toks AS (
          SELECT DISTINCT doc_id, s AS token FROM (
            SELECT doc_id, UNNEST(string_split(text, ' ')) AS s
            FROM uniq)
          WHERE s != ''
        ), sz AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
          FROM toks GROUP BY doc_id
        ), inter AS (
          SELECT a.doc_id AS da, b.doc_id AS db,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM toks a JOIN toks b
            ON a.token = b.token AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        )
        SELECT da AS doc_a, db AS doc_b, sa.n AS n_a, sb.n AS n_b,
               c AS n_common,
               CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
        FROM inter
        JOIN sz sa ON sa.doc_id = da
        JOIN sz sb ON sb.doc_id = db
        WHERE 1000 * c >= 900 * (sa.n + sb.n - c)
    """,
)
def q_simjoin_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # exact-dedup first (keep-lowest-id per text, fingerprint-keyed so
    # the shuffle moves 8 bytes, not bodies — same plan as exact_dedup;
    # the oracle partitions on raw text, identical up to ~1e-19)
    w = Window.partitionBy(F.xxhash64("text")).orderBy("doc_id")
    uniq = (
        docs.select("doc_id", "text")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "text")
    )
    # identical token-SET collapse (r11): distinct texts that share a
    # token set are interchangeable for Jaccard, so the prefix+verify
    # joins run on one representative per set and re-expand after —
    # measured 1.60x at sf0.1 with bit-identical output (963,966 rows,
    # float-repr equal; SCALE.md round-11)
    return set_similarity_join(
        uniq, threshold=0.9, collapse_identical_sets=True
    )
