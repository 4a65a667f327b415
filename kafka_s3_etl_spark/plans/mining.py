"""Round-5 batches 3-4: profiling, record linkage, graph analytics,
mergeable sketches, versioning, search, features, and robust stats.

Registered as the LAST plan module so the driver sweep's first-50
window stays untouched (lakehouse-last convention, see registry.py).

Batch-4 catalog (SURVEY.md 2i): q_table_diff (snapshot reconciliation),
q_inverted_index (posting lists), q_rolling_multi (multi-horizon RANGE
features), q_sequence_ngrams (behavioral trigrams), q_dq_audit
(Deequ-shape rule report), q_compress_ratio (zlib redundancy signal),
q_anomaly_mad (median/MAD robust outliers — exact-integer quantiles),
q_entity_resolution (linkage pairs -> CC -> canonical spellings).
s_session_timeout lives in plans/streaming_queries.py and
x_orc_roundtrip in plans/etl.py.

Batch-3 catalog:

* q_profile_columns — one-pass data profiling (the "what is in this
  table" audit every ingestion run records): per-column row/null/
  distinct counts plus order-preserving min/max. Shape: melt the table
  to (col, formatted_value) rows ONCE, then a single grouped agg —
  Spark plans the per-column count(distinct) as a two-phase partial agg
  on (col, value), so the wide row count collapses map-side and the
  profile never holds the table in one place. Values are formatted to
  ORDER-PRESERVING strings (zero-padded integers / cents, lexicographic
  timestamps) so min/max of the string IS min/max of the value and the
  whole profile is one uniform schema.
* q_fuzzy_join — edit-distance-1 record linkage over customer names via
  deletion-neighborhood blocking (operators/linkage.py): signature
  equi-join + bounded verify, never the oracle's O(n^2) cross join.
* q_graph_triangles — per-node triangle counts over the fuzzy-match
  graph (operators/graph.py::triangle_counts): degree-ordered wedge
  join, the distributed triangle-counting standard. Triangles over a
  similarity graph = "clusters of 3+ mutually-confusable entities",
  the signal record-linkage uses to escalate from pairwise merge to
  cluster resolution.
* q_tpch_local_volume — TPC-H Q5 shape (local supplier volume): the
  classic snowflake join with the c_nationkey = s_nationkey locality
  constraint. region/nation dims broadcast; customer joins orders on
  the customer key, lineitem joins on the order key, supplier joins on
  the supplier key with the nation equality folded into the join —
  cents-exact revenue per nation.
* q_hll_sketch — mergeable-sketch rollup (rows-only): per-nation
  DataSketches HLL of customer keys + the sketch-union global estimate.
  THE 100 TB cardinality pattern: sketches pre-aggregate per partition
  / day / tenant, and any later rollup merges sketches instead of
  rescanning data. No DuckDB-compatible binary sketch exists, so this
  entry is property-tested (estimate within rated error of exact;
  union-of-groups == direct global sketch) instead of oracle-hashed.

Exactness notes: o_totalprice / l_extendedprice / l_discount are
cent-quantized by the generator, so ``ROUND(x * 100)`` is exact on both
engines (same convention as plans/analytics.py); revenue divides the
BIGINT cents product once at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_s3_etl_spark.operators.graph import triangle_counts
from kafka_s3_etl_spark.operators.linkage import fuzzy_pairs_ed1
from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Data profiling


# (column, order-preserving Spark format expr, matching DuckDB expr).
# Integers zero-pad to 12; doubles profile as zero-padded exact cents;
# timestamps format lexicographically time-ordered.
_PROFILE_COLS = [
    (
        "o_orderkey",
        "lpad(CAST(o_orderkey AS STRING), 12, '0')",
        "lpad(CAST(o_orderkey AS VARCHAR), 12, '0')",
    ),
    (
        "o_custkey",
        "lpad(CAST(o_custkey AS STRING), 12, '0')",
        "lpad(CAST(o_custkey AS VARCHAR), 12, '0')",
    ),
    ("o_orderstatus", "o_orderstatus", "o_orderstatus"),
    (
        "o_totalprice",
        "lpad(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS STRING),"
        " 12, '0')",
        "lpad(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR),"
        " 12, '0')",
    ),
    (
        "o_orderdate",
        "date_format(o_orderdate, 'yyyy-MM-dd HH:mm:ss')",
        "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')",
    ),
    ("o_orderpriority", "o_orderpriority", "o_orderpriority"),
]

_PROFILE_ORACLE = (
    "WITH melted AS ("
    + " UNION ALL ".join(
        f"SELECT '{c}' AS col, {duck} AS sval FROM orders"
        for c, _, duck in _PROFILE_COLS
    )
    + """)
    SELECT col, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(sval) AS n_null,
           COUNT(DISTINCT sval) AS n_distinct,
           MIN(sval) AS min_s, MAX(sval) AS max_s
    FROM melted GROUP BY col
    """
)


@register(
    "q_profile_columns",
    category="profiling",
    doc=(
        "One-pass column profile of orders: melt to (col, "
        "order-preserving string) then a single grouped agg — "
        "count/nulls/distinct/min/max per column in one uniform schema."
    ),
    oracle=_PROFILE_ORACLE,
)
def q_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    kvs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"), F.expr(spark_fmt).alias("sval")
            )
            for c, spark_fmt, _ in _PROFILE_COLS
        ]
    )
    return (
        orders.select(F.explode(kvs).alias("kv"))
        .select("kv.col", "kv.sval")
        .groupBy("col")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) - F.count("sval")).alias("n_null"),
            F.countDistinct("sval").alias("n_distinct"),
            F.min("sval").alias("min_s"),
            F.max("sval").alias("max_s"),
        )
    )


# ---------------------------------------------------------------------------
# Record linkage + graph analytics over the linkage graph


_FUZZY_ORACLE_EDGES = """
        WITH cn AS (SELECT DISTINCT c_name FROM customer),
        e AS (
          SELECT a.c_name AS a, b.c_name AS b
          FROM cn a JOIN cn b
            ON a.c_name < b.c_name
           AND levenshtein(a.c_name, b.c_name) <= 1
        )
"""

# Blocked replay of the SAME edge set: deletion-neighborhood signatures
# (FastSS/SymSpell — operators/linkage.py::fuzzy_pairs_ed1), exact by
# the position tag, so e is IDENTICAL to the all-pairs levenshtein CTE
# above (equality asserted by tests/test_blocked_oracle_equality.py at
# sf0.001 AND sf0.01). Exists because the all-pairs reference is O(n²)
# — 112M levenshtein calls at sf0.1 feeding a recursive closure wedged
# two sim passes (VERDICT r13 #1); this replay is O(n·L) and lets
# q_entity_resolution carry sf0.1 hash evidence. MATERIALIZED is
# load-bearing: the recursive consumer would otherwise re-expand the
# edge derivation every iteration (the CLAUDE.md CTE-chain rule).
_FUZZY_ORACLE_EDGES_BLOCKED = """
        WITH RECURSIVE cn AS MATERIALIZED (
          SELECT DISTINCT c_name FROM customer
        ),
        dels AS MATERIALIZED (
          SELECT c_name AS v,
                 substr(c_name, 1, CAST(t.i AS INTEGER))
                   || substr(c_name, CAST(t.i AS INTEGER) + 2) AS sig,
                 CAST(t.i AS INTEGER) AS pos
          FROM cn, UNNEST(range(length(c_name))) AS t(i)
        ),
        e AS MATERIALIZED (
          SELECT da.v AS a, db.v AS b
          FROM dels da JOIN dels db
            ON da.sig = db.sig AND da.pos = db.pos AND da.v < db.v
          UNION ALL
          SELECT * FROM (
            SELECT DISTINCT least(s.c_name, d.v) AS a,
                            greatest(s.c_name, d.v) AS b
            FROM cn s JOIN dels d
              ON s.c_name = d.sig AND s.c_name <> d.v
          )
        )
"""


@register(
    "q_fuzzy_join",
    category="linkage",
    doc=(
        "Edit-distance-1 self-join of customer names via deletion-"
        "neighborhood blocking (FastSS/SymSpell): signature equi-join "
        "+ bounded verify; the oracle states the O(n^2) semantics."
    ),
    oracle=_FUZZY_ORACLE_EDGES
    + """
        SELECT a, b, CAST(levenshtein(a, b) AS INTEGER) AS dist FROM e
    """,
)
def q_fuzzy_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fuzzy_pairs_ed1(
        load_table(spark, sf_dir, "customer"), col="c_name"
    )


@register(
    "q_graph_triangles",
    category="graph",
    cost=1,
    doc=(
        "Per-node triangle counts over the edit-distance-1 name graph: "
        "degree-ordered wedge join (two equi-join shuffles, hub-safe), "
        "vs the oracle's 3-way self-join enumeration."
    ),
    oracle=_FUZZY_ORACLE_EDGES
    + """
        , tri AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM e e1
          JOIN e e2 ON e1.b = e2.a
          JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        )
        SELECT node AS c_name, COUNT(*) AS n_tri
        FROM tri, UNNEST([x, y, z]) AS t(node)
        GROUP BY node
    """,
)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = fuzzy_pairs_ed1(
        load_table(spark, sf_dir, "customer"), col="c_name"
    ).select("a", "b")
    return triangle_counts(edges).withColumnRenamed("node", "c_name")


# ---------------------------------------------------------------------------
# TPC-H Q5 shape


@register(
    "q_tpch_local_volume",
    category="relational",
    doc=(
        "TPC-H Q5 shape (local supplier volume): ASIA-filtered "
        "region->nation dim broadcast into customer AND supplier, "
        "orders join on customer key, lineitem on order key, supplier "
        "on (suppkey, nation=nation) — revenue only counts lineitems "
        "whose supplier sits in the customer's nation. Cents-exact."
    ),
    oracle="""
        SELECT n.n_name,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                    AS DOUBLE) / 1e4 AS revenue
        FROM region r
        JOIN nation n ON n.n_regionkey = r.r_regionkey
        JOIN customer c ON c.c_nationkey = n.n_nationkey
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON s.s_suppkey = l.l_suppkey
                       AND s.s_nationkey = c.c_nationkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY n.n_name
    """,
)
def q_tpch_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    asia_nations = (
        load_table(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").filter(
                    F.col("r_name") == "ASIA"
                )
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(asia_nations),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "c_nationkey", "n_name")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1996-01-01 00:00:00")
            & (F.col("o_orderdate") < "1997-01-01 00:00:00")
        )
        .select("o_orderkey", "o_custkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    ord_cust = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select("o_orderkey", "c_nationkey", "n_name")
    return (
        li.join(ord_cust, li.l_orderkey == F.col("o_orderkey"))
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (F.col("c_nationkey") == supp.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.expr(
                "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
                " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))"
                " AS DOUBLE) / 1e4"
            ).alias("revenue")
        )
    )


# ---------------------------------------------------------------------------
# Mergeable sketches


@register(
    "q_hll_sketch",
    category="sketch",
    cost=1,
    oracle=None,  # no cross-engine binary sketch; property-tested
    doc=(
        "Mergeable DataSketches HLL rollup: per-nation customer-key "
        "sketches + hll_union_agg global estimate (nationkey -1). "
        "Rows-only: property test pins estimate-vs-exact error and "
        "union==direct-global; DuckDB has no compatible sketch."
    ),
)
def q_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    # lgConfigK=12 -> rated relative standard error ~1.6%.
    sketches = cust.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey", F.lit(12)).alias("sk"),
        F.countDistinct("c_custkey").alias("exact"),
    )
    per_nation = sketches.select(
        "c_nationkey",
        F.hll_sketch_estimate("sk").alias("est"),
        "exact",
    )
    merged = sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.sum("exact").alias("exact"),  # nation partitions customers
    ).select(
        F.lit(-1).cast("int").alias("c_nationkey"), "est", "exact"
    )
    return per_nation.unionAll(merged)


# ---------------------------------------------------------------------------
# Snapshot diff (table-versioning audit)


# v2 is a deterministic simulated "next snapshot" of orders:
# keys % 7 == 3 deleted, keys % 10 == 0 get price + 1.0, and keys
# % 11 == 5 are re-inserted shifted by +1M (the repo's synthetic-insert offset,
# disjoint from real keys and from the scaling probe's +10M copies).
_DIFF_KEYS = "o_orderkey % 10 = 0"


@register(
    "q_table_diff",
    category="lakehouse",
    doc=(
        "Snapshot diff (operators/diff.py::snapshot_diff): one "
        "full-outer hash join on the key + null-safe JVM column "
        "compare classifies every changed key as insert/delete/update "
        "— the reconciliation report before promoting a new table "
        "version. The oracle states the expected diff closed-form."
    ),
    oracle="""
        SELECT o_orderkey + 1000000 AS o_orderkey,
               'insert' AS change_type
        FROM orders WHERE o_orderkey % 11 = 5
        UNION ALL
        SELECT o_orderkey, 'delete' FROM orders WHERE o_orderkey % 7 = 3
        UNION ALL
        SELECT o_orderkey, 'update' FROM orders
        WHERE o_orderkey % 10 = 0 AND o_orderkey % 7 <> 3
    """,
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_s3_etl_spark.operators.diff import snapshot_diff

    v1 = load_table(spark, sf_dir, "orders")
    survivors = v1.filter(F.col("o_orderkey") % 7 != 3).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 10 == 0, F.col("o_totalprice") + 1.0
        ).otherwise(F.col("o_totalprice")),
    )
    inserts = v1.filter(F.col("o_orderkey") % 11 == 5).withColumn(
        "o_orderkey", F.col("o_orderkey") + 1_000_000
    )
    v2 = survivors.select(*v1.columns).unionAll(inserts.select(*v1.columns))
    return snapshot_diff(v1, v2, "o_orderkey")


# ---------------------------------------------------------------------------
# Inverted index (search-engine posting lists)


@register(
    "q_inverted_index",
    category="text",
    doc=(
        "Inverted index: term -> (document frequency, sorted posting "
        "list, total term frequency) in ONE explode + grouped agg. "
        "Posting arrays here are whole-corpus; at 100 TB the same plan "
        "shards each term's postings by doc_id range (term, bucket) so "
        "no single row exceeds memory — the term key simply gains a "
        "doc_id-div-N suffix."
    ),
    oracle="""
        WITH w AS (
          SELECT doc_id, UNNEST(string_split(text, ' ')) AS term
          FROM documents
        )
        SELECT term,
               CAST(len(list(DISTINCT doc_id ORDER BY doc_id)) AS INTEGER)
                   AS df,
               list(DISTINCT doc_id ORDER BY doc_id) AS postings,
               CAST(COUNT(*) AS BIGINT) AS tf
        FROM w WHERE term <> '' GROUP BY term
    """,
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    return words.groupBy("term").agg(
        F.size(F.array_sort(F.collect_set("doc_id"))).alias("df"),
        F.array_sort(F.collect_set("doc_id")).alias("postings"),
        F.count(F.lit(1)).alias("tf"),
    )


# ---------------------------------------------------------------------------
# Multi-horizon rolling features


@register(
    "q_rolling_multi",
    category="features",
    doc=(
        "Multi-horizon rolling features (7d and 30d revenue/activity "
        "per user) in one pass: daily rollup first (map-side-combined, "
        "cents-exact BIGINT), then BOTH RANGE frames over the same "
        "(user, day) sort — Spark evaluates the two frames in a single "
        "window sort, so the corpus shuffles once. Division happens "
        "once per output row on exact cents (identical IEEE op both "
        "engines)."
    ),
    oracle="""
        WITH daily AS (
          SELECT user_id, CAST(ts AS DATE) AS day,
                 CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                      AS INTEGER) AS day_i,
                 SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents,
                 COUNT(*) AS n
          FROM events GROUP BY 1, 2, 3
        )
        SELECT user_id, day,
               CAST(SUM(n) OVER w7 AS BIGINT) AS n_7d,
               CAST(SUM(cents) OVER w7 AS BIGINT) / 100.0 AS rev_7d,
               CAST(SUM(n) OVER w30 AS BIGINT) AS n_30d,
               CAST(SUM(cents) OVER w30 AS BIGINT) / 100.0 AS rev_30d
        FROM daily
        WINDOW
          w7 AS (PARTITION BY user_id ORDER BY day_i
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW),
          w30 AS (PARTITION BY user_id ORDER BY day_i
                  RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
    """,
)
def q_rolling_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "user_id",
            F.to_date("ts").alias("day"),
            F.unix_date(F.to_date("ts")).alias("day_i"),
        )
        .agg(
            F.sum(
                F.round(F.col("value") * 100).cast("bigint")
            ).alias("cents"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    w7 = (
        Window.partitionBy("user_id").orderBy("day_i").rangeBetween(-6, 0)
    )
    w30 = (
        Window.partitionBy("user_id").orderBy("day_i").rangeBetween(-29, 0)
    )
    return daily.select(
        "user_id",
        "day",
        F.sum("n").over(w7).alias("n_7d"),
        (F.sum("cents").over(w7) / 100.0).alias("rev_7d"),
        F.sum("n").over(w30).alias("n_30d"),
        (F.sum("cents").over(w30) / 100.0).alias("rev_30d"),
    )


# ---------------------------------------------------------------------------
# Sequential pattern mining


@register(
    "q_sequence_ngrams",
    category="temporal",
    doc=(
        "Behavioral trigram mining: per-user event-type 3-grams over "
        "the (ts, event_id) total order (two stacked LEADs share one "
        "window sort), global count, deterministic top-20 via "
        "TakeOrderedAndProject with the trigram tiebreak."
    ),
    oracle="""
        WITH seq AS (
          SELECT event_type AS t1,
                 LEAD(event_type, 1) OVER w AS t2,
                 LEAD(event_type, 2) OVER w AS t3
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT t1 || '>' || t2 || '>' || t3 AS trigram,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE t2 IS NOT NULL AND t3 IS NOT NULL
        GROUP BY 1 ORDER BY n DESC, trigram LIMIT 20
    """,
)
def q_sequence_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    )
    return (
        seq.filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
        .groupBy(
            F.concat_ws(">", "t1", "t2", "t3").alias("trigram")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "trigram")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Data-quality audit (Deequ/dbt-tests shape)


@register(
    "q_dq_audit",
    category="profiling",
    doc=(
        "Declarative data-quality audit: completeness, uniqueness, "
        "range, domain membership, and referential integrity evaluated "
        "as ONE wide aggregate over the fact scan plus ONE broadcast "
        "anti-join count for the foreign key — the Deequ/dbt-test "
        "report shape. Each rule emits (rule, n_violations, pass); the "
        "range and RI rules are deliberately strict enough to fire on "
        "this corpus so the report is non-vacuous."
    ),
    oracle="""
        SELECT 'custkey_complete' AS rule,
               CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_violations,
               SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0
                   AS pass
        FROM orders
        UNION ALL
        SELECT 'orderkey_unique',
               CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT),
               COUNT(*) = COUNT(DISTINCT o_orderkey)
        FROM orders
        UNION ALL
        SELECT 'price_range',
               CAST(SUM(CASE WHEN o_totalprice < 0
                              OR o_totalprice > 300000
                             THEN 1 ELSE 0 END) AS BIGINT),
               SUM(CASE WHEN o_totalprice < 0 OR o_totalprice > 300000
                        THEN 1 ELSE 0 END) = 0
        FROM orders
        UNION ALL
        SELECT 'status_domain',
               CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                             THEN 1 ELSE 0 END) AS BIGINT),
               SUM(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P')
                        THEN 1 ELSE 0 END) = 0
        FROM orders
        UNION ALL
        SELECT 'custkey_in_dim',
               CAST(COUNT(*) AS BIGINT), COUNT(*) = 0
        FROM orders o
        WHERE NOT EXISTS (
          SELECT 1 FROM customer c
          WHERE c.c_custkey = o.o_custkey AND c.c_custkey % 100 <> 0
        )
    """,
)
def q_dq_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # The "dimension with gaps" makes the RI rule fire deterministically
    # (every custkey divisible by 100 counts as missing from the dim).
    dim = load_table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") % 100 != 0
    )

    # All four scan rules in ONE aggregation over ONE scan, then melted
    # to rows (a per-rule .agg() would rescan the fact table per rule).
    metrics = orders.agg(
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("v_complete"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey"))
        .cast("bigint")
        .alias("v_unique"),
        F.sum(
            F.when(
                (F.col("o_totalprice") < 0)
                | (F.col("o_totalprice") > 300000),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("v_range"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("v_domain"),
    )
    rule_names = [
        ("custkey_complete", "v_complete"),
        ("orderkey_unique", "v_unique"),
        ("price_range", "v_range"),
        ("status_domain", "v_domain"),
    ]
    scan_report = metrics.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("rule"),
                        F.col(col).alias("n_violations"),
                    )
                    for name, col in rule_names
                ]
            )
        ).alias("kv")
    ).select(
        "kv.rule",
        "kv.n_violations",
        (F.col("kv.n_violations") == 0).alias("pass"),
    )
    ri = (
        orders.join(
            F.broadcast(dim),
            orders.o_custkey == dim.c_custkey,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("v"))
        .select(
            F.lit("custkey_in_dim").alias("rule"),
            F.col("v").cast("bigint").alias("n_violations"),
            (F.col("v") == 0).alias("pass"),
        )
    )
    return scan_report.unionAll(ri)


# ---------------------------------------------------------------------------
# Compression-ratio quality signal


@register(
    "q_compress_ratio",
    category="text",
    cost=1,
    oracle=None,  # zlib has no DuckDB equivalent; exact-parity property test
    doc=(
        "Per-document zlib compression ratio (the Gopher-style "
        "redundancy quality signal): Arrow-vectorized stdlib zlib for "
        "the compressed size only, byte length and ratio JVM-side; one "
        "map-only scan. Rows-only: tests/test_mining_ops.py recomputes "
        "the exact compressed sizes with local zlib and pins equality."
    ),
)
def q_compress_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_s3_etl_spark.operators.udfs import compression_ratio

    return compression_ratio(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Robust anomaly detection (median / MAD)


@register(
    "q_anomaly_mad",
    category="statistics",
    doc=(
        "Robust per-group outlier detection (median + MAD, the "
        "3-sigma-equivalent robust z-score): medians computed over "
        "EXACT integer cents, where quantile interpolation is "
        "bit-exact on both engines (midpoints of integers < 2^52 "
        "involve no rounding), so med/MAD/outlier-threshold are "
        "engine-identical without any rounding. Two extra corpus "
        "scans are inherent to the exact two-level median; the "
        "production single-pass variant swaps in approx_percentile. "
        "Group medians broadcast back (tiny dim), never a per-type "
        "window over the corpus (a handful of event types would make "
        "that one giant sorted partition each)."
    ),
    oracle="""
        WITH med AS (
          SELECT event_type,
                 quantile_cont(CAST(ROUND(value * 100) AS BIGINT), 0.5)
                     AS med_cents
          FROM events GROUP BY event_type
        ),
        dev AS (
          SELECT e.event_type,
                 abs(CAST(ROUND(e.value * 100) AS BIGINT) - m.med_cents)
                     AS d
          FROM events e JOIN med m USING (event_type)
        ),
        mad AS (
          SELECT event_type, quantile_cont(d, 0.5) AS mad_cents
          FROM dev GROUP BY event_type
        )
        SELECT d.event_type, m.med_cents, s.mad_cents,
               CAST(SUM(CASE WHEN d.d > 3 * 1.4826 * s.mad_cents
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM dev d
        JOIN med m USING (event_type)
        JOIN mad s USING (event_type)
        GROUP BY d.event_type, m.med_cents, s.mad_cents
    """,
)
def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    med = ev.groupBy("event_type").agg(
        F.percentile("cents", F.lit(0.5)).alias("med_cents")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med_cents",
        F.abs(F.col("cents") - F.col("med_cents")).alias("d"),
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("d", F.lit(0.5)).alias("mad_cents")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med_cents", "mad_cents")
        .agg(
            F.sum(
                F.when(F.col("d") > 3 * 1.4826 * F.col("mad_cents"), 1)
                .otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers")
        )
    )


# ---------------------------------------------------------------------------
# Entity resolution (linkage graph -> canonical entities)


def _min_label_chain_sql(rounds: int) -> str:
    """Generated fixed-round min-label chain over the ``sym`` edge CTE.

    Replaces the recursive (node, label) closure, whose state count is
    O(n * cluster_size) — quadratic on the sf0.1 ed1 graph's single
    15000-node component. One min-label round propagates the component
    minimum one hop, so ``rounds`` >= the max BFS depth from each
    component's minimum suffices: measured depth is 3 (sf0.001),
    4 (sf0.01), 5 (sf0.1) — the ed1 graph is hypercube-like over digit
    positions, so depth grows ~log10(corpus), and 10 rounds carry wide
    margin. Too-small ``rounds`` fails LOUDLY (hash mismatch vs Spark's
    fixpoint). Each round is AS MATERIALIZED per the CLAUDE.md
    CTE-chain rule (default inlining re-expands every reference).
    """
    parts = [
        """
        , sym AS MATERIALIZED (
          SELECT a AS src, b AS dst FROM e
          UNION ALL
          SELECT b AS src, a AS dst FROM e
        ),
        lab0 AS MATERIALIZED (
          SELECT c_name AS node, c_name AS lbl FROM cn
        )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
        lab{r} AS MATERIALIZED (
          SELECT node, MIN(lbl) AS lbl FROM (
            SELECT node, lbl FROM lab{r - 1}
            UNION ALL
            SELECT s.dst AS node, l.lbl
            FROM lab{r - 1} l JOIN sym s ON l.node = s.src
          ) GROUP BY node
        )"""
        )
    parts.append(
        f"""
        SELECT node AS c_name, lbl AS canonical,
               node = lbl AS is_canonical
        FROM lab{rounds}
    """
    )
    return "".join(parts)


@register(
    "q_entity_resolution",
    category="linkage",
    cost=2,
    # Iterative CC, but the ed1 graph is deterministic on both engines,
    # so the fixpoint has an exact DuckDB oracle. (Upgraded from
    # rows-only in round 8; the union-find property test remains as the
    # independent reference. Round 14, VERDICT r13 #1: edges come from
    # the BLOCKED deletion-neighborhood replay — proven equal to the
    # all-pairs levenshtein CTE at sf0.001/sf0.01 by
    # tests/test_blocked_oracle_equality.py — and the closure is a
    # fixed-round MATERIALIZED min-label chain instead of the recursive
    # (node, label) CTE, whose state count was quadratic on sf0.1's
    # single 15000-node component. Oracle is now O(n*L + rounds*E) and
    # the entry carries sf0.1 evidence.)
    oracle=_FUZZY_ORACLE_EDGES_BLOCKED + _min_label_chain_sql(10),
    doc=(
        "End-to-end entity resolution: edit-distance-1 linkage pairs "
        "-> connected components (min-label propagation, string labels "
        "— the component minimum IS the canonical spelling) -> "
        "(name, canonical, is_canonical). Oracle: blocked "
        "deletion-neighborhood edge replay + fixed-round MATERIALIZED "
        "min-label chain over the same deterministic ed1 graph; a "
        "union-find property test is the second independent reference."
    ),
)
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_s3_etl_spark.operators.dedup import connected_components

    cust = load_table(spark, sf_dir, "customer")
    edges = fuzzy_pairs_ed1(cust, col="c_name").select(
        F.col("a").alias("doc_a"), F.col("b").alias("doc_b")
    )
    nodes = cust.select(F.col("c_name").alias("doc_id")).distinct()
    cc = connected_components(edges, nodes)
    return cc.select(
        F.col("doc_id").alias("c_name"),
        F.col("cluster_id").alias("canonical"),
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )
