"""Round-9 batch: scale-hardened twins of single-partition-window
queries (VERDICT r8 items 2-3 family).

Each entry here hash-matches an existing oracle while replacing the
plan's corpus-proportional single-task window with a distributed
two-phase prefix sum: per-partition (bucket) partial aggregation, a
prefix-sum window over the TINY bucket rollup only, and a broadcast
join carrying the per-bucket offsets back — the pattern
operators/ranks.py established for global ROW_NUMBER/NTILE, applied
here to running sums over a value domain.

Plan shape is pinned in tests/test_plans.py: the only
empty-partition-spec window allowed is the one over the bucket rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_s3_etl_spark.operators.temporal import sessionize
from kafka_s3_etl_spark.plans.analytics import INTERVAL_OVERLAP_ORACLE
from kafka_s3_etl_spark.plans.mining import _FUZZY_ORACLE_EDGES
from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table

_N_TIME_BUCKETS = 4096


@register(
    "q_interval_overlap_scalable",
    category="temporal",
    cost=1,
    doc=(
        "Peak concurrency over sessionized intervals — the DISTRIBUTED "
        "sweep SCALE.md promised: boundary points (+1/-1) collapse per "
        "timestamp (groupBy, map-side combinable), land in 4096 "
        "value-range time buckets, and the running sum splits into a "
        "per-bucket window (partitioned, parallel) plus a prefix-sum "
        "window over the 4096-row bucket rollup ONLY, with offsets "
        "broadcast back. Identical answer to q_interval_overlap (same "
        "oracle): a RANGE frame and a ROWS frame agree once coincident "
        "points are pre-collapsed. The min/max scan that sizes the "
        "buckets is one metadata-cheap aggregate action; exactness "
        "never depends on bucket balance — skew costs time only."
    ),
    oracle=INTERVAL_OVERLAP_ORACLE,
)
def q_interval_overlap_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    sessions = sessionize(load_table(spark, sf_dir, "events"))
    pts = sessions.select(
        F.unix_micros("session_start").alias("t"), F.lit(1).alias("d")
    ).unionByName(
        sessions.select(
            (F.unix_micros("session_end") + F.lit(1)).alias("t"),
            F.lit(-1).alias("d"),
        )
    )
    # Collapse coincident boundary points: after this, ROWS == RANGE
    # frames, and every t is unique so the max-concurrency argmax is
    # well defined.
    g = pts.groupBy("t").agg(F.sum("d").cast("bigint").alias("dd"))
    bounds = g.agg(F.min("t").alias("lo"), F.max("t").alias("hi")).first()
    if bounds is None or bounds.lo is None:
        return g.select(
            F.lit(None).cast("bigint").alias("max_concurrent"),
            F.lit(None).cast("bigint").alias("at_epoch_us"),
        ).limit(0)
    width = max(1, (bounds.hi - bounds.lo) // _N_TIME_BUCKETS + 1)
    b = g.withColumn(
        "bucket", F.expr(f"CAST((t - {bounds.lo}) DIV {width} AS BIGINT)")
    )
    per_bucket = b.groupBy("bucket").agg(F.sum("dd").alias("bsum"))
    w_off = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_bucket.select(
        "bucket",
        F.coalesce(F.sum("bsum").over(w_off), F.lit(0))
        .cast("bigint")
        .alias("off"),
    )
    w_local = Window.partitionBy("bucket").orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    run = b.join(F.broadcast(offsets), "bucket").select(
        "t", (F.col("off") + F.sum("dd").over(w_local)).alias("c")
    )
    pick = F.max(F.struct(F.col("c").alias("c"), (-F.col("t")).alias("nt")))
    return run.agg(
        pick["c"].alias("max_concurrent"), (-pick["nt"]).alias("at_epoch_us")
    )


# ---------------------------------------------------------------------------
# q_kcore_peeled: the rows-only -> oracle upgrade VERDICT r8 item 8 asked
# for. DuckDB's recursive CTEs forbid aggregates in the recursive term
# (the documented blocker for iterative-fixpoint oracles, see
# q_entity_resolution's notes), but k-core peeling admits a BOUNDED-
# ITERATION formulation: the peel depth of the ed1 name graph is 1 at
# every shipped SF (measured: 1275->900, 19500->13500, 262500->180000
# edges with the adaptive threshold), so an 8-round UNROLLED CTE chain
# states the exact semantics with a wide convergence margin — if a
# future corpus ever peels deeper than 8 layers, Spark's true fixpoint
# diverges from the oracle's 8th round and the driver goes loudly red,
# which is the correct failure mode. q_markov_stationary stays
# rows-only by necessity: its output is a float eigenvector from power
# iteration, and no SQL restatement reproduces numpy's accumulation
# order bit-for-bit (per-row floats are the one thing the hash cannot
# absorb).
# ---------------------------------------------------------------------------

_KCORE_ROUNDS = 8


def _kcore_unrolled_oracle(rounds: int) -> str:
    """Exact k-core by unrolled layer-at-a-time peeling. The threshold
    k = min_degree(initial graph) + 2 is data-adaptive so the peel
    BITES at every SF (a fixed k is vacuous or graph-emptying as the
    name-collision degree grows with scale); both engines compute it
    from the same integer degree rollup.

    Every CTE is AS MATERIALIZED: each round references its
    predecessor three times (edge filter + two degree probes), so
    default CTE inlining would expand the chain 3^rounds-fold — the
    un-materialized form exhausted file handles re-opening the
    parquet ~6500 times."""
    parts = [
        _FUZZY_ORACLE_EDGES,
        ", e0 AS MATERIALIZED (SELECT a AS x, b AS y FROM e)",
        """, kk AS MATERIALIZED (
          SELECT MIN(deg) + 2 AS k FROM (
            SELECT COUNT(*) AS deg FROM (
              SELECT x AS node FROM e0 UNION ALL SELECT y FROM e0
            ) GROUP BY node)
        )""",
    ]
    for i in range(rounds):
        parts.append(f""", d{i} AS MATERIALIZED (
          SELECT node, COUNT(*) AS deg FROM (
            SELECT x AS node FROM e{i} UNION ALL SELECT y FROM e{i}
          ) GROUP BY node
        ), e{i + 1} AS MATERIALIZED (
          SELECT g.x, g.y FROM e{i} g
          JOIN d{i} da ON da.node = g.x AND da.deg >= (SELECT k FROM kk)
          JOIN d{i} db ON db.node = g.y AND db.deg >= (SELECT k FROM kk)
        )""")
    parts.append(f"""
        SELECT node AS c_name, CAST(COUNT(*) AS BIGINT) AS deg FROM (
          SELECT x AS node FROM e{rounds} UNION ALL SELECT y FROM e{rounds}
        ) GROUP BY node
    """)
    return "".join(parts)


@register(
    "q_kcore_peeled",
    category="graph",
    cost=2,
    doc=(
        "k-core of the ed1 name graph with a DATA-ADAPTIVE threshold "
        "(k = min initial degree + 2, so the peel provably bites at "
        "every SF), hash-matched against an 8-round UNROLLED peeling "
        "CTE chain — the bounded-iteration oracle form that recursive "
        "CTEs (no aggregates in the recursive term) cannot express. "
        "Spark runs the layer-at-a-time fixpoint (operators/graph.py::"
        "kcore); a peel deeper than 8 layers would diverge from the "
        "oracle and fail loudly. Complements the rows-only q_kcore "
        "(k=2) whose adjudication stays the brute-force property test."
    ),
    oracle=_kcore_unrolled_oracle(_KCORE_ROUNDS),
)
def q_kcore_peeled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_s3_etl_spark.operators.graph import kcore
    from kafka_s3_etl_spark.operators.linkage import fuzzy_pairs_ed1

    canon = (
        fuzzy_pairs_ed1(load_table(spark, sf_dir, "customer"), col="c_name")
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        # Two consumers (threshold scan + the peel loop): materialize
        # the levenshtein self-join once.
        .localCheckpoint()
    )
    min_deg = (
        canon.select(F.col("a").alias("node"))
        .unionAll(canon.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
        .agg(F.min("deg"))
        .first()[0]
    )
    if min_deg is None:
        return canon.select(
            F.col("a").alias("c_name"), F.lit(0).cast("bigint").alias("deg")
        ).limit(0)
    return kcore(canon, k=min_deg + 2).withColumnRenamed("node", "c_name")


# ---------------------------------------------------------------------------
# Batch 22: training-corpus composition + containment dedup + partitioned
# two-phase ranks.
# ---------------------------------------------------------------------------


@register(
    "q_containment_join",
    category="dedup",
    cost=2,
    doc=(
        "Directional set-CONTAINMENT dedup (overlap member of the "
        "PPJoin family) over the exact-deduped corpus: for every doc "
        "whose word set sits >= 90% inside some other doc — the "
        "quote/excerpt/template-instance case Jaccard misses (union "
        "dominated by the container) — emit its BEST container "
        "(argmax shared tokens; exact-integer order since |a| is "
        "fixed per contained doc). Asymmetric prefix filter: the "
        "contained side joins only its rare-first prefix, the "
        "container side full tokens with the |b| >= ceil(t*|a|) size "
        "prune; exact integer cross-multiply verify. The top-1 "
        "rollup bounds OUTPUT by n (the all-pairs emission is "
        "quadratic under template clusters — measured 8.3M directional "
        "pairs at sf0.1); candidate-set cost remains the intrinsic "
        "price of an exact containment join on a dense corpus, which "
        "is why this entry is correctness-tier (cost=2), not headline."
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
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 CAST(COUNT(*) AS BIGINT) AS n_common
          FROM toks a JOIN toks b
            ON b.token = a.token AND b.doc_id != a.doc_id
          GROUP BY 1, 2
        ), hits AS (
          SELECT i.doc_a, i.doc_b, sa.n AS n_a, sb.n AS n_b, i.n_common,
                 CAST(i.n_common AS DOUBLE) / sa.n AS containment
          FROM inter i
          JOIN sz sa ON sa.doc_id = i.doc_a
          JOIN sz sb ON sb.doc_id = i.doc_b
          WHERE 1000 * i.n_common >= 900 * sa.n
        )
        SELECT doc_a, doc_b, n_a, n_b, n_common, containment FROM (
          SELECT *, ROW_NUMBER() OVER (
              PARTITION BY doc_a ORDER BY n_common DESC, doc_b
          ) AS brn FROM hits
        ) WHERE brn = 1
    """,
)
def q_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_s3_etl_spark.operators.dedup import containment_join

    docs = load_table(spark, sf_dir, "documents")
    # exact-dedup first (keep-lowest-id per text, fingerprint-keyed so
    # the shuffle moves 8 bytes, not bodies — the q_simjoin_prefix
    # prefix; the oracle partitions on raw text, identical to ~1e-19)
    w = Window.partitionBy(F.xxhash64("text")).orderBy("doc_id")
    uniq = (
        docs.select("doc_id", "text")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "text")
    )
    pairs = containment_join(uniq, threshold=0.9)
    # Best container per contained doc: |a| is constant within the
    # partition, so argmax containment == argmax n_common — pure
    # integer ordering, no float in the sort key.
    w_best = Window.partitionBy("doc_a").orderBy(
        F.col("n_common").desc(), "doc_b"
    )
    return (
        pairs.withColumn("brn", F.row_number().over(w_best))
        .filter(F.col("brn") == 1)
        .drop("brn")
    )


_CONTAIN_M = 17


@register(
    "q_containment_join_capped",
    category="dedup",
    cost=2,
    doc=(
        "Bounded-cost production twin of q_containment_join (VERDICT "
        "r9 item 3): candidates come from per-TOKEN top-17 container "
        "lists (largest token-set first — overlap cannot exceed |b|, "
        "so the biggest sets are the likeliest containers), a tiny "
        "|vocab|*17 rollup built with the bucketed two-phase rank and "
        "broadcast against the rare-first prefix rows; survivors get "
        "the exact intersection verify. The quadratic candidate set "
        "is never materialized: 85k candidate pairs at sf0.1 vs the "
        "uncapped operator's 15.7M (123.7 s) on this dense "
        "31-token-vocabulary corpus where a df cap keeps nothing "
        "(min df = 250). Recall measured 100% (4992/4992 contained "
        "docs vs uncapped) though the reported best container can "
        "differ. The oracle replays toplists rank-for-rank, so the "
        "driver hash gates the whole capped pipeline."
    ),
    oracle=f"""
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
        ), df AS (
          SELECT token, COUNT(*) AS df FROM toks GROUP BY token
        ), sz AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
          FROM toks GROUP BY doc_id
        ), ranked AS (
          SELECT t.doc_id, t.token, s.n,
                 ROW_NUMBER() OVER (PARTITION BY t.doc_id
                                    ORDER BY d.df, t.token) AS r
          FROM toks t JOIN df d USING (token) JOIN sz s USING (doc_id)
        ), prefix AS (
          SELECT doc_id, token, n FROM ranked
          WHERE r <= n - ((900 * n + 999) // 1000) + 1
        ), toplists AS (
          SELECT token, doc_b, n_b FROM (
            SELECT t.token, t.doc_id AS doc_b, s.n AS n_b,
                   ROW_NUMBER() OVER (PARTITION BY t.token
                       ORDER BY s.n DESC, t.doc_id) AS tr
            FROM toks t JOIN sz s USING (doc_id))
          WHERE tr <= {_CONTAIN_M}
        ), cand AS (
          SELECT DISTINCT p.doc_id AS doc_a, l.doc_b
          FROM prefix p JOIN toplists l USING (token)
          WHERE l.doc_b != p.doc_id AND 1000 * l.n_b >= 900 * p.n
        ), inter AS (
          SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
          FROM cand c
          JOIN toks a ON a.doc_id = c.doc_a
          JOIN toks b ON b.doc_id = c.doc_b AND b.token = a.token
          GROUP BY 1, 2
        ), hits AS (
          SELECT i.doc_a, i.doc_b, sa.n AS n_a, sb.n AS n_b, i.n_common,
                 CAST(i.n_common AS DOUBLE) / sa.n AS containment
          FROM inter i
          JOIN sz sa ON sa.doc_id = i.doc_a
          JOIN sz sb ON sb.doc_id = i.doc_b
          WHERE 1000 * i.n_common >= 900 * sa.n
        )
        SELECT doc_a, doc_b, n_a, n_b, n_common, containment FROM (
          SELECT *, ROW_NUMBER() OVER (
              PARTITION BY doc_a ORDER BY n_common DESC, doc_b
          ) AS brn FROM hits
        ) WHERE brn = 1
    """,
)
def q_containment_join_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_s3_etl_spark.operators.dedup import containment_join_capped

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.xxhash64("text")).orderBy("doc_id")
    uniq = (
        docs.select("doc_id", "text")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "text")
    )
    pairs = containment_join_capped(uniq, threshold=0.9, top_m=_CONTAIN_M)
    w_best = Window.partitionBy("doc_a").orderBy(
        F.col("n_common").desc(), "doc_b"
    )
    return (
        pairs.withColumn("brn", F.row_number().over(w_best))
        .filter(F.col("brn") == 1)
        .drop("brn")
    )


@register(
    "q_decile_transition",
    category="mleval",
    cost=1,
    doc=(
        "Customer spend-decile TRANSITION matrix between the two "
        "halves of the order timeline — the rank-migration mart every "
        "retention team builds. Per-period deciles come from the "
        "PARTITIONED bucketed two-phase rank (operators/ranks.py "
        "partition_by, new r9): even with only 2 period groups each "
        "holding half the corpus, no group funnels through one sort "
        "task — the naive PARTITION BY period NTILE would. Hash-"
        "matched against DuckDB's native partitioned NTILE."
    ),
    oracle="""
        WITH s AS (
          SELECT o_custkey AS k,
                 CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                      THEN 0 ELSE 1 END AS period,
                 SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS c
          FROM orders GROUP BY 1, 2
        ), d AS (
          SELECT k, period,
                 CAST(NTILE(10) OVER (
                     PARTITION BY period ORDER BY c DESC, k
                 ) AS INTEGER) AS decile
          FROM s
        )
        SELECT a.decile AS decile_pre, b.decile AS decile_post,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM d a JOIN d b ON b.k = a.k AND a.period = 0 AND b.period = 1
        GROUP BY 1, 2
    """,
)
def q_decile_transition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_s3_etl_spark.operators.ranks import (
        bucketed_global_row_number,
        ntile_expr,
    )

    orders = load_table(spark, sf_dir, "orders")
    s = (
        orders.select(
            F.col("o_custkey").alias("k"),
            F.expr(
                "CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'"
                " THEN 0 ELSE 1 END"
            ).alias("period"),
            F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("v"),
        )
        .groupBy("k", "period")
        .agg(F.sum("v").alias("c"))
    )
    bounds = s.agg(F.min("c").alias("lo"), F.max("c").alias("hi")).first()
    if bounds is None or bounds.lo is None:
        return s.select(
            F.lit(None).cast("int").alias("decile_pre"),
            F.lit(None).cast("int").alias("decile_post"),
            F.lit(None).cast("bigint").alias("n_customers"),
        ).limit(0)
    width = max(1, (bounds.hi - bounds.lo) // 4096 + 1)
    ranked = bucketed_global_row_number(
        s,
        "c",
        "k",
        shift=-bounds.lo,
        width=width,
        descending=True,
        partition_by=["period"],
    )
    d = ranked.select(
        "k", "period", F.expr(ntile_expr(10)).alias("decile")
    )
    a = d.filter(F.col("period") == 0).select(
        "k", F.col("decile").alias("decile_pre")
    )
    b = d.filter(F.col("period") == 1).select(
        "k", F.col("decile").alias("decile_post")
    )
    return (
        a.join(b, "k")
        .groupBy("decile_pre", "decile_post")
        .agg(F.count("*").cast("bigint").alias("n_customers"))
    )


@register(
    "q_mixture_weights",
    category="prep",
    cost=0,
    doc=(
        "Temperature-sampled corpus mixture (T=2, the multilingual-"
        "training standard: weight_i ~ n_i^(1/2)) with EXACT integer "
        "arithmetic: num_i = floor(sqrt(n_i * 10^4)) (sqrt of an exact "
        "integer is IEEE correctly-rounded on both engines, floor "
        "bit-exact), denominator the exact BIGINT sum, share and "
        "per-doc sampling rate each ONE division of exact integer "
        "products — no cross-row float sum ever enters the hash."
    ),
    oracle="""
        WITH l AS (
          SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY lang
        ), w AS (
          SELECT lang, n_docs,
                 CAST(FLOOR(SQRT(n_docs * 10000)) AS BIGINT) AS num
          FROM l
        ), t AS (
          SELECT lang, n_docs, num,
                 SUM(num) OVER () AS den, SUM(n_docs) OVER () AS total
          FROM w
        )
        SELECT lang, n_docs,
               CAST(num AS DOUBLE) / den AS mix_share,
               CAST(num * total AS DOUBLE) / (den * n_docs)
                   AS sampling_rate
        FROM t
    """,
)
def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
    )
    w = l.select(
        "lang",
        "n_docs",
        F.expr("CAST(FLOOR(SQRT(n_docs * 10000)) AS BIGINT)").alias("num"),
    )
    w_all = Window.partitionBy()
    t = w.select(
        "lang",
        "n_docs",
        "num",
        F.sum("num").over(w_all).alias("den"),
        F.sum("n_docs").over(w_all).alias("total"),
    )
    return t.select(
        "lang",
        "n_docs",
        F.expr("CAST(num AS DOUBLE) / den").alias("mix_share"),
        F.expr(
            "CAST(num * total AS DOUBLE) / (den * n_docs)"
        ).alias("sampling_rate"),
    )


@register(
    "q_length_buckets",
    category="prep",
    cost=0,
    doc=(
        "Length-bucketed batching manifest: documents grouped into "
        "decimal-magnitude word-count buckets (digit count of n_words "
        "— an exact integer-string projection both engines share, no "
        "float log), per bucket the doc count, total words, and the "
        "number of 8192-word training batches (ceil via integer DIV) "
        "— the manifest a length-bucketed dataloader packs from. One "
        "scan, map-side combinable."
    ),
    oracle="""
        WITH d AS (
          SELECT CAST(LENGTH(CAST(len(string_split(text, ' ')) AS VARCHAR))
                      AS INTEGER) AS bucket,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words
          FROM documents
        )
        SELECT bucket,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_words) AS BIGINT) AS total_words,
               CAST((SUM(n_words) + 8191) // 8192 AS BIGINT) AS n_batches
        FROM d GROUP BY bucket
    """,
)
def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        F.expr(
            "CAST(LENGTH(CAST(size(split(text, ' ')) AS STRING)) AS INT)"
        ).alias("bucket"),
        F.expr("CAST(size(split(text, ' ')) AS BIGINT)").alias("n_words"),
    )
    return d.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("total_words"),
        F.expr("CAST((SUM(n_words) + 8191) DIV 8192 AS BIGINT)").alias(
            "n_batches"
        ),
    )
