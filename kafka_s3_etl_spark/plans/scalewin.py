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
