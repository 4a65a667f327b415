"""Graph-structure depth (round 7, batch 8d) over the edit-distance-1
customer-name graph (the same linkage graph q_fuzzy_join /
q_graph_triangles analyze — edges via operators/linkage.py's
deletion-neighborhood blocking, oracle edges via DuckDB levenshtein):

* q_degree_distribution — the degree histogram, THE first diagnostic
  on any large graph (spot hubs before running wedge-quadratic ops;
  the capped linkage variants' max_degree knob is chosen from exactly
  this output). Two map-side-combinable aggregations over the edge
  list — no joins at all.
* q_jaccard_neighbors — common-neighbor (Jaccard) link prediction:
  score NON-adjacent pairs by |N(u) & N(v)| / |N(u) | N(v)|. Candidate
  pairs come from the wedge join (only pairs with >= 1 common neighbor
  are ever materialized, never the n^2 pair space); the union size is
  deg(u)+deg(v)-common, so the score is one division of exact BIGINTs.
  On a linkage graph this surfaces "transitively confusable" name
  pairs the pairwise matcher missed. DEGREE-CAPPED (r7 verdict): a
  hub of degree d pivots deg^2 wedge candidates, the exact shape whose
  uncapped sibling measured 19.1x at 30x data (SCALE.md triangles
  table), so nodes above MAX_DEGREE are dropped by broadcast anti-join
  BEFORE the wedge join — the same knob as q_graph_triangles_capped —
  and the scores are EXACT on the induced subgraph (degrees recomputed
  after the drop, so every reported jaccard is the true jaccard of the
  surviving graph). Wedge candidates are bounded by m*cap on any skew.
* q_kcore — the 2-core membership + in-core degree
  (operators/graph.py::kcore): layer-at-a-time peeling, one degree agg
  + two semi-joins per round, rounds = peeling depth (not O(n)).
  Iterative-to-fixpoint, hence rows-only + the brute-force peel
  property test (tests/test_mining_ops.py) — same adjudication as
  connected components / PageRank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_s3_etl_spark.operators.graph import jaccard_neighbors, kcore
from kafka_s3_etl_spark.operators.linkage import fuzzy_pairs_ed1
from kafka_s3_etl_spark.plans.mining import _FUZZY_ORACLE_EDGES
from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table


def _name_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fuzzy_pairs_ed1(
        load_table(spark, sf_dir, "customer"), col="c_name"
    ).select("a", "b")


@register(
    "q_degree_distribution",
    category="graph",
    cost=1,
    doc=(
        "Degree histogram of the edit-distance-1 name graph: endpoint "
        "explode -> per-node degree -> per-degree node count. Two "
        "map-side-combined aggregations, no joins."
    ),
    oracle=_FUZZY_ORACLE_EDGES
    + """
        , deg AS (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS deg
          FROM (SELECT a AS node FROM e
                UNION ALL SELECT b AS node FROM e)
          GROUP BY node
        )
        SELECT deg, CAST(COUNT(*) AS BIGINT) AS n_nodes
        FROM deg GROUP BY deg
    """,
)
def q_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _name_edges(spark, sf_dir)
    # Endpoint explode in ONE pass over the edit-distance pipeline —
    # the unionAll-of-two-projections shape executed it twice (r14:
    # 16 Exchanges / 8 parquet scans in the before-plan).
    deg = (
        edges.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("deg"))
    )
    return deg.groupBy("deg").agg(
        F.count("*").cast("bigint").alias("n_nodes")
    )


# Degree cap for the wedge join (same knob/value as
# q_graph_triangles_capped): wedge candidates <= m*cap on any skew.
_JACCARD_MAX_DEGREE = 40


@register(
    "q_jaccard_neighbors",
    category="graph",
    cost=1,
    doc=(
        "Common-neighbor Jaccard link prediction on the ed1 name "
        "graph, degree-capped: hubs above max_degree drop by broadcast "
        "anti-join BEFORE the wedge join (candidates <= m*cap on any "
        "skew — the uncapped wedge measured 19.1x at 30x data), wedge "
        "join materializes only pairs with >= 1 shared neighbor, "
        "anti-join drops already-adjacent pairs, score = common / "
        "(deg_u + deg_v - common) over exact BIGINTs — EXACT on the "
        "induced subgraph of sub-cap nodes."
    ),
    oracle=_FUZZY_ORACLE_EDGES
    + f"""
        , pre AS (
          SELECT node, COUNT(*) AS deg
          FROM (SELECT a AS node FROM e
                UNION ALL SELECT b AS node FROM e)
          GROUP BY node
        ), hubs AS (
          SELECT node FROM pre WHERE deg > {_JACCARD_MAX_DEGREE}
        ), e2 AS (
          SELECT a, b FROM e
          WHERE a NOT IN (SELECT node FROM hubs)
            AND b NOT IN (SELECT node FROM hubs)
        )"""
    + """
        , sym AS (
          SELECT a AS u, b AS p FROM e2
          UNION ALL SELECT b AS u, a AS p FROM e2
        ), cw AS (
          SELECT s1.u AS x, s2.u AS y, CAST(COUNT(*) AS BIGINT) AS n_common
          FROM sym s1 JOIN sym s2 ON s1.p = s2.p AND s1.u < s2.u
          GROUP BY 1, 2
        ), deg AS (
          SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg
          FROM sym GROUP BY u
        )
        SELECT cw.x AS name_a, cw.y AS name_b, cw.n_common,
               CAST(cw.n_common AS DOUBLE)
                   / (dx.deg + dy.deg - cw.n_common) AS jaccard
        FROM cw
        JOIN deg dx ON dx.node = cw.x
        JOIN deg dy ON dy.node = cw.y
        WHERE NOT EXISTS (
          SELECT 1 FROM e2 WHERE e2.a = cw.x AND e2.b = cw.y)
    """,
)
def q_jaccard_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jaccard_neighbors(
        _name_edges(spark, sf_dir), max_degree=_JACCARD_MAX_DEGREE
    )


@register(
    "q_kcore",
    category="graph",
    cost=2,
    doc=(
        "2-core of the ed1 name graph: layer-at-a-time peeling to the "
        "fixpoint (operators/graph.py::kcore), returning core members "
        "with their in-core degree. Iterative, hence rows-only; "
        "equality with sequential brute-force peeling is "
        "property-tested."
    ),
)
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kcore(_name_edges(spark, sf_dir), k=2).withColumnRenamed(
        "node", "c_name"
    )
