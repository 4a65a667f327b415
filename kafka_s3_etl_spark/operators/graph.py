"""Iterative graph operators over document-similarity graphs.

PageRank complements ``operators/dedup.py``'s connected components: CC
answers "which docs are the same content", PageRank answers "which docs
are central in the near-dup/citation graph" — the centrality signal a
curation pipeline uses to pick the canonical representative of a
cluster (keep the hub, drop the satellites).

Spark-first iterative shape (the Pregel-lite pattern, same discipline
as connected_components):

* per-iteration cost is one groupBy shuffle on dst + one join on src —
  both partition on node id, so a 100 TB edge list iterates at the cost
  of `iters` hash aggregations;
* ``localCheckpoint`` after every iteration cuts the lineage (iterative
  join plans otherwise nest `iters` deep and analysis time explodes);
* dangling mass (nodes with no out-edges) is redistributed uniformly
  each iteration via a 1-row aggregate broadcast, keeping the rank a
  proper probability distribution (sums to 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    pairs: DataFrame,
    nodes: DataFrame,
    alpha: float = 0.85,
    iters: int = 10,
) -> DataFrame:
    """PageRank on an undirected pair list (each pair contributes both
    directions). ``pairs`` is (doc_a, doc_b); ``nodes`` is one doc_id
    per document (isolated nodes keep teleport-only rank). The ranked
    node set is ``nodes`` UNION all pair endpoints, so a pair endpoint
    missing from ``nodes`` still holds (and emits) its rank mass rather
    than silently draining the distribution.

    Returns (doc_id, rank) with sum(rank) == 1 up to float error.
    Deterministic for a fixed graph and iteration count.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    edges = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    degrees = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # Symmetrized edges carry every endpoint in src, so one union covers
    # both columns of `pairs`.
    base = (
        nodes.select(F.col("doc_id").alias("node"))
        .unionByName(edges.select(F.col("src").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n_nodes = base.count()
    if n_nodes == 0:
        raise ValueError("pagerank: nodes is empty; nothing to rank")
    ranks = base.withColumn("rank", F.lit(1.0 / n_nodes)).localCheckpoint()

    for _ in range(iters):
        contribs = (
            edges.join(ranks, edges.src == ranks.node)
            .join(degrees, "src")
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inflow"))
        )
        # Mass parked on dangling nodes (no out-edges) teleports
        # uniformly; computed as 1 - mass actually emitted.
        emitted = (
            ranks.join(degrees, ranks.node == degrees.src, "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("m"))
        )
        ranks = (
            base.join(contribs, base.node == contribs.dst, "left")
            .crossJoin(F.broadcast(emitted))
            .select(
                "node",
                (
                    (1.0 - alpha) / n_nodes
                    + alpha
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + (1.0 - F.col("m")) / n_nodes
                    )
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select(F.col("node").alias("doc_id"), "rank")
