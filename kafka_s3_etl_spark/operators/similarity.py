"""Similarity search over an embedding column (SURVEY.md 2b q_sim_*).

Two paths, same answer shape (query_id, neighbor_id, cosine, rank):

* brute-force — exact cosine top-k: broadcast the (small) query set,
  JVM-side dot product via zip_with + aggregate (no Python, no UDF),
  window top-k per query. The right baseline at any scale where
  |queries| is small: one scan of the corpus, no shuffle of the corpus
  itself (the window partitions by query).
* LSH-bucketed ANN — sign-random-projection (Charikar '02): P
  deterministic pseudo-random hyperplanes (entry signs derived from
  xxhash64(plane, dim) so no RNG state is shipped), each vector maps
  to a P-bit bucket; candidates = same-bucket pairs, then exact cosine
  re-rank. The 100 TB path: bucket join is an equi shuffle; multiple
  hash tables (OR-amplification) raise recall — table count is the
  only knob.

Embeddings are float32 arrays; all math is cast to double, computed
with identical association order on both sides of any comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Plane/table counts trade bucket size against recall: P planes cut the
# corpus into 2^P buckets per table (candidate cost ~N/2^P per query);
# T tables OR-amplify recall to 1-(1-c^P)^T where c = 1 - theta/pi.
# Defaults sized for the synthetic corpus, whose true top-5 neighbors sit
# at cosine ~0.3 (c ~0.6): 4 planes x 8 tables -> ~0.7 expected recall.
# A production corpus with tighter clusters (c ~0.9) would raise planes
# to 12-16 with the same table count.
ANN_PLANES = 4
ANN_TABLES = 8


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def with_norm(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("norm")
    )


def brute_force_topk(
    embeddings: DataFrame, n_queries: int = 8, k: int = 5
) -> DataFrame:
    """Exact cosine top-k of every corpus vector for the first
    ``n_queries`` vec_ids (the query set is broadcast)."""
    base = with_norm(embeddings)
    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    scored = base.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (
            _dot(F.col("q_emb"), F.col("embedding"))
            / (F.col("q_norm") * F.col("norm"))
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _bucket_bits(emb: Column, table: int, planes: int = ANN_PLANES) -> Column:
    """P-bit sign-random-projection bucket for one hash table.

    Hyperplane entry h[p][d] = +1/-1 from the parity of
    xxhash64(table, p, d) — deterministic, computed inline, no
    broadcast state.
    """
    bits: Column = F.lit(0).cast("bigint")
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(
                emb,
                F.sequence(F.lit(0), F.size(emb) - 1),
                lambda v, d: v.cast("double")
                * F.when(
                    F.pmod(F.xxhash64(F.lit(table), F.lit(p), d), 2) == 0, 1.0
                ).otherwise(-1.0),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits = bits + F.when(proj > 0, F.lit(2**p).cast("bigint")).otherwise(0)
    return bits


def ann_lsh_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    planes: int = ANN_PLANES,
    tables: int = ANN_TABLES,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in any of
    ``tables`` hash tables; exact cosine re-rank of candidates only."""
    base = with_norm(embeddings)
    bucketed = base.select(
        "vec_id",
        "embedding",
        "norm",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("table_id"),
                        _bucket_bits(F.col("embedding"), t, planes).alias("bucket"),
                    )
                    for t in range(tables)
                ]
            )
        ).alias("b"),
    ).select("vec_id", "embedding", "norm", "b.table_id", "b.bucket")
    queries = bucketed.filter(F.col("vec_id") < n_queries)
    cands = (
        bucketed.alias("c")
        .join(
            F.broadcast(queries.alias("q")),
            (F.col("c.table_id") == F.col("q.table_id"))
            & (F.col("c.bucket") == F.col("q.bucket"))
            & (F.col("c.vec_id") != F.col("q.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            (
                _dot(F.col("q.embedding"), F.col("c.embedding"))
                / (F.col("q.norm") * F.col("c.norm"))
            ).alias("cosine"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Cosine near-dup pairs among consecutive vec_ids (the verification
    stage shape; generalizes by swapping the pair source to LSH)."""
    base = with_norm(embeddings)
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            (
                _dot(F.col("a.embedding"), F.col("b.embedding"))
                / (F.col("a.norm") * F.col("b.norm"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
