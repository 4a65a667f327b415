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

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Plane/table counts trade bucket size against recall: P planes cut the
# corpus into 2^P buckets per table (candidate cost ~N/2^P per query);
# T tables OR-amplify recall to 1-(1-c^P)^T where c = 1 - theta/pi.
# The floor is sized for the synthetic corpus, whose true top-5
# neighbors sit at cosine ~0.3 (c ~0.6): 4 planes x 8 tables -> ~0.7
# expected recall. ``ann_lsh_topk`` scales planes UP with corpus size
# (see _auto_planes) so mean bucket occupancy — hence candidate cost per
# query — stays bounded as the corpus grows; a fixed plane count makes
# candidate sets grow linearly with corpus density (measured: the r3
# corpus regeneration alone cost 3.2x on a fixed 16-bucket layout).
ANN_PLANES = 4
ANN_TABLES = 8
ANN_TARGET_BUCKET = 64  # target mean vectors per bucket
ANN_MAX_PLANES = 16  # 65k buckets per table; past this, raise tables


def _auto_planes(n_vectors: int) -> int:
    """planes ≈ log2(n / target_bucket), clamped to [ANN_PLANES, 16]."""
    if n_vectors <= ANN_TARGET_BUCKET:
        return ANN_PLANES
    return max(
        ANN_PLANES,
        min(ANN_MAX_PLANES, math.ceil(math.log2(n_vectors / ANN_TARGET_BUCKET))),
    )


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


_SIGN_CACHE: dict[tuple[int, int, int], list[list[list[float]]]] = {}


def _plane_signs(tables: int, planes: int, dim: int) -> list[list[list[float]]]:
    """Hyperplane entry h[t][p][d] = +1/-1 from a seeded driver-side RNG
    — deterministic per (tables, planes, dim), cached for the session.

    The signs are pure config data shipped to executors as a broadcast
    DataFrame (see ``_sign_table``), so nothing about their derivation
    needs to be reproducible JVM-side; an earlier version derived them
    with a tiny Spark job (xxhash64 parity over a combos DataFrame),
    which billed ~3s of scheduler/codegen time to the first ANN query of
    every session for a matrix numpy materializes in microseconds."""
    key = (tables, planes, dim)
    if key not in _SIGN_CACHE:
        import numpy as np

        rng = np.random.default_rng(42)
        signs = np.where(
            rng.random((tables, planes, dim)) < 0.5, 1.0, -1.0
        )
        _SIGN_CACHE[key] = signs.tolist()
    return _SIGN_CACHE[key]


def _sign_table(spark, tables: int, planes: int, dim: int) -> DataFrame:
    """The hyperplane matrix as a TINY DataFrame: one row per hash
    table, one array<double> column per plane. Broadcast-crossed with
    the corpus it both fans each vector out to its ``tables`` rows
    (replacing an explode) and delivers the signs as DATA.

    Why data and not plan constants: embedding the 2048 sign literals
    in the expression tree costs one py4j round-trip per literal at
    build time and blows up analysis/codegen (measured: the whole ANN
    query became data-independent ~10s of pure driver overhead, at
    sf0.001 and sf0.1 alike). An 8-row broadcast costs none of that at
    any corpus size.
    """
    signs = _plane_signs(tables, planes, dim)
    rows = [
        tuple([t] + [signs[t][p] for p in range(planes)]) for t in range(tables)
    ]
    schema = "table_id int, " + ", ".join(
        f"s{p} array<double>" for p in range(planes)
    )
    return spark.createDataFrame(rows, schema)


def _bucket_bits(emb: Column, planes: int = ANN_PLANES) -> Column:
    """P-bit sign-random-projection bucket for one hash table; reads
    the plane sign vectors from the ``s{p}`` columns a ``_sign_table``
    cross join provides.

    The projection folds ``zip_with(emb, s_p, v*s)`` — the per-element
    lambda is a bare multiply. Deriving the sign inline (xxhash64 +
    branch per element, the original shape) made the interpreted lambda
    ~20x more expensive and dominated the whole ANN query. Multiplying
    by exactly +/-1.0 is lossless, so buckets are bit-identical to the
    inline-hash derivation.
    """
    bits: Column = F.lit(0).cast("bigint")
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(emb, F.col(f"s{p}"), lambda v, s: v.cast("double") * s),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits = bits + F.when(proj > 0, F.lit(2**p).cast("bigint")).otherwise(0)
    return bits


def ann_lsh_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    planes: int | None = None,
    tables: int = ANN_TABLES,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in any of
    ``tables`` hash tables; exact cosine re-rank of candidates only.

    ``planes=None`` derives the plane count from the corpus size
    (one metadata-cheap count) so bucket occupancy stays ~constant as
    the corpus scales; pass an explicit count to pin the layout.

    The corpus is fanned out to its ``tables`` bucket rows by a cross
    join against the broadcast 8-row sign table (see ``_sign_table``) —
    the same tables-x blowup an explode would produce, but the
    hyperplanes arrive as data, keeping the plan small."""
    if planes is None:
        planes = _auto_planes(embeddings.count())
    dim = embeddings.select(F.size("embedding")).first()[0]
    sign_df = _sign_table(embeddings.sparkSession, tables, planes, dim)
    base = with_norm(embeddings)
    bucketed = base.crossJoin(F.broadcast(sign_df)).select(
        "vec_id",
        "embedding",
        "norm",
        "table_id",
        _bucket_bits(F.col("embedding"), planes).alias("bucket"),
    )
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


IVF_CELLS = 16
IVF_PROBE = 4


def _lloyd_numpy(sample, k: int, iters: int = 8, seed: int = 42):
    """Deterministic Lloyd's k-means on the driver-side fit sample.

    A coarse quantizer needs only ~tens of points per cell, so the fit
    input is a few hundred KB even when the corpus is 100 TB — fitting
    it in-process on a collected sample is the production shape (FAISS
    trains IVF quantizers the same way) and avoids an iterative
    distributed-ML job (8+ jobs of pure scheduling overhead here, and
    under a vanilla 200-shuffle-partition driver session, the round-1
    correctness-sweep killer). Empty cells keep their previous centroid.
    """
    import numpy as np

    X = np.asarray(sample, dtype=np.float64)
    rng = np.random.default_rng(seed)
    cent = X[rng.choice(len(X), size=k, replace=False)]
    for _ in range(iters):
        d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            members = X[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return cent


def ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    n_cells: int = IVF_CELLS,
    n_probe: int = IVF_PROBE,
) -> DataFrame:
    """IVF (inverted-file) ANN: k-means coarse quantizer partitions the
    corpus into cells; each query probes only its ``n_probe`` nearest
    cells and exact-cosine re-ranks the candidates.

    Scale shape: the quantizer fits on a SAMPLE, never the corpus — the
    fit input is capped at ``64 * n_cells`` vectors (deterministic
    prefix by vec_id) collected to the driver and fit with in-process
    Lloyd's (see ``_lloyd_numpy``). Corpus assignment is a broadcast
    join against the tiny centroid table + one argmin window per vector
    — pure JVM expressions, one corpus pass, no shuffle of the corpus.
    The probe is a broadcast equi join on cell id touching
    ~n_probe/n_cells of the corpus per query. At 100 TB raise
    n_cells ~ sqrt(N); the fit stays O(sample), everything else is
    unchanged.
    """
    spark = embeddings.sparkSession
    base = with_norm(embeddings)
    sample = [
        r.embedding
        for r in base.filter(F.col("vec_id") < 64 * n_cells)
        .select("embedding")
        .collect()
    ]
    if not sample:
        # vec_ids need not start at 0; fall back to an unfiltered capped
        # prefix so the quantizer always has fit input.
        sample = [
            r.embedding for r in base.select("embedding").limit(64 * n_cells).collect()
        ]
    if not sample:
        raise ValueError("ivf_topk: embeddings corpus is empty; nothing to fit")
    # Lloyd's seeds k distinct points, so the cell count can never exceed
    # the fit-sample size (tiny corpora would otherwise crash the fit).
    n_cells = min(n_cells, len(sample))
    n_probe = min(n_probe, n_cells)
    cent = _lloyd_numpy(sample, k=n_cells)
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cent)],
        "cell int, centroid array<double>",
    )

    sq_dist = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("centroid"),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    cell_rank = Window.partitionBy("vec_id").orderBy(F.col("dist").asc(), F.col("cell"))
    assigned = (
        base.crossJoin(F.broadcast(centroids))
        .select("vec_id", "embedding", "norm", "cell", sq_dist.alias("dist"))
        .withColumn("rn", F.row_number().over(cell_rank))
        .filter(F.col("rn") == 1)
        .select("vec_id", "embedding", "norm", "cell")
    )
    queries = assigned.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    dist_rank = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("cell")
    )
    probe_cells = (
        queries.crossJoin(F.broadcast(centroids))
        .select(
            "query_id",
            "q_emb",
            "q_norm",
            "cell",
            F.aggregate(
                F.zip_with(
                    F.col("q_emb"),
                    F.col("centroid"),
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("dist"),
        )
        .withColumn("cell_rank", F.row_number().over(dist_rank))
        .filter(F.col("cell_rank") <= n_probe)
        .select("query_id", "q_emb", "q_norm", "cell")
    )
    cands = assigned.join(
        F.broadcast(probe_cells),
        (assigned.cell == probe_cells.cell)
        & (assigned.vec_id != probe_cells.query_id),
    ).select(
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
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_dups(embeddings: DataFrame, threshold: float = 0.95) -> DataFrame:
    """Cosine near-dup pairs among consecutive vec_ids — the
    verification-stage MATH only, kept as the property-test fixture for
    the real operator (``embedding_near_dups_ann``), whose candidate
    source is LSH buckets instead of id adjacency."""
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


def embedding_near_dups_ann(
    embeddings: DataFrame,
    threshold: float = 0.95,
    planes: int | None = None,
    tables: int = ANN_TABLES,
) -> DataFrame:
    """Embedding-cosine near-dup pairs with a REAL ANN candidate source:
    sign-random-projection LSH buckets (the ``ann_lsh_topk`` machinery —
    same ``_sign_table`` broadcast, same ``_bucket_bits`` fold), then an
    exact-cosine verify of the candidate pairs only.

    This is the operator a 100 TB embedding dedup actually runs — the
    consecutive-id variant (``embedding_near_dups``) checks only
    adjacent rows and would miss every non-adjacent duplicate:

    1. bucket: one corpus pass fans each vector to its ``tables`` rows
       (broadcast cross join against the 8-row sign table) and computes
       the P-bit bucket — map-only JVM expressions, no Python.
    2. candidates: self-join the SLIM (vec_id, table_id, bucket)
       projection on (table_id, bucket) with vec_a < vec_b, then
       DISTINCT on the id pair — embeddings never ride through the
       self-join or the distinct, only 8-byte ids do. The join is an
       equi shuffle on bucket; ``shuffle_hash`` because nothing
       downstream wants the sort order.
    3. verify: join the raw vectors back by id (twice) and keep pairs
       with exact double cosine >= threshold.

    Recall is the LSH OR-amplification 1-(1-c^P)^T with c = 1-theta/pi:
    for true near-dups (cosine -> 1) it approaches 1 (0.95 -> ~99.7% at
    P=6, T=8); pairs far below the threshold rarely even become
    candidates — which is the point. Exactness of the verify stage and
    recall on planted duplicates are property-tested
    (tests/test_llm_ops.py).

    Returns (vec_a, vec_b, cosine) with vec_a < vec_b, deduplicated
    across hash tables. Deterministic: the hyperplanes are the seeded
    ``_plane_signs`` matrix, so the candidate set is a pure function of
    the corpus and (planes, tables).

    ``planes=None`` derives the plane count from the corpus size
    (``_auto_planes``) so per-bucket candidate pairs stay ~constant as
    the corpus grows — the production setting. The registered
    q_dedup_embedding PINS planes instead, because its DuckDB oracle
    replays the hyperplane matrix as literals and must see the same
    bucket layout at every SF; a pinned layout's candidate work grows
    ~quadratically with bucket occupancy, which is the oracle-parity
    price, not the operator's.
    """
    spark = embeddings.sparkSession
    if planes is None:
        planes = _auto_planes(embeddings.count())
    dim_row = embeddings.select(F.size("embedding")).first()
    if dim_row is None:
        raise ValueError(
            "embedding_near_dups_ann: embeddings corpus is empty"
        )
    dim = dim_row[0]
    sign_df = _sign_table(spark, tables, planes, dim)
    # Materialize the slim (vec_id, table_id, bucket) relation ONCE:
    # the self-join below references it twice, and a DataFrame
    # reference is a plan COPY — un-checkpointed, each side re-ran the
    # corpus scan + the tables x planes sign-projection fold (the
    # expensive kernel of this operator). r15; guide §2.4.
    buckets = (
        embeddings.crossJoin(F.broadcast(sign_df))
        .select(
            "vec_id",
            "table_id",
            _bucket_bits(F.col("embedding"), planes).alias("bucket"),
        )
        .localCheckpoint()
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b.hint("shuffle_hash"),
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
        )
        .distinct()
    )
    base = with_norm(embeddings)
    ea = base.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("e_a"),
        F.col("norm").alias("n_a"),
    )
    eb = base.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("e_b"),
        F.col("norm").alias("n_b"),
    )
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            (
                _dot(F.col("e_a"), F.col("e_b"))
                / (F.col("n_a") * F.col("n_b"))
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _pca_fit_numpy(sample, k: int):
    """Deterministic PCA fit on the driver-side sample: center, SVD,
    keep the top-k right singular vectors. Sign-fixed so the result is
    reproducible across runs/BLAS builds: each component is flipped to
    make its largest-|.|-magnitude entry positive (ties broken by the
    lowest index, which argmax already guarantees).

    Same scale argument as the IVF quantizer fit (`_lloyd_numpy`): a
    projection basis needs only a representative sample — sklearn/FAISS
    PCA-reduce train the matrix the same way — so the fit input stays a
    few hundred KB at any corpus size and no distributed-ML job runs.
    Returns (mean, components) as plain nested lists.
    """
    import numpy as np

    X = np.asarray(sample, dtype=np.float64)
    mean = X.mean(axis=0)
    _, _, vt = np.linalg.svd(X - mean, full_matrices=False)
    comps = vt[:k]
    for i in range(comps.shape[0]):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean.tolist(), [c.tolist() for c in comps]


def pca_project(
    embeddings: DataFrame, k: int = 4, fit_cap: int = 4096
) -> DataFrame:
    """Project the embedding column onto its top-k principal components
    — the dimensionality-reduction stage a training-data pipeline runs
    before ANN indexing / clustering (FAISS's PCAMatrix pre-transform).

    Fit: driver-side numpy SVD on a deterministic capped sample
    (vec_id prefix, same convention as `ivf_topk`). Apply: the mean and
    the k x d component matrix ride into the plan as ONE broadcast row
    (never thousands of literals — the LSH lesson), and the projection
    is a map-only JVM expression: proj[i] = dot(embedding - mean,
    comp[i]) via nested zip_with/aggregate. No shuffle, no Python on
    the corpus path, one scan; at 100 TB this is embarrassingly
    parallel and the fit cost is unchanged.

    Returns (vec_id, proj array<double> length k).
    """
    spark = embeddings.sparkSession
    sample = [
        r.embedding
        for r in embeddings.filter(F.col("vec_id") < fit_cap)
        .select("embedding")
        .collect()
    ]
    if not sample:
        sample = [
            r.embedding
            for r in embeddings.select("embedding").limit(fit_cap).collect()
        ]
    if not sample:
        raise ValueError("pca_project: embeddings corpus is empty; nothing to fit")
    k = min(k, len(sample[0]), len(sample))
    mean, comps = _pca_fit_numpy(sample, k)
    basis = spark.createDataFrame(
        [(mean, comps)], "mu array<double>, comps array<array<double>>"
    )
    # centered is re-inlined into each component's dot by CollapseProject
    # (HOFs get no CSE) — k * d extra subtractions per row, accepted:
    # still map-only and far under one extra column shuffle.
    centered = F.zip_with(
        F.col("embedding"), F.col("mu"), lambda a, b: a.cast("double") - b
    )
    proj = F.transform(
        F.col("comps"),
        lambda c: F.aggregate(
            F.zip_with(centered, c, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    return embeddings.crossJoin(F.broadcast(basis)).select(
        "vec_id", proj.alias("proj")
    )


PQ_SUBSPACES = 4  # M: subvectors per embedding
PQ_CODES = 16  # K: centroids per sub-codebook (a 4-bit code)
PQ_RERANK = 48  # ADC shortlist size handed to the exact re-rank


def pq_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    m_subspaces: int = PQ_SUBSPACES,
    n_codes: int = PQ_CODES,
    rerank: int = PQ_RERANK,
) -> DataFrame:
    """Product-quantization ANN (Jegou et al., TPAMI'11) — the
    memory-bound regime IVF/LSH don't cover: the corpus is stored as
    M small codes per vector (here 4x4 bits vs 64 floats, a ~32x
    compression), queries scan the CODES with an asymmetric-distance
    lookup table, and only an ADC shortlist of ``rerank`` candidates
    per query touches the raw vectors for the exact cosine re-rank.

    Spark shape (same discipline as ``ivf_topk``):
    * fit — per-subspace codebooks via deterministic driver-side
      Lloyd's on a capped sample (``_lloyd_numpy``; FAISS trains PQ
      the same way). The codebook table is M*K rows — broadcast-size
      at any corpus scale.
    * encode — one corpus pass: broadcast-join the codebook, argmin
      window per (vector, subspace); the encoded corpus is (vec_id,
      sub, code) rows, M per vector, all JVM expressions.
    * ADC — per query, a LUT of query-subvector -> centroid squared
      distances (n_queries*M*K rows, built by one broadcast
      crossJoin); the code scan joins the LUT on (sub, code) and
      map-side-combines SUM over the M subspaces — approximate
      distances with NO per-vector float math, the whole point of PQ.
    * re-rank — top ``rerank`` by (adc, neighbor_id) per query, then
      exact cosine against the raw vectors for the final top-k, so
      reported cosines are TRUE cosines (rows-only entry: the ADC
      ordering is quantization-dependent; recall + true-cosine
      properties are pinned in tests).

    At 100 TB: the raw corpus is touched once (encode) and then only
    by shortlists; the code table is M bytes-per-vector — the scan
    that serves queries is ~1/32 the IO of the raw corpus.
    """
    spark = embeddings.sparkSession
    base = with_norm(embeddings)
    dim_row = base.select(F.size("embedding").alias("d")).first()
    if dim_row is None:
        raise ValueError("pq_topk: embeddings corpus is empty; nothing to fit")
    dim = dim_row.d
    if dim % m_subspaces != 0:
        raise ValueError(
            f"pq_topk: dim {dim} not divisible by m_subspaces {m_subspaces}"
        )
    sub_d = dim // m_subspaces
    sample = [
        r.embedding
        for r in base.select("embedding").limit(64 * n_codes).collect()
    ]
    n_codes = min(n_codes, len(sample))
    import numpy as np

    S = np.asarray(sample, dtype=np.float64)
    rows = []
    for m in range(m_subspaces):
        cent = _lloyd_numpy(S[:, m * sub_d : (m + 1) * sub_d], k=n_codes)
        rows += [
            (m, c, [float(x) for x in cent[c]]) for c in range(n_codes)
        ]
    codebook = spark.createDataFrame(
        rows, "sub int, code int, centroid array<double>"
    )

    # encode: slice each vector into its M subvectors (one explode),
    # broadcast-join the codebook, keep the argmin code per subspace
    subs = base.select(
        "vec_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {m_subspaces - 1}), m ->"
                f" struct(m AS sub, slice(embedding, m * {sub_d} + 1,"
                f" {sub_d}) AS sv))"
            )
        ).alias("s"),
    ).select("vec_id", "s.sub", "s.sv")
    sq = F.aggregate(
        F.zip_with(
            F.col("sv"),
            F.col("centroid"),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    code_rank = Window.partitionBy("vec_id", "sub").orderBy(
        F.col("d2").asc(), F.col("code")
    )
    codes = (
        subs.join(F.broadcast(codebook), "sub")
        .select("vec_id", "sub", "code", sq.alias("d2"))
        .withColumn("rn", F.row_number().over(code_rank))
        .filter(F.col("rn") == 1)
        .select("vec_id", "sub", "code")
    )

    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    q_subs = queries.select(
        "query_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {m_subspaces - 1}), m ->"
                f" struct(m AS sub, slice(q_emb, m * {sub_d} + 1,"
                f" {sub_d}) AS sv))"
            )
        ).alias("s"),
    ).select("query_id", "s.sub", "s.sv")
    lut = q_subs.join(F.broadcast(codebook), "sub").select(
        "query_id", "sub", "code", sq.alias("d2")
    )
    # ADC scan: codes ⋈ broadcast LUT, map-side-combined SUM over subs
    adc = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2").alias("adc"))
    )
    short_w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("vec_id")
    )
    shortlist = (
        adc.withColumn("srn", F.row_number().over(short_w))
        .filter(F.col("srn") <= rerank)
        .select("query_id", "vec_id")
    )
    # exact re-rank of the shortlist only
    cands = (
        shortlist.join(base, "vec_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                _dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_norm") * F.col("norm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivfpq_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    n_cells: int = IVF_CELLS,
    n_probe: int = IVF_PROBE,
    m_subspaces: int = PQ_SUBSPACES,
    n_codes: int = PQ_CODES,
    rerank: int = PQ_RERANK,
) -> DataFrame:
    """IVF-PQ with RESIDUAL encoding (Jegou et al. TPAMI'11 section
    IV-B) — the FAISS IndexIVFPQ production composition of the two
    standalone indexes this module already ships: the coarse quantizer
    routes vectors to cells AND the PQ codebooks quantize the residual
    (v - centroid), which is what makes the codes sharp enough to rank
    inside a cell; a query probes only its ``n_probe`` nearest cells
    with a PER-(query, cell) ADC lookup table built from the QUERY's
    residual against that cell.

    Spark shape (the ``ivf_topk``/``pq_topk`` discipline composed):
    * fit — one capped driver-side sample fits the coarse centroids
      (``_lloyd_numpy``), assigns the sample, and fits per-subspace
      codebooks on the sample RESIDUALS. Both tables are broadcast-
      size at any corpus scale; no distributed ML job.
    * encode — one corpus pass: broadcast-centroid argmin assignment,
      residual via ``zip_with`` subtract, per-subspace argmin code —
      the stored index is (vec_id, cell, sub, code), M small ints per
      vector (~32x smaller than the raw corpus).
    * probe — per query, residual LUTs for its n_probe cells
      (n_queries * n_probe * M * K rows, broadcast); the code scan
      joins the LUT on (cell, sub, code) — so only probed cells'
      codes participate — and map-side-combines SUM over subspaces.
    * re-rank — top ``rerank`` by ADC, exact cosine on the raw
      vectors for the final top-k (reported cosines are TRUE).

    Rows-only entry (quantization-dependent ordering); recall and
    true-cosine properties pinned in tests/test_llm_ops.py.
    """
    import numpy as np

    spark = embeddings.sparkSession
    base = with_norm(embeddings)
    dim_row = base.select(F.size("embedding").alias("d")).first()
    if dim_row is None:
        raise ValueError("ivfpq_topk: embeddings corpus is empty")
    dim = dim_row.d
    if dim % m_subspaces != 0:
        raise ValueError(
            f"ivfpq_topk: dim {dim} not divisible by m_subspaces"
            f" {m_subspaces}"
        )
    sub_d = dim // m_subspaces

    sample = [
        r.embedding
        for r in base.select("embedding")
        .limit(64 * max(n_cells, n_codes))
        .collect()
    ]
    if not sample:
        raise ValueError("ivfpq_topk: embeddings corpus is empty")
    n_cells = min(n_cells, len(sample))
    n_probe = min(n_probe, n_cells)
    n_codes = min(n_codes, len(sample))
    S = np.asarray(sample, dtype=np.float64)
    cent = _lloyd_numpy(S, k=n_cells)
    # sample residuals against the NEAREST centroid — the distribution
    # the per-subspace codebooks must cover
    d2 = ((S[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    resid = S - cent[d2.argmin(axis=1)]
    cb_rows = []
    for m in range(m_subspaces):
        cbm = _lloyd_numpy(resid[:, m * sub_d : (m + 1) * sub_d], k=n_codes)
        cb_rows += [
            (m, c, [float(x) for x in cbm[c]]) for c in range(n_codes)
        ]
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(cent)],
        "cell int, centroid array<double>",
    )
    codebook = spark.createDataFrame(
        cb_rows, "sub int, code int, cb array<double>"
    )

    cent_d2 = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("centroid"),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    cell_rank = Window.partitionBy("vec_id").orderBy(
        F.col("dist").asc(), F.col("cell")
    )
    assigned = (
        base.crossJoin(F.broadcast(centroids))
        .select(
            "vec_id", "embedding", "norm", "cell", "centroid",
            cent_d2.alias("dist"),
        )
        .withColumn("rn", F.row_number().over(cell_rank))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "embedding",
            "norm",
            "cell",
            F.zip_with(
                "embedding", "centroid", lambda a, b: a.cast("double") - b
            ).alias("resid"),
        )
    )
    # encode residuals: explode subspaces, broadcast codebook, argmin
    subs = assigned.select(
        "vec_id",
        "cell",
        F.explode(
            F.expr(
                f"transform(sequence(0, {m_subspaces - 1}), m ->"
                f" struct(m AS sub, slice(resid, m * {sub_d} + 1,"
                f" {sub_d}) AS sv))"
            )
        ).alias("s"),
    ).select("vec_id", "cell", "s.sub", "s.sv")
    sq = F.aggregate(
        F.zip_with(
            F.col("sv"), F.col("cb"), lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    code_rank = Window.partitionBy("vec_id", "sub").orderBy(
        F.col("d2").asc(), F.col("code")
    )
    codes = (
        subs.join(F.broadcast(codebook), "sub")
        .select("vec_id", "cell", "sub", "code", sq.alias("d2"))
        .withColumn("crn", F.row_number().over(code_rank))
        .filter(F.col("crn") == 1)
        .select("vec_id", "cell", "sub", "code")
    )

    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    q_cell_d2 = F.aggregate(
        F.zip_with(
            F.col("q_emb"),
            F.col("centroid"),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    probe_rank = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("cell")
    )
    probe = (
        queries.crossJoin(F.broadcast(centroids))
        .select(
            "query_id", "q_emb", "cell", "centroid", q_cell_d2.alias("dist")
        )
        .withColumn("prn", F.row_number().over(probe_rank))
        .filter(F.col("prn") <= n_probe)
        .select(
            "query_id",
            "cell",
            F.zip_with(
                "q_emb", "centroid", lambda a, b: a.cast("double") - b
            ).alias("q_resid"),
        )
    )
    q_subs = probe.select(
        "query_id",
        "cell",
        F.explode(
            F.expr(
                f"transform(sequence(0, {m_subspaces - 1}), m ->"
                f" struct(m AS sub, slice(q_resid, m * {sub_d} + 1,"
                f" {sub_d}) AS sv))"
            )
        ).alias("s"),
    ).select("query_id", "cell", "s.sub", "s.sv")
    lut = q_subs.join(F.broadcast(codebook), "sub").select(
        "query_id", "cell", "sub", "code", sq.alias("d2")
    )
    adc = (
        codes.join(F.broadcast(lut), ["cell", "sub", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2").alias("adc"))
    )
    short_w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("vec_id")
    )
    shortlist = (
        adc.withColumn("srn", F.row_number().over(short_w))
        .filter(F.col("srn") <= rerank)
        .select("query_id", "vec_id")
    )
    cands = (
        shortlist.join(base, "vec_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                _dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_norm") * F.col("norm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_pinned_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    n_cells: int = IVF_CELLS,
    n_probe: int = IVF_PROBE,
    dim: int = 64,
) -> DataFrame:
    """``ivf_topk`` with a PINNED coarse quantizer — the oracle-
    replayable twin (the q_sim_ann_lsh pinned-layout pattern applied
    to IVF). The fitted quantizer makes the production entry rows-only
    by necessity (Lloyd's centroids are data-dependent floats no
    static SQL can restate); pinning the centroids to the seeded
    ``_plane_signs`` sign matrix makes every stage — assignment, cell
    probe, candidate join, cosine re-rank — exactly replayable in
    ANSI SQL, so the driver's hash gates the IVF probe SHAPE
    end-to-end.

    Sign centroids have EQUAL norm (|c|^2 = dim), so nearest-centroid
    by L2 is exactly argmax dot product — and the dot is the one
    primitive proven bit-exact across engines (Spark aggregate fold ==
    DuckDB list_dot_product, left-to-right). Assignment and probe both
    rank by (dot DESC, cell), candidates join on cell id, and the
    top-k output is rank-only so no float enters the hash. Quantizer
    QUALITY is whatever random sign directions give (fine on this
    near-isotropic corpus; recall vs brute force stays the production
    entry's property test) — what this entry verifies is the
    pipeline's mechanics, not the fit.
    """
    spark = embeddings.sparkSession
    base = with_norm(embeddings)
    signs = _plane_signs(n_cells, 1, dim)
    centroids = spark.createDataFrame(
        [(i, signs[i][0]) for i in range(n_cells)],
        "cell int, centroid array<double>",
    )
    cdot = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("centroid"),
            lambda a, b: a.cast("double") * b,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    cell_rank = Window.partitionBy("vec_id").orderBy(
        F.col("dot").desc(), F.col("cell")
    )
    ranked = (
        base.crossJoin(F.broadcast(centroids))
        .select("vec_id", "embedding", "norm", "cell", cdot.alias("dot"))
        .withColumn("rn", F.row_number().over(cell_rank))
    )
    assigned = ranked.filter(F.col("rn") == 1).select(
        "vec_id", "embedding", "norm", "cell"
    )
    # q_cell, not cell: probe shares `ranked`'s lineage with `assigned`,
    # and a same-name equi predicate on a self-derived column resolves
    # only by DataFrame origin (Spark warns "trivially true equals") —
    # rename one side so the join condition is unambiguous by name.
    probe_cells = ranked.filter(
        (F.col("vec_id") < n_queries) & (F.col("rn") <= n_probe)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
        F.col("cell").alias("q_cell"),
    )
    cands = assigned.join(
        F.broadcast(probe_cells),
        (F.col("cell") == F.col("q_cell"))
        & (F.col("vec_id") != F.col("query_id")),
    ).select(
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
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def pq_pinned_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    m_subspaces: int = PQ_SUBSPACES,
    n_codes: int = PQ_CODES,
    rerank: int = PQ_RERANK,
    dim: int = 64,
) -> DataFrame:
    """``pq_topk`` with PINNED sign codebooks and a deterministic ADC —
    the oracle-replayable twin (the ivf_pinned_topk move applied to
    PQ). Two changes unlock the hash gate:

    * codebooks are the seeded sign matrix (equal-norm codewords), so
      encode's argmin-L2 is exactly argmax dot — the bit-exact
      primitive — instead of Lloyd-fitted data-dependent floats;
    * the ADC statistic is the asymmetric INNER PRODUCT accumulated in
      a FIXED order: corpus codes pivot to one column per subspace and
      the approximation is lut0 + lut1 + ... as an explicit expression
      chain, not a groupBy SUM whose float association depends on the
      partitioning (the reason the production entry is rows-only even
      apart from the fit).

    Shortlist then exact-cosine re-rank as in production; rank-only
    output keeps floats out of the hash. This entry verifies PQ's
    MECHANICS (encode, LUT, ADC scan, re-rank) end-to-end; compression
    QUALITY stays the fitted entry's recall property test.
    """
    spark = embeddings.sparkSession
    if dim % m_subspaces != 0:
        raise ValueError(f"dim {dim} not divisible by {m_subspaces}")
    sub_d = dim // m_subspaces
    base = with_norm(embeddings)
    signs = _plane_signs(m_subspaces * n_codes, 1, sub_d)
    codebook = spark.createDataFrame(
        [
            (m, c, signs[m * n_codes + c][0])
            for m in range(m_subspaces)
            for c in range(n_codes)
        ],
        "sub int, code int, centroid array<double>",
    )
    sdot = F.aggregate(
        F.zip_with(
            F.col("sv"), F.col("centroid"), lambda a, b: a.cast("double") * b
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

    def sub_rows(df: DataFrame, id_col: str, emb_col: str) -> DataFrame:
        return df.select(
            id_col,
            F.explode(
                F.expr(
                    f"transform(sequence(0, {m_subspaces - 1}), m ->"
                    f" struct(m AS sub, slice({emb_col}, m * {sub_d} + 1,"
                    f" {sub_d}) AS sv))"
                )
            ).alias("s"),
        ).select(id_col, "s.sub", "s.sv")

    code_rank = Window.partitionBy("vec_id", "sub").orderBy(
        F.col("dot").desc(), F.col("code")
    )
    codes = (
        sub_rows(base, "vec_id", "embedding")
        .join(F.broadcast(codebook), "sub")
        .select("vec_id", "sub", "code", sdot.alias("dot"))
        .withColumn("rn", F.row_number().over(code_rank))
        .filter(F.col("rn") == 1)
        .select("vec_id", "sub", "code")
    )
    # pivot: one row per vector, one integer code column per subspace
    # (codes are exact ints — the pivot is hash-safe)
    pivoted = codes.groupBy("vec_id").agg(
        *[
            F.max(F.when(F.col("sub") == m, F.col("code"))).alias(f"c{m}")
            for m in range(m_subspaces)
        ]
    )
    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    lut = (
        sub_rows(queries, "query_id", "q_emb")
        .join(F.broadcast(codebook), "sub")
        .select("query_id", "sub", "code", sdot.alias("v"))
    )
    # deterministic ADC: chain one broadcast LUT join per subspace and
    # add the m terms in fixed left-to-right order
    adc = pivoted
    for m in range(m_subspaces):
        lut_m = lut.filter(F.col("sub") == m).select(
            "query_id" if m == 0 else F.col("query_id").alias(f"qid{m}"),
            F.col("code").alias(f"lc{m}"),
            F.col("v").alias(f"v{m}"),
        )
        on = [F.col(f"c{m}") == F.col(f"lc{m}")]
        if m > 0:
            on.append(F.col("query_id") == F.col(f"qid{m}"))
        adc = adc.join(
            F.broadcast(lut_m), on[0] if len(on) == 1 else on[0] & on[1]
        )
    approx = "(" + " + ".join(f"v{m}" for m in range(m_subspaces)) + ")"
    scored = adc.filter(F.col("vec_id") != F.col("query_id")).select(
        "query_id", "vec_id", F.expr(approx).alias("approx")
    )
    short_w = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("vec_id")
    )
    shortlist = (
        scored.withColumn("srn", F.row_number().over(short_w))
        .filter(F.col("srn") <= rerank)
        .select("query_id", "vec_id")
    )
    cands = (
        shortlist.join(base, "vec_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                _dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_norm") * F.col("norm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivfpq_pinned_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    n_cells: int = IVF_CELLS,
    n_probe: int = IVF_PROBE,
    m_subspaces: int = PQ_SUBSPACES,
    n_codes: int = PQ_CODES,
    rerank: int = PQ_RERANK,
    dim: int = 64,
) -> DataFrame:
    """``ivfpq_topk`` with everything pinned — the composition of
    ``ivf_pinned_topk``'s sign-centroid cell probe and
    ``pq_pinned_topk``'s sign codebooks + deterministic ADC, so the
    full two-level index (coarse cells gate WHICH codes are scanned,
    PQ codes approximate the scan, exact cosine re-ranks the
    shortlist) replays in ANSI SQL and the driver hash gates it
    end-to-end. Rank-only output; quality stays the fitted production
    entry's recall property test."""
    spark = embeddings.sparkSession
    sub_d = dim // m_subspaces
    base = with_norm(embeddings)

    # --- coarse quantizer (ivf_pinned_topk's machinery) --------------
    cell_signs = _plane_signs(n_cells, 1, dim)
    centroids = spark.createDataFrame(
        [(i, cell_signs[i][0]) for i in range(n_cells)],
        "cell int, centroid array<double>",
    )
    cdot = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("centroid"),
            lambda a, b: a.cast("double") * b,
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    cell_rank = Window.partitionBy("vec_id").orderBy(
        F.col("dot").desc(), F.col("cell")
    )
    ranked = (
        base.crossJoin(F.broadcast(centroids))
        .select("vec_id", "embedding", "norm", "cell", cdot.alias("dot"))
        .withColumn("rn", F.row_number().over(cell_rank))
    )
    assigned = ranked.filter(F.col("rn") == 1).select("vec_id", "cell")
    probe_cells = ranked.filter(
        (F.col("vec_id") < n_queries) & (F.col("rn") <= n_probe)
    ).select(
        F.col("vec_id").alias("query_id"), F.col("cell").alias("q_cell")
    )
    cand = assigned.join(
        F.broadcast(probe_cells),
        (F.col("cell") == F.col("q_cell"))
        & (F.col("vec_id") != F.col("query_id")),
    ).select("query_id", "vec_id")

    # --- PQ codes + LUT (pq_pinned_topk's machinery) ------------------
    pq_signs = _plane_signs(m_subspaces * n_codes, 1, sub_d)
    codebook = spark.createDataFrame(
        [
            (m, c, pq_signs[m * n_codes + c][0])
            for m in range(m_subspaces)
            for c in range(n_codes)
        ],
        "sub int, code int, centroid array<double>",
    )
    sdot = F.aggregate(
        F.zip_with(
            F.col("sv"), F.col("centroid"), lambda a, b: a.cast("double") * b
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

    def sub_rows(df: DataFrame, id_col: str, emb_col: str) -> DataFrame:
        return df.select(
            id_col,
            F.explode(
                F.expr(
                    f"transform(sequence(0, {m_subspaces - 1}), m ->"
                    f" struct(m AS sub, slice({emb_col}, m * {sub_d} + 1,"
                    f" {sub_d}) AS sv))"
                )
            ).alias("s"),
        ).select(id_col, "s.sub", "s.sv")

    code_rank = Window.partitionBy("vec_id", "sub").orderBy(
        F.col("dot").desc(), F.col("code")
    )
    pivoted = (
        sub_rows(base, "vec_id", "embedding")
        .join(F.broadcast(codebook), "sub")
        .select("vec_id", "sub", "code", sdot.alias("dot"))
        .withColumn("rn", F.row_number().over(code_rank))
        .filter(F.col("rn") == 1)
        .groupBy("vec_id")
        .agg(
            *[
                F.max(F.when(F.col("sub") == m, F.col("code"))).alias(f"c{m}")
                for m in range(m_subspaces)
            ]
        )
    )
    queries = base.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("norm").alias("q_norm"),
    )
    lut = (
        sub_rows(queries, "query_id", "q_emb")
        .join(F.broadcast(codebook), "sub")
        .select("query_id", "sub", "code", sdot.alias("v"))
    )

    # --- deterministic ADC over only the PROBED candidates ------------
    adc = cand.join(pivoted, "vec_id")
    for m in range(m_subspaces):
        lut_m = lut.filter(F.col("sub") == m).select(
            F.col("query_id").alias(f"qid{m}"),
            F.col("code").alias(f"lc{m}"),
            F.col("v").alias(f"v{m}"),
        )
        adc = adc.join(
            F.broadcast(lut_m),
            (F.col("query_id") == F.col(f"qid{m}"))
            & (F.col(f"c{m}") == F.col(f"lc{m}")),
        )
    approx = "(" + " + ".join(f"v{m}" for m in range(m_subspaces)) + ")"
    scored = adc.select("query_id", "vec_id", F.expr(approx).alias("approx"))
    short_w = Window.partitionBy("query_id").orderBy(
        F.col("approx").desc(), F.col("vec_id")
    )
    shortlist = (
        scored.withColumn("srn", F.row_number().over(short_w))
        .filter(F.col("srn") <= rerank)
        .select("query_id", "vec_id")
    )
    cands = (
        shortlist.join(base, "vec_id")
        .join(F.broadcast(queries), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                _dot(F.col("q_emb"), F.col("embedding"))
                / (F.col("q_norm") * F.col("norm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def random_projection(
    embeddings: DataFrame, out_dim: int = 16, dim: int = 64
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: compress each embedding
    to ``out_dim`` components via the seeded +-1 sign matrix scaled by
    1/sqrt(out_dim) (Achlioptas '03 showed sign entries satisfy the JL
    guarantee — no Gaussians needed, and +-1 keeps every value exactly
    representable). The fit-free reduction path a pipeline uses for
    embedding storage/IO compression ahead of ANN; PCA
    (operators/similarity.py::pca_project) remains the data-adaptive
    one.

    Scale shape: ONE broadcast row carries the whole projection matrix
    (out_dim array columns), so the pass is map-only — no shuffle, no
    fit, no Python. Every output component is a single aggregate-fold
    dot times an exactly-representable constant (1/4 for out_dim=16),
    so the values are bit-exact across engines and the entry is
    hash-gateable (the pinned-ANN-twin primitive).

    Returns (vec_id, r0..r{out_dim-1}) as double columns.
    """
    spark = embeddings.sparkSession
    scale = 1.0 / math.sqrt(out_dim)
    signs = _plane_signs(1, out_dim, dim)
    row = tuple([0] + [signs[0][p] for p in range(out_dim)])
    schema = "one int, " + ", ".join(
        f"s{p} array<double>" for p in range(out_dim)
    )
    mat = spark.createDataFrame([row], schema)
    comps = [
        (
            F.aggregate(
                F.zip_with(
                    F.col("embedding"),
                    F.col(f"s{p}"),
                    lambda a, b: a.cast("double") * b,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            * F.lit(scale)
        ).alias(f"r{p}")
        for p in range(out_dim)
    ]
    return embeddings.crossJoin(F.broadcast(mat)).select("vec_id", *comps)


def ann_lsh_multiprobe_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    planes: int = 6,
    tables: int = 2,
) -> DataFrame:
    """Multi-probe LSH top-k (Lv et al., VLDB '07): each query probes
    its own bucket PLUS every bucket at Hamming distance 1 (one
    sign-bit flip) in each table. The probe fan-out buys the recall
    that single-probe LSH gets from MORE tables — here 2 tables x 7
    probes replace 8-14 single-probe tables, an ~4x smaller index (at
    100 TB the bucket table IS the index; tables multiply its rows,
    probes only multiply the tiny query side).

    Same pinned sign-matrix machinery as :func:`ann_lsh_topk`
    (`_sign_table` broadcast, fold-dot bucket bits); the probe spine
    (0, 1, 2, 4, ...) rides a broadcast literal table and the probe
    bucket is ``bucket XOR flip`` — integer-exact on any engine.
    Exact cosine re-ranks candidates only."""
    dim = embeddings.select(F.size("embedding")).first()[0]
    sign_df = _sign_table(embeddings.sparkSession, tables, planes, dim)
    base = with_norm(embeddings)
    bucketed = base.crossJoin(F.broadcast(sign_df)).select(
        "vec_id",
        "embedding",
        "norm",
        "table_id",
        _bucket_bits(F.col("embedding"), planes).alias("bucket"),
    )
    flips = embeddings.sparkSession.createDataFrame(
        [(0,)] + [(1 << p,) for p in range(planes)], "flip long"
    )
    queries = (
        bucketed.filter(F.col("vec_id") < n_queries)
        .crossJoin(F.broadcast(flips))
        .select(
            F.col("vec_id"),
            F.col("embedding"),
            F.col("norm"),
            F.col("table_id"),
            F.expr("bucket ^ flip").alias("bucket"),
        )
    )
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
