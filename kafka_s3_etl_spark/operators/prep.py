"""Training-data preparation operators: deterministic splits, corpus
mixing, sequence packing, stratified sampling.

These are the steps between "clean corpus" and "training batches" in an
LLM data pipeline. All are single-pass / single-shuffle and, except for
sampling, fully deterministic — split membership must be a pure function
of the row (not of partitioning or RNG state) or re-runs of a 100 TB
pipeline silently leak val data into train.

* train/val split — md5-derived bucket per doc (cross-engine: DuckDB
  computes the identical bucket, so the split is oracle-checkable);
* corpus mix — per-source epoch weights as row replication (the batch
  analogue of sampling-with-temperature source mixing);
* sequence packing — greedy running-offset packing of documents into
  fixed token-capacity bins per language partition (window cumsum; the
  approximate packing used when exact bin packing would serialize);
* stratified sample — per-language fractions via ``sampleBy``
  (seeded Bernoulli; fraction property asserted in tests, rows-only
  for the oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SPLIT_BUCKETS = 100
TRAIN_BUCKETS = 90  # buckets [0, 90) -> train, rest -> val
PACK_CAPACITY = 2048


def md5_int32(col: Column) -> Column:
    """THE house cross-engine hash: first 8 hex chars of md5 as a
    64-bit-safe integer in [0, 2^32). md5 is bit-identical in Spark and
    DuckDB (`CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT)` on the
    oracle side); xxhash64 would be faster but has no DuckDB twin.
    Callers cast non-string inputs to string first. Single definition —
    mlfeat/curation/text/prep all hash through here."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _doc_bucket(doc_id: Column, buckets: int = SPLIT_BUCKETS) -> Column:
    """Deterministic cross-engine bucket: md5_int32(doc_id-as-string)
    mod buckets, so the oracle recomputes the same split."""
    return F.pmod(md5_int32(doc_id.cast("string")), F.lit(buckets))


def train_val_split(documents: DataFrame) -> DataFrame:
    """Assign every doc to train/val by content-independent hash bucket.

    Pure function of doc_id: stable under re-runs, repartitioning, and
    incremental ingestion — the property RNG-based splits lack."""
    bucket = _doc_bucket(F.col("doc_id"))
    return documents.select(
        "doc_id",
        "lang",
        bucket.cast("int").alias("bucket"),
        F.when(bucket < TRAIN_BUCKETS, "train").otherwise("val").alias("split"),
    )


def corpus_mix(documents: DataFrame, weights: dict[str, int] | None = None) -> DataFrame:
    """Weighted source mixing by replication: each doc appears
    ``weights[lang]`` times (default 1), tagged with its epoch index.
    The batch shape of temperature-weighted source sampling."""
    weights = weights or {"en": 2}
    w: Column = F.lit(1)
    for lang, n in weights.items():
        w = F.when(F.col("lang") == lang, n).otherwise(w)
    return documents.select(
        "doc_id",
        "lang",
        F.explode(F.sequence(F.lit(1), w)).alias("epoch"),
    )


def pack_sequences(
    documents: DataFrame, capacity: int = PACK_CAPACITY
) -> DataFrame:
    """Greedy running-offset packing: within each language partition
    (ordered by doc_id), a document's bin is floor(offset / capacity)
    where offset = tokens of all preceding docs. Single window pass;
    documents may straddle bin boundaries — the standard approximation
    when exact first-fit packing would serialize the partition."""
    n_tok = F.size(F.split("text", " "))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_offset = documents.select(
        "doc_id",
        "lang",
        n_tok.alias("n_tok"),
        (F.sum(n_tok).over(w) - n_tok).alias("offset"),
    )
    return with_offset.select(
        "doc_id",
        "lang",
        "n_tok",
        F.floor(F.col("offset") / capacity).cast("int").alias("bin"),
    )


def stratified_sample(
    documents: DataFrame,
    fractions: dict[str, float] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Per-language Bernoulli sample (seeded). Deterministic for a fixed
    input partitioning but not a pure row function — use train_val_split
    when membership must survive repartitioning."""
    fractions = fractions or {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.25, "zh": 0.25}
    return documents.sampleBy("lang", fractions, seed=seed).select(
        "doc_id", "lang", "source"
    )


def sample_per_group(
    df: DataFrame,
    group: str,
    order_key: str,
    n: int,
) -> DataFrame:
    """Deterministic fixed-size per-group sample: the ``n`` rows of each
    group with the smallest md5(order_key) — a pure row function of the
    data (like train_val_split's bucketing), so the sample is identical
    across re-runs, repartitionings, and engines, unlike reservoir or
    seeded-RNG sampling whose output depends on partition layout.

    One shuffle on the group key + a rank window; at 100 TB Spark's
    WindowGroupLimit pushes the rank<=n cut to the map side, so each
    partition forwards at most n rows per group into the shuffle.

    Returns (order_key, group, rk) with rk in [1, n].
    """
    hk = F.md5(F.col(order_key).cast("string"))
    w = Window.partitionBy(group).orderBy(hk, F.col(order_key))
    return (
        df.select(order_key, group, F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= n)
    )
