"""Training-data preparation catalog (operators/prep.py): the steps
between a cleaned corpus and training batches. Split/mix/pack are pure
row functions or window arithmetic, so DuckDB recomputes them exactly;
sampling is seeded-stochastic and rows-only (fraction property in
tests/test_llm_ops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_s3_etl_spark.operators.prep import (
    corpus_mix,
    pack_sequences,
    stratified_sample,
    train_val_split,
)
from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table


@register(
    "q_train_val_split",
    category="prep",
    doc=(
        "Deterministic train/val split: md5-bucket of doc_id (pure row "
        "function — stable under re-runs/repartitioning, unlike RNG splits)."
    ),
    oracle="""
        SELECT doc_id, lang,
               CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) % 100 AS INTEGER) AS bucket,
               CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) % 100 < 90
                    THEN 'train' ELSE 'val' END AS split
        FROM documents
    """,
)
def q_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return train_val_split(load_table(spark, sf_dir, "documents"))


@register(
    "q_corpus_mix",
    category="prep",
    doc="Weighted source mixing by replication (en x2), epoch-tagged.",
    oracle="""
        SELECT doc_id, lang,
               CAST(UNNEST(generate_series(1,
                    CASE WHEN lang = 'en' THEN 2 ELSE 1 END)) AS INTEGER) AS epoch
        FROM documents
    """,
)
def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_mix(load_table(spark, sf_dir, "documents"))


@register(
    "q_pack_sequences",
    category="prep",
    doc=(
        "Greedy running-offset packing of docs into 2048-token bins per "
        "language (window cumsum; single pass)."
    ),
    oracle="""
        WITH toks AS (
          SELECT doc_id, lang,
                 CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tok
          FROM documents
        )
        SELECT doc_id, lang, n_tok,
               CAST(FLOOR((SUM(n_tok) OVER (
                    PARTITION BY lang ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tok) / 2048.0) AS INTEGER) AS bin
        FROM toks
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_sequences(load_table(spark, sf_dir, "documents"))


@register(
    "q_sample_stratified",
    category="prep",
    doc=(
        "Per-language seeded Bernoulli sample (rows-only: stochastic; "
        "fraction bounds asserted in tests)."
    ),
    oracle=None,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stratified_sample(load_table(spark, sf_dir, "documents"))
