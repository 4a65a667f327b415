"""Corpus-curation signals (round 7, batch 7h): the two knobs a
training-data pipeline turns between "dedup" and "train" — how much of
each doc to keep, and how contaminated it is.

* q_weighted_sample — deterministic quality-weighted sampling:
  P(keep) proportional to a quality proxy (doc length, capped), decided
  by pure integer math on an md5 draw — h * 1000 < min(1000, len) *
  2^32 — so the kept set is reproducible across runs, engines, and
  partitionings (no RNG state, no seed plumbing; the md5 house pattern
  from operators/prep.py). Map-only at any scale.
* q_contamination_rate — graded decontamination: q_decontaminate's
  boolean (operators/dedup.py) says WHETHER an eval doc shares an
  8-gram with the training split; this scores HOW MUCH — matched
  distinct shingles / total distinct shingles per eval doc. Spark joins
  on the 8-byte xxhash64 shingle hash (fixed-width shuffle keys); the
  oracle joins raw shingle text — identical up to a ~1e-19 collision
  (same adjudication as q_decontaminate). rate = exact-int/exact-int,
  one IEEE division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table


@register(
    "q_weighted_sample",
    category="prep",
    doc=(
        "Deterministic quality-weighted sampling: keep each doc with "
        "P = min(1000, char_len)/1000, decided by md5-draw integer "
        "cross-multiply (no RNG, no seed; reproducible across engines "
        "and partitionings). Map-only; keep_prob is the one float, "
        "from one division of exact ints."
    ),
    oracle="""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(LEAST(1000, length(text)) AS DOUBLE) / 1000
                   AS keep_prob
        FROM documents
        WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) * 1000
              < CAST(LEAST(1000, length(text)) AS BIGINT) * 4294967296
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_s3_etl_spark.operators.prep import md5_int32

    docs = load_table(spark, sf_dir, "documents")
    h = md5_int32(F.col("doc_id").cast("string"))
    cap = F.least(F.lit(1000), F.length("text")).cast("long")
    return (
        docs.filter(h * 1000 < cap * F.lit(4294967296).cast("long"))
        .select(
            "doc_id",
            F.length("text").cast("long").alias("n_chars"),
            (cap.cast("double") / 1000).alias("keep_prob"),
        )
    )


@register(
    "q_contamination_rate",
    category="dedup",
    doc=(
        "Graded train/eval contamination: per held-out doc "
        "(doc_id % 10 == 0), the fraction of its distinct word-8-grams "
        "that also occur in the training split — matched/total from "
        "hash semi-join counts, one division. Spark shuffles 8-byte "
        "shingle hashes, never shingle text; the oracle joins raw "
        "shingles (collision odds ~1e-19, same as q_decontaminate)."
    ),
    oracle="""
        WITH sh AS (
          SELECT DISTINCT doc_id, s FROM (
            SELECT doc_id, string_split(text, ' ') AS w FROM documents),
            UNNEST(list_transform(range(len(w) - 7), i ->
              w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
              || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7] || ' '
              || w[i+8])) AS t(s)
          WHERE len(w) >= 8
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN s IN (
                      SELECT s FROM sh WHERE doc_id % 10 != 0)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
               CAST(SUM(CASE WHEN s IN (
                      SELECT s FROM sh WHERE doc_id % 10 != 0)
                    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
                   AS contamination_rate
        FROM sh
        WHERE doc_id % 10 = 0
        GROUP BY doc_id
    """,
)
def q_contamination_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_s3_etl_spark.operators.dedup import word_shingles

    sh = word_shingles(
        load_table(spark, sf_dir, "documents"), n=8
    ).select("doc_id", F.xxhash64("shingle").alias("h"))
    ev = sh.filter(F.col("doc_id") % 10 == 0)
    train = (
        sh.filter(F.col("doc_id") % 10 != 0).select("h").distinct()
    )
    matched = (
        ev.join(train, "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matched"))
    )
    total = ev.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    return (
        total.join(matched, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_matched", F.lit(0)).cast("bigint").alias(
                "n_matched"
            ),
            (
                F.coalesce("n_matched", F.lit(0)).cast("double")
                / F.col("n_shingles")
            ).alias("contamination_rate"),
        )
    )
