"""Corpus-level duplication structure (round 7, batch 8e): where
per-doc dedup (plans/llm.py) and train/eval decontamination
(plans/curation.py) look at documents, these two look at the CORPUS —
which sources copy each other, and how much boilerplate each document
carries.

Both run over distinct word-8-gram shingles. Spark shuffles the 8-byte
xxhash64 of each shingle (fixed-width keys, never shingle text); the
DuckDB oracle joins raw shingle text — identical up to a ~1e-19
collision (same adjudication as q_decontaminate /
q_contamination_rate).

* q_source_overlap — the pairwise Jaccard matrix between sources over
  their distinct shingle sets: the dataset-mixing diagnostic ("is srcA
  a re-crawl of srcB?") a curation pipeline consults before weighting
  sources. The equi-join on shingle hash only materializes co-occurring
  shingles (never the |sources|^2 x |shingles| product), and the union
  size comes from per-source set sizes: |A|+|B|-common — one division
  of exact BIGINTs per source pair.
* q_phrase_density — per-document boilerplate score: the fraction of a
  doc's distinct shingles that occur in >= 2 distinct documents
  corpus-wide. High density = template/stock text (navigation chrome,
  license headers); the complement of novelty. One shingle-grain
  aggregation builds the document-frequency table, a semi-join counts
  each doc's shared shingles, one division.

Scale: shingle rows explode ~|words| per doc but immediately collapse
through distinct / map-side-combined counts on the hash; the heavy
joins are equi-joins on the 8-byte hash. At 100 TB both queries are
the standard two-shuffle shape (shingle-grain agg + doc/source-grain
agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_s3_etl_spark.operators.dedup import word_shingles
from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table

# Distinct (source, shingle-text) rows — DuckDB mirror of
# word_shingles joined back to the doc's source (raw text, see module
# doc for the hash-vs-text adjudication).
_SRC_SHINGLES_SQL = """
        WITH sh AS (
          SELECT DISTINCT source, s FROM (
            SELECT source, string_split(text, ' ') AS w FROM documents),
            UNNEST(list_transform(range(len(w) - 7), i ->
              w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
              || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7] || ' '
              || w[i+8])) AS t(s)
          WHERE len(w) >= 8
        )
"""


@register(
    "q_source_overlap",
    category="dedup",
    cost=1,
    doc=(
        "Pairwise Jaccard overlap between sources over their distinct "
        "word-8-gram sets: equi-join on the shingle hash materializes "
        "only co-occurring shingles, set sizes come from one "
        "per-source count, jaccard = common/(|A|+|B|-common) over "
        "exact BIGINTs. Zero-overlap pairs are absent (inner join) on "
        "both engines."
    ),
    oracle=_SRC_SHINGLES_SQL
    + """
        , sz AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n
          FROM sh GROUP BY source
        ), ov AS (
          SELECT l.source AS sa, r.source AS sb,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM sh l JOIN sh r ON l.s = r.s AND l.source < r.source
          GROUP BY 1, 2
        )
        SELECT sa AS src_a, sb AS src_b, c AS n_common,
               CAST(c AS DOUBLE) / (za.n + zb.n - c) AS jaccard
        FROM ov
        JOIN sz za ON za.source = ov.sa
        JOIN sz zb ON zb.source = ov.sb
    """,
)
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # Materialized once: three consumers (size rollup + both overlap
    # join sides) otherwise re-run the shingle explode + join +
    # distinct per reference (r14 before-plan: 8 parquet scans).
    ssh = (
        word_shingles(docs, n=8)
        .join(docs.select("doc_id", "source"), "doc_id")
        .select("source", F.xxhash64("shingle").alias("h"))
        .distinct()
        .localCheckpoint()
    )
    sz = ssh.groupBy("source").agg(F.count("*").cast("bigint").alias("n"))
    left = ssh.select(F.col("source").alias("sa"), "h")
    right = ssh.select(F.col("source").alias("sb"), "h")
    ov = (
        left.join(right.hint("shuffle_hash"), "h")
        .filter(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    za = sz.select(F.col("source").alias("sa"), F.col("n").alias("na"))
    zb = sz.select(F.col("source").alias("sb"), F.col("n").alias("nb"))
    return (
        ov.join(F.broadcast(za), "sa")
        .join(F.broadcast(zb), "sb")
        .select(
            F.col("sa").alias("src_a"),
            F.col("sb").alias("src_b"),
            F.col("c").alias("n_common"),
            F.expr("CAST(c AS DOUBLE) / (na + nb - c)").alias("jaccard"),
        )
    )


@register(
    "q_phrase_density",
    category="dedup",
    cost=1,
    doc=(
        "Per-document boilerplate density: the fraction of the doc's "
        "distinct word-8-grams occurring in >= 2 distinct documents "
        "corpus-wide — document-frequency table on the shingle hash, "
        "semi-join count, one division of exact BIGINTs."
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
        ), df AS (
          SELECT s FROM sh GROUP BY s HAVING COUNT(*) >= 2
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(SUM(CASE WHEN s IN (SELECT s FROM df)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
               CAST(SUM(CASE WHEN s IN (SELECT s FROM df)
                    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
                   AS phrase_density
        FROM sh GROUP BY doc_id
    """,
)
def q_phrase_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = word_shingles(
        load_table(spark, sf_dir, "documents"), n=8
    ).select("doc_id", F.xxhash64("shingle").alias("h"))
    df_shared = (
        sh.groupBy("h")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("h")
    )
    shared = (
        sh.join(df_shared, "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    total = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    return total.join(shared, "doc_id", "left").select(
        "doc_id",
        "n_shingles",
        F.coalesce("n_shared", F.lit(0)).cast("bigint").alias("n_shared"),
        (
            F.coalesce("n_shared", F.lit(0)).cast("double")
            / F.col("n_shingles")
        ).alias("phrase_density"),
    )
