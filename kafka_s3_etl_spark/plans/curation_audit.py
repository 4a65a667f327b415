"""Curation-audit suite (round 8, batch 17): the accounting a
training-data pipeline runs AROUND its filters — what each stage
drops, where dedup losses go, and what the tokenizer will see.

* q_filter_funnel — cumulative survival through a quality-filter
  cascade (raw -> min words -> word shape -> lexical diversity) in ONE
  corpus pass: per-doc word stats come from explode + map-side-
  combined agg (the house pattern for per-doc token metrics — size()
  twins over a re-inlined split() evaluate the transform per
  reference), stage flags are integer cross-multiplications (chars <=
  12*words, distinct*10 >= words*3 — no per-row division), the four
  cumulative counts collapse to one row and stack() emits the funnel
  table. survival/step rates are single exact-BIGINT divisions.
* q_dedup_survivorship — where exact-dedup losses GO, per source:
  keeper per content hash via min(struct(doc_id, source)) (total
  order, deterministic; the q_attribution arg-min house pattern),
  docs join keepers on md5(text) — an 8-byte-class key, never the
  raw text — then per-source keeper/dup-loss/cross-source-loss
  conditional sums and one retention division. Cross-source loss is
  the number a corpus owner actually argues about: dups whose keeper
  belongs to a DIFFERENT source.
* q_token_fertility — tokenizer accounting per language: whitespace
  words, BPE-ish regex tokens (operators/text.py::TOKEN_REGEX, the
  same literal embedded in both engines), chars; tokens-per-word and
  chars-per-token as single divisions of exact BIGINT sums. One scan,
  map-side combined to the language rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_s3_etl_spark.operators.text import TOKEN_REGEX
from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table


@register(
    "q_filter_funnel",
    category="quality",
    cost=1,
    doc=(
        "Cumulative quality-filter funnel over documents (raw -> "
        "min-words -> word-shape -> lexical-diversity): per-doc word "
        "stats via explode + map-side agg, integer cross-multiplied "
        "stage flags, one-row collapse + stack() into the funnel "
        "table; survival and step rates each one exact division."
    ),
    oracle="""
        WITH per AS (
          SELECT doc_id,
                 CAST(length(text) AS BIGINT) AS chars,
                 CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
                 CAST(len(list_distinct(string_split(text, ' ')))
                      AS BIGINT) AS n_distinct
          FROM documents
        ), flags AS (
          SELECT CASE WHEN n_words >= 20 THEN 1 ELSE 0 END AS p2,
                 CASE WHEN chars <= 12 * n_words THEN 1 ELSE 0 END AS p3,
                 CASE WHEN n_distinct * 10 >= n_words * 3
                      THEN 1 ELSE 0 END AS p4
          FROM per
        ), agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS total,
                 CAST(SUM(p2) AS BIGINT) AS c2,
                 CAST(SUM(p2 * p3) AS BIGINT) AS c3,
                 CAST(SUM(p2 * p3 * p4) AS BIGINT) AS c4
          FROM flags
        )
        SELECT stage, survivors,
               CAST(survivors AS DOUBLE) / total AS survival_rate,
               CAST(survivors AS DOUBLE) / prev AS step_rate
        FROM (
          SELECT '1_raw' AS stage, total AS survivors, total AS prev,
                 total FROM agg
          UNION ALL
          SELECT '2_min_words', c2, total, total FROM agg
          UNION ALL
          SELECT '3_word_shape', c3, c2, total FROM agg
          UNION ALL
          SELECT '4_lexical_diversity', c4, c3, total FROM agg
        )
    """,
)
def q_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("chars"),
        F.explode(F.split("text", " ")).alias("word"),
    )
    per = w.groupBy("doc_id").agg(
        F.max("chars").alias("chars"),
        F.count("*").cast("bigint").alias("n_words"),
        F.countDistinct("word").cast("bigint").alias("n_distinct"),
    )
    flags = per.select(
        F.expr("CASE WHEN n_words >= 20 THEN 1 ELSE 0 END").alias("p2"),
        F.expr("CASE WHEN chars <= 12 * n_words THEN 1 ELSE 0 END").alias(
            "p3"
        ),
        F.expr(
            "CASE WHEN n_distinct * 10 >= n_words * 3 THEN 1 ELSE 0 END"
        ).alias("p4"),
    )
    agg = flags.agg(
        F.count("*").cast("bigint").alias("total"),
        F.sum("p2").cast("bigint").alias("c2"),
        F.sum(F.expr("p2 * p3")).cast("bigint").alias("c3"),
        F.sum(F.expr("p2 * p3 * p4")).cast("bigint").alias("c4"),
    )
    stacked = agg.select(
        F.expr(
            "stack(4,"
            " '1_raw', total, total,"
            " '2_min_words', c2, total,"
            " '3_word_shape', c3, c2,"
            " '4_lexical_diversity', c4, c3)"
            " AS (stage, survivors, prev)"
        ),
        "total",
    )
    return stacked.select(
        "stage",
        "survivors",
        F.expr("CAST(survivors AS DOUBLE) / total").alias("survival_rate"),
        F.expr("CAST(survivors AS DOUBLE) / prev").alias("step_rate"),
    )


@register(
    "q_dedup_survivorship",
    category="dedup",
    cost=1,
    doc=(
        "Per-source exact-dedup survivorship: keeper per content hash "
        "via min(struct(doc_id, source)) arg-min, docs join keepers on "
        "md5(text) (hash key, never raw text), conditional sums for "
        "keeper/dup-loss/cross-source-loss and one retention division. "
        "Cross-source loss = dups whose keeper is in ANOTHER source."
    ),
    oracle="""
        WITH k AS (
          SELECT md5(text) AS h,
                 (min(struct_pack(d := doc_id, s := source))).d AS kid,
                 (min(struct_pack(d := doc_id, s := source))).s AS ksrc
          FROM documents GROUP BY md5(text)
        )
        SELECT d.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CASE WHEN d.doc_id = k.kid THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_keepers,
               CAST(SUM(CASE WHEN d.doc_id != k.kid THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_dup_lost,
               CAST(SUM(CASE WHEN d.doc_id != k.kid AND d.source != k.ksrc
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_lost_cross_source,
               CAST(SUM(CASE WHEN d.doc_id = k.kid THEN 1 ELSE 0 END)
                    AS DOUBLE) / COUNT(*) AS retention_rate
        FROM documents d JOIN k ON md5(d.text) = k.h
        GROUP BY d.source
    """,
)
def q_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    k = docs.groupBy(F.md5("text").alias("h")).agg(
        F.min(F.struct(F.col("doc_id").alias("d"), F.col("source").alias("s")))
        .alias("m")
    ).select("h", F.col("m.d").alias("kid"), F.col("m.s").alias("ksrc"))
    d = docs.select("doc_id", "source", F.md5("text").alias("h"))
    return d.join(k, "h").groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.expr("CASE WHEN doc_id = kid THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_keepers"),
        F.sum(F.expr("CASE WHEN doc_id != kid THEN 1 ELSE 0 END"))
        .cast("bigint")
        .alias("n_dup_lost"),
        F.sum(
            F.expr(
                "CASE WHEN doc_id != kid AND source != ksrc"
                " THEN 1 ELSE 0 END"
            )
        )
        .cast("bigint")
        .alias("n_lost_cross_source"),
        F.expr(
            "CAST(SUM(CASE WHEN doc_id = kid THEN 1 ELSE 0 END)"
            " AS DOUBLE) / COUNT(*)"
        ).alias("retention_rate"),
    )


@register(
    "q_token_fertility",
    category="text",
    cost=1,
    doc=(
        "Tokenizer accounting per language: whitespace words, BPE-ish "
        "regex tokens (shared TOKEN_REGEX literal on both engines), "
        "chars; tokens-per-word and chars-per-token as single "
        "divisions of exact BIGINT sums — one scan, map-side combined."
    ),
    oracle=f"""
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                   AS total_words,
               CAST(SUM(len(regexp_extract_all(text, '{TOKEN_REGEX}')))
                    AS BIGINT) AS total_tokens,
               CAST(SUM(length(text)) AS BIGINT) AS total_chars,
               CAST(CAST(SUM(len(regexp_extract_all(text, '{TOKEN_REGEX}')))
                    AS BIGINT) AS DOUBLE)
                   / CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
                   AS tokens_per_word,
               CAST(CAST(SUM(length(text)) AS BIGINT) AS DOUBLE)
                   / CAST(SUM(len(regexp_extract_all(text, '{TOKEN_REGEX}')))
                          AS BIGINT) AS chars_per_token
        FROM documents GROUP BY lang
    """,
)
def q_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_s3_etl_spark.operators.text import token_count_regex

    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        "lang",
        F.size(F.split("text", " ")).cast("bigint").alias("w"),
        token_count_regex(F.col("text")).cast("bigint").alias("t"),
        F.length("text").cast("bigint").alias("c"),
    )
    return per.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("w").cast("bigint").alias("total_words"),
        F.sum("t").cast("bigint").alias("total_tokens"),
        F.sum("c").cast("bigint").alias("total_chars"),
        F.expr(
            "CAST(CAST(SUM(t) AS BIGINT) AS DOUBLE)"
            " / CAST(SUM(w) AS BIGINT)"
        ).alias("tokens_per_word"),
        F.expr(
            "CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE)"
            " / CAST(SUM(t) AS BIGINT)"
        ).alias("chars_per_token"),
    )
