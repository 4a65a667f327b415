"""Round-10 batch 45: exact substring-span deduplication — the Lee et
al. '22 ExactSubstr shape (duplicated k-token windows mark maskable
spans) re-expressed as two shuffles instead of a suffix array, plus the
mask transform that rebuilds the deduplicated corpus. Complements the
document-level families (MinHash/SimHash/Jaccard/containment remove
whole documents; this removes repeated PASSAGES inside surviving
documents — the two stages a production text pipeline runs in
sequence).

Everything is exact integer/string arithmetic (positions, md5 gram
fingerprints, interval merges, ordered reassembly), so both entries are
fully DuckDB-replayable and hash-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table

_K = 12  # duplicated-window width in tokens

_SPANS_CTES = f"""
        toks AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        grams AS (
          SELECT doc_id, i AS pos,
                 md5(list_aggregate(w[i+1 : i+{_K}], 'string_agg', ' ')) AS g
          FROM toks, UNNEST(range(len(w) - {_K} + 1)) AS t(i)
          WHERE len(w) >= {_K}
        ),
        hot AS (
          SELECT g FROM grams GROUP BY g HAVING COUNT(*) > 1
        ),
        dup AS (
          SELECT doc_id, pos FROM grams JOIN hot USING (g)
        ),
        isl AS (
          SELECT doc_id, pos,
                 CASE WHEN pos > COALESCE(MAX(pos + {_K}) OVER (
                          PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), -1)
                      THEN 1 ELSE 0 END AS ni
          FROM dup
        ),
        grp AS (
          SELECT doc_id, pos,
                 SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS island
          FROM isl
        ),
        spans AS (
          SELECT doc_id,
                 CAST(MIN(pos) AS INTEGER) AS span_start,
                 CAST(MAX(pos) + {_K} AS INTEGER) AS span_end
          FROM grp GROUP BY doc_id, island
        )
"""


@register(
    "q_dedup_substring_spans",
    cost=1,
    category="dedup",
    doc=(
        "Exact substring-span dedup (Lee et al. '22 ExactSubstr, "
        "suffix-array-free): every 12-token window occurring more "
        "than once corpus-wide marks [pos, pos+12); overlapping marks "
        "merge to maximal per-document spans via the islands window "
        "(operators/dedup.py::duplicate_substring_spans). Grams "
        "shuffle as md5 fingerprints, the duplicate test is one "
        "map-side-combined count + equi join, span merge is a "
        "per-doc (high-cardinality) window — two shuffles total, "
        "no all-pairs, no suffix array. Fully integer/string-exact, "
        "so the oracle replays position-for-position."
    ),
    oracle=f"""
        WITH {_SPANS_CTES}
        SELECT doc_id, span_start, span_end,
               CAST(span_end - span_start AS INTEGER) AS span_tokens
        FROM spans
    """,
)
def q_dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_s3_etl_spark.operators.dedup import duplicate_substring_spans

    return duplicate_substring_spans(
        load_table(spark, sf_dir, "documents"), k=_K
    )


@register(
    "q_dedup_substring_mask",
    cost=1,
    category="dedup",
    doc=(
        "The transform stage over q_dedup_substring_spans: tokens "
        "covered by a merged duplicate span are dropped and the "
        "remainder reassembled in order (operators/dedup.py::"
        "mask_duplicate_substrings) — (doc_id, n_tokens, n_masked, "
        "clean_text), the deduplicated corpus a tokenizer trains on. "
        "Coverage resolves by exploding spans to positions + one "
        "(doc_id, pos) anti join; reassembly sorts only within each "
        "document's own group. The oracle rebuilds the identical "
        "strings via string_agg ORDER BY pos."
    ),
    oracle=f"""
        WITH {_SPANS_CTES},
        covered AS (
          SELECT doc_id, UNNEST(range(span_start, span_end)) AS pos
          FROM spans
        ),
        tokpos AS (
          SELECT doc_id, i AS pos, w[i+1] AS tok
          FROM toks, UNNEST(range(len(w))) AS t(i)
        ),
        kept AS (
          SELECT t.doc_id, t.pos, t.tok FROM tokpos t
          WHERE NOT EXISTS (SELECT 1 FROM covered c
                            WHERE c.doc_id = t.doc_id AND c.pos = t.pos)
        ),
        rebuilt AS (
          SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
                 COUNT(*) AS n_kept
          FROM kept GROUP BY doc_id
        )
        SELECT d.doc_id,
               CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens,
               CAST(len(string_split(d.text, ' '))
                    - COALESCE(r.n_kept, 0) AS BIGINT) AS n_masked,
               COALESCE(r.clean_text, '') AS clean_text
        FROM documents d LEFT JOIN rebuilt r USING (doc_id)
    """,
)
def q_dedup_substring_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_s3_etl_spark.operators.dedup import mask_duplicate_substrings

    return mask_duplicate_substrings(
        load_table(spark, sf_dir, "documents"), k=_K
    )


# ---------------------------------------------------- round 10, batch 48


def _bpe_encode_oracle() -> str:
    from kafka_s3_etl_spark.operators.text import BPE_MERGES

    expr = "text"
    for a, b in BPE_MERGES:
        expr = f"regexp_replace({expr}, '\\b{a} {b}\\b', '{a}{b}', 'g')"
    return f"""
        SELECT doc_id,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CAST(len(string_split({expr}, ' ')) AS BIGINT)
                 AS n_bpe_tokens,
               {expr} AS enc_text
        FROM documents
    """


@register(
    "q_bpe_encode",
    cost=1,
    category="text",
    doc=(
        "BPE tokenizer APPLICATION (operators/text.py::bpe_encode): "
        "the pinned 6-merge table rewrites every non-overlapping "
        "'a b' -> 'ab' left-to-right as a chained JVM regexp_replace "
        "— the encode step a trained tokenizer performs, completing "
        "the tokenizer lifecycle in the catalog (q_bpe_merges MINES "
        "the table, this APPLIES it, q_token_fertility/q_oov_rate "
        "analyze the result). Encoded strings are engine-exact (Java "
        "and RE2 agree on literal \\b patterns and global left-to-"
        "right replacement — verified on overlap cases like "
        "'the the quick quick'), so the full text enters the hash. "
        "Map-only single pass, whole-stage codegen, no shuffle."
    ),
    oracle=_bpe_encode_oracle(),
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_s3_etl_spark.operators.text import bpe_encode

    return bpe_encode(load_table(spark, sf_dir, "documents"))
