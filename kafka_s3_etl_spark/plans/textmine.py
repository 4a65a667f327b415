"""Round-10 batch 49: statistical text mining — collocation strength
and winnowing fingerprints.

Two corpus-statistics operators a tokenizer/curation pipeline runs
before training:

* ``q_collocations_lift`` — PMI-family collocation mining. The usual
  formulation ranks adjacent pairs by ``log P(x,y)/(P(x)P(y))``; the
  log is monotone, so ranking by the *lift* ratio itself drops the
  transcendental while preserving the order exactly. Every input to
  the ratio is an exact integer from ONE map-side-combined pair
  rollup, and the ratio is evaluated with the identical
  multiply-multiply-divide association on both engines (IEEE-754
  double ops are correctly rounded in the JVM and DuckDB alike, the
  same bit-exactness contract the ``list_dot_product`` oracles rely
  on), so the float CAN enter the driver's hash.
* ``q_winnow_fingerprints`` — winnowing document fingerprints
  (Schleimer, Wilkerson & Aiken, SIGMOD '03 — the MOSS algorithm):
  k-gram hashes, one selected per sliding window of w consecutive
  grams, which guarantees any shared run of ``w + k - 1`` tokens
  between two documents shares at least one fingerprint. We pick the
  *leftmost* minimal (hash, pos) in each window (a valid choice
  function — the guarantee holds for any per-window minimum; the
  struct-min is deterministic and identical across engines, the
  q_attribution arg-min pattern).

Scale shape: both operators explode tokens once and ride a single
doc_id exchange (windows, the per-doc rollups, and the final join all
reuse it); the collocation rollup's distinct-key space is vocab**2, so
everything after the one big shuffle is broadcast-sized. Nothing here
is all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table

_MIN_PAIR = 100  # collocation support floor (c_xy below this is noise)
_GRAM_K = 4  # winnowing k-gram width in tokens
_WINNOW_W = 4  # winnowing window: one fingerprint per w consecutive grams


@register(
    "q_collocations_lift",
    cost=1,
    category="text",
    doc=(
        "Collocation mining by exact lift (the monotone core of PMI, "
        "log dropped so no transcendental enters the hash): adjacent "
        "word pairs roll up map-side-combined ONCE; the marginals c_x "
        "/ c_y and the grand total are re-aggregations of that "
        "vocab^2-row pair table (never a second corpus pass) and ride "
        "broadcast joins back on. lift = (c_xy*N)/(c_x*c_y) as DOUBLE "
        "with pinned association — bit-exact across engines, so the "
        "float is hashable. Top-20 on the (lift DESC, x, y) total "
        "order via TakeOrdered, never a global sort."
    ),
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        prs AS (
          SELECT w[i+1] AS x, w[i+2] AS y
          FROM toks, UNNEST(range(len(w) - 1)) AS t(i)
          WHERE len(w) >= 2
        ),
        pc AS (SELECT x, y, COUNT(*) AS c_xy FROM prs GROUP BY x, y),
        cx AS (
          SELECT x, CAST(SUM(c_xy) AS BIGINT) AS c_x FROM pc GROUP BY x
        ),
        cy AS (
          SELECT y, CAST(SUM(c_xy) AS BIGINT) AS c_y FROM pc GROUP BY y
        ),
        n AS (SELECT CAST(SUM(c_xy) AS BIGINT) AS n_pairs FROM pc)
        SELECT x, y, c_xy, c_x, c_y, n_pairs,
               (CAST(c_xy AS DOUBLE) * CAST(n_pairs AS DOUBLE))
                 / (CAST(c_x AS DOUBLE) * CAST(c_y AS DOUBLE)) AS lift
        FROM pc JOIN cx USING (x) JOIN cy USING (y) CROSS JOIN n
        WHERE c_xy >= {_MIN_PAIR}
        ORDER BY lift DESC, x, y LIMIT 20
    """,
)
def q_collocations_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = toks.select(
        F.col("tok").alias("x"), F.lead("tok").over(w).alias("y")
    ).filter(F.col("y").isNotNull())
    # One corpus pass: materialize the distinct-pair rollup (vocab^2
    # rows at most) so the three marginal re-aggregations below read
    # the tiny table instead of re-running the scan+window per branch
    # (unchecked, Spark recomputes the lineage 4x — measured 22
    # exchanges / 4 parquet scans in the naive plan).
    pc = (
        pairs.groupBy("x", "y")
        .agg(F.count("*").alias("c_xy"))
        .localCheckpoint()
    )
    cx = pc.groupBy("x").agg(F.sum("c_xy").alias("c_x"))
    cy = pc.groupBy("y").agg(F.sum("c_xy").alias("c_y"))
    n = pc.agg(F.sum("c_xy").alias("n_pairs"))
    lift = (F.col("c_xy").cast("double") * F.col("n_pairs").cast("double")) / (
        F.col("c_x").cast("double") * F.col("c_y").cast("double")
    )
    return (
        pc.join(F.broadcast(cx), "x")
        .join(F.broadcast(cy), "y")
        .crossJoin(F.broadcast(n))
        .filter(F.col("c_xy") >= _MIN_PAIR)
        .select(
            "x", "y", "c_xy", "c_x", "c_y", "n_pairs", lift.alias("lift")
        )
        .orderBy(F.desc("lift"), "x", "y")
        .limit(20)
    )


@register(
    "q_winnow_fingerprints",
    cost=1,
    category="text",
    doc=(
        "Winnowing fingerprints (Schleimer et al. '03 / MOSS): md5 "
        "4-token-gram hashes, the leftmost-minimal (hash, pos) of "
        "every window of 4 consecutive grams is selected, so any "
        "shared 7-token run between documents is guaranteed a shared "
        "fingerprint — the robust sketch plagiarism/near-dup systems "
        "store instead of all grams (~1/w density). Per doc: gram and "
        "selection counts plus an order-canonical md5 digest of the "
        "distinct-fingerprint SET, so the driver hash pins the exact "
        "selection. One explode, one doc_id exchange reused by both "
        "window passes and the rollups; no joins beyond doc_id."
    ),
    oracle=f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ),
        grams AS (
          SELECT doc_id, i AS pos,
                 md5(list_aggregate(w[i+1 : i+{_GRAM_K}],
                                    'string_agg', ' ')) AS g
          FROM toks, UNNEST(range(len(w) - {_GRAM_K} + 1)) AS t(i)
          WHERE len(w) >= {_GRAM_K}
        ),
        win AS (
          SELECT doc_id, pos, g,
                 min({{'g': g, 'pos': pos}}) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW
                        AND {_WINNOW_W - 1} FOLLOWING) AS sel,
                 COUNT(*) OVER (
                   PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN CURRENT ROW
                        AND {_WINNOW_W - 1} FOLLOWING) AS cnt
          FROM grams
        ),
        selected AS (
          SELECT DISTINCT doc_id,
                 struct_extract(sel, 'g') AS sg,
                 struct_extract(sel, 'pos') AS sp
          FROM win WHERE cnt = {_WINNOW_W}
        ),
        per_doc AS (
          SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id
        ),
        per_sel AS (
          SELECT doc_id,
                 COUNT(*) AS n_selected,
                 COUNT(DISTINCT sg) AS n_distinct_fp,
                 md5(list_aggregate(list_sort(list(DISTINCT sg)),
                                    'string_agg', '')) AS fp_digest
          FROM selected GROUP BY doc_id
        )
        SELECT doc_id, n_grams, n_selected, n_distinct_fp, fp_digest
        FROM per_doc JOIN per_sel USING (doc_id)
    """,
)
def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_s3_etl_spark.operators.text import winnow_fingerprints

    return winnow_fingerprints(
        load_table(spark, sf_dir, "documents"), k=_GRAM_K, w=_WINNOW_W
    )
