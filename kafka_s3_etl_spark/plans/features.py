"""Round-5 feature-engineering / retrieval additions.

Registered as the last plan module (after lakehouse) so the driver
sweep's first-50 window is untouched — every entry here lands past the
sweep cap and carries the full local oracle evidence instead
(tests/test_oracle_parity.py + scripts/correctness_sim.py).

* q_scd2 — slowly-changing-dimension type-2 build: each user's event
  stream becomes versioned validity intervals (valid_from/valid_to/
  is_current), the dimension-history shape a lakehouse MERGE maintains;
* q_time_weighted_avg — per-user time-weighted average of the event
  value over the observation span (the irregular-sampling analogue of
  avg; TimescaleDB time_weight "LOCF" semantics). Hash-exact by
  construction: cents (events.value is 2-decimal) x exact
  interval micros accumulate in BIGINT and divide ONCE;
* q_knn_join — kNN join: EVERY embedding scored against a broadcast
  candidate set, top-3 as ranks — the assignment/retrieval shape
  (sim_topk is the inverse: few queries vs the whole corpus);
* q_feature_bin — equal-width feature binning of order totals
  (width_bucket shape) via floor arithmetic — identical IEEE ops on
  both engines, no rounding anywhere;
* q_lang_entropy — per-language Shannon entropy of the token-length
  distribution (a corpus-quality signal): exact counts aggregate
  map-side, the float log work happens on the tiny (lang, len) rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table


@register(
    "q_scd2",
    category="lakehouse",
    doc=(
        "SCD type-2 dimension build from an event stream: per user, "
        "each event opens a version valid until the next one (lead "
        "window over a (ts, event_id)-total order); the open version "
        "is flagged current. One shuffle on the entity key."
    ),
    oracle="""
        SELECT user_id,
               CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
               event_type AS state,
               ts AS valid_from,
               LEAD(ts) OVER w AS valid_to,
               (LEAD(ts) OVER w IS NULL) AS is_current
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return events.select(
        "user_id",
        F.row_number().over(w).cast("bigint").alias("version"),
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@register(
    "q_time_weighted_avg",
    category="temporal",
    doc=(
        "Per-user time-weighted average of value (each observation "
        "weighted by how long it held, LOCF): exact BIGINT accumulation "
        "of cents x interval-micros, ONE final division — hash-exact "
        "across engines with no rounding. Users with a single event "
        "have no held interval and yield NULL."
    ),
    oracle="""
        WITH seq AS (
          SELECT user_id,
                 CAST(round(value * 100) AS BIGINT) AS cents,
                 epoch_us(LEAD(ts) OVER w) - epoch_us(ts) AS dur
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(dur) AS BIGINT) AS span_micros,
               CAST(SUM(cents * dur) AS BIGINT)
                   / (100.0 * CAST(SUM(dur) AS BIGINT)) AS twa_value
        FROM seq GROUP BY user_id
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # value is 2-decimal by data contract: value*100 sits within 1e-9 of
    # an integer, so round() is the same exact integer on both engines
    # (never near a .5 boundary — this is the q_udaf cents pattern).
    seq = events.select(
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))).alias(
            "dur"
        ),
    )
    return seq.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum("dur").cast("bigint").alias("span_micros"),
        (
            F.sum(F.col("cents") * F.col("dur")).cast("bigint")
            / (F.lit(100.0) * F.sum("dur").cast("bigint"))
        ).alias("twa_value"),
    )


@register(
    "q_knn_join",
    cost=1,
    category="similarity",
    doc=(
        "kNN join: every corpus embedding scored by cosine against a "
        "broadcast candidate set (vec_id % 50 == 0, capped below 2000 — "
        "a codebook is a MODEL constant, sized independently of the "
        "corpus), top-3 emitted as RANKS (floats stay out of the hash; "
        "ties broken on candidate id). ZERO shuffle on the corpus side: "
        "the candidate set "
        "travels as a 1-row broadcast array, each vector's top-3 is "
        "computed inside one projection (array_sort on (negcos, id) "
        "structs + slice) and exploded — scan-parallel at any corpus "
        "size, vs the window formulation that would shuffle "
        "|candidates| x corpus rows. Norms are plain columns computed "
        "once per row/candidate behind the join boundary (CollapseProject "
        "cannot re-inline them into the 40-reference HOF lambda)."
    ),
    oracle="""
        WITH base AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ),
        cand AS (SELECT vec_id AS cand_id, e AS ce FROM base
                 WHERE vec_id % 50 = 0 AND vec_id < 2000),
        scored AS (
          SELECT b.vec_id, cand.cand_id,
                 list_cosine_similarity(b.e, cand.ce) AS cos
          FROM base b CROSS JOIN cand
        ),
        ranked AS (
          SELECT vec_id, cand_id,
                 ROW_NUMBER() OVER (PARTITION BY vec_id
                                    ORDER BY cos DESC, cand_id) AS rank
          FROM scored
        )
        SELECT vec_id, CAST(rank AS INTEGER) AS rank, cand_id
        FROM ranked WHERE rank <= 3
    """,
)
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_s3_etl_spark.operators.similarity import with_norm

    base = with_norm(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
        F.col("norm").alias("ne"),
    )
    cands = (
        base.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 2000))
        .select(
            F.struct(
                F.col("vec_id").alias("cand_id"),
                F.col("e").alias("ce"),
                F.col("ne").alias("cn"),
            ).alias("c")
        )
        .agg(F.array_sort(F.collect_list("c")).alias("cands"))
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    top3 = F.slice(
        F.array_sort(
            F.transform(
                "cands",
                lambda c: F.struct(
                    (-(dot(F.col("e"), c["ce"]) / (F.col("ne") * c["cn"]))).alias(
                        "negcos"
                    ),
                    c["cand_id"].alias("cand_id"),
                ),
            )
        ),
        1,
        3,
    )
    scored = base.crossJoin(F.broadcast(cands)).select("vec_id", top3.alias("t"))
    return scored.select(
        "vec_id", F.posexplode("t").alias("pos", "s")
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("int").alias("rank"),
        F.col("s.cand_id").alias("cand_id"),
    )


@register(
    "q_feature_bin",
    category="aggregation",
    doc=(
        "Equal-width feature binning (width_bucket shape) of order "
        "totals into 50k-wide bins: floor arithmetic only — identical "
        "IEEE ops on both engines, min/max per bin with no rounding."
    ),
    oracle="""
        SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bin,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               MIN(o_totalprice) AS min_price,
               MAX(o_totalprice) AS max_price
        FROM orders GROUP BY 1
    """,
)
def q_feature_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn(
            "bin", F.floor(F.col("o_totalprice") / 50000.0).cast("bigint")
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
    )


@register(
    "q_lang_entropy",
    cost=1,
    category="text",
    doc=(
        "Per-language Shannon entropy of the token-length distribution "
        "— a corpus-quality/drift signal. The corpus explode aggregates "
        "to exact (lang, len) counts map-side; all float log work runs "
        "on that tiny rollup, identical formula both engines, rounded "
        "once at 4 decimals."
    ),
    oracle="""
        WITH counts AS (
          SELECT lang, length(t) AS len, CAST(COUNT(*) AS BIGINT) AS c
          FROM documents, UNNEST(string_split(text, ' ')) AS u(t)
          GROUP BY 1, 2
        ),
        tot AS (
          SELECT lang, SUM(c) AS n, SUM(c * log2(c)) AS clog
          FROM counts GROUP BY lang
        )
        SELECT lang,
               CAST(n AS BIGINT) AS n_tokens,
               ROUND(log2(CAST(n AS DOUBLE)) - clog / n, 4) AS len_entropy
        FROM tot
    """,
)
def q_lang_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("t"))
        .groupBy("lang", F.length("t").alias("len"))
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    tot = counts.groupBy("lang").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("c") * F.log2("c")).alias("clog"),
    )
    return tot.select(
        "lang",
        F.col("n").cast("bigint").alias("n_tokens"),
        F.round(
            F.log2(F.col("n").cast("double")) - F.col("clog") / F.col("n"), 4
        ).alias("len_entropy"),
    )


@register(
    "q_event_transitions",
    category="temporal",
    doc=(
        "Markov transition counts over each user's event stream: lead "
        "window on the (ts, event_id)-total order, then an exact-count "
        "rollup of (from_type -> to_type) — the session-flow signal. "
        "One shuffle for the window; the pair rollup combines map-side."
    ),
    oracle="""
        WITH seq AS (
          SELECT event_type AS from_type,
                 LEAD(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS to_type
          FROM events
        )
        SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    return (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


@register(
    "q_cohort_retention",
    category="temporal",
    doc=(
        "Cohort retention matrix: users grouped by first-activity month "
        "(cohort), counted distinct per months-since-cohort offset — "
        "the engagement-analytics staple. Distinct (user, month) "
        "activity first (one shuffle), cohort via a whole-partition "
        "window min (reuses the user partitioning), exact-count rollup."
    ),
    oracle="""
        WITH activity AS (
          SELECT DISTINCT user_id,
                 CAST(date_trunc('month', ts) AS DATE) AS am
          FROM events
        ),
        with_cohort AS (
          SELECT user_id, am,
                 MIN(am) OVER (PARTITION BY user_id) AS cohort
          FROM activity
        )
        SELECT cohort,
               CAST(date_diff('month', cohort, am) AS INTEGER) AS month_offset,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM with_cohort GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    activity = events.select(
        "user_id", F.to_date(F.date_trunc("month", "ts")).alias("am")
    ).distinct()
    w = Window.partitionBy("user_id")
    with_cohort = activity.withColumn("cohort", F.min("am").over(w))
    # months_between on month-start dates is an exact whole number
    return (
        with_cohort.groupBy(
            "cohort",
            F.months_between("am", "cohort").cast("int").alias("month_offset"),
        )
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
    )


@register(
    "q_pii_scrub",
    category="text",
    doc=(
        "PII scrubbing pass (the compliance step of a training-data "
        "pipeline): mask email addresses, count the redactions, and "
        "fingerprint the scrubbed text. The corpus has no organic "
        "emails, so a deterministic contact line is appended first — "
        "the scrub provably fires on every document (n_emails >= 1). "
        "Regex kept to the Java/RE2 common subset."
    ),
    oracle="""
        WITH aug AS (
          SELECT doc_id,
                 text || ' contact: user' || CAST(doc_id AS VARCHAR)
                      || '@example.com' AS t
          FROM documents
        )
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '[A-Za-z0-9._]+@[A-Za-z0-9.]+'))
                    AS BIGINT) AS n_emails,
               CAST(length(regexp_replace(t, '[A-Za-z0-9._]+@[A-Za-z0-9.]+',
                                          '<EMAIL>', 'g')) AS BIGINT)
                   AS scrubbed_len,
               md5(regexp_replace(t, '[A-Za-z0-9._]+@[A-Za-z0-9.]+',
                                  '<EMAIL>', 'g')) AS scrubbed_md5
        FROM aug
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pat = "[A-Za-z0-9._]+@[A-Za-z0-9.]+"
    t = F.concat(
        F.col("text"),
        F.lit(" contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com"),
    )
    scrubbed = F.regexp_replace(t, pat, "<EMAIL>")
    return docs.select(
        "doc_id",
        F.regexp_count(t, F.lit(pat)).cast("bigint").alias("n_emails"),
        F.length(scrubbed).cast("bigint").alias("scrubbed_len"),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


@register(
    "q_window_percent_rank",
    category="window",
    doc=(
        "percent_rank + cume_dist per status over a (price, key)-total "
        "order — both are exact integer ratios evaluated identically on "
        "both engines (single int/int division, no rounding needed)."
    ),
    oracle="""
        SELECT o_orderkey,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )
