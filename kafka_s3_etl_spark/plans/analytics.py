"""Round-5 analytics / training-pipeline additions (batch 2).

Registered as the LAST plan module so the driver sweep's first-50
window stays untouched; every entry carries full local oracle evidence
(tests/test_oracle_parity.py + scripts/correctness_sim.py).

Hash-exactness pattern for the float outputs here (q_stats_moments,
q_linreg): accumulate EXACT integer sums (cents via ``ROUND(x*100)``,
integer keys, epoch days) in BIGINT, then combine them in ONE identical
double-arithmetic expression on both engines. IEEE 754 +,-,*,/,sqrt on
identical inputs with an identical expression tree is bit-deterministic,
so no rounding is needed at all — rounding would only re-introduce the
Spark-HALF_UP vs DuckDB-binary divergence. The BIGINT sums hold to
roughly sf10 on this corpus (documented per query); past that the same
plan shape carries with DECIMAL(38,0) partials.

Catalog:

* q_stats_moments — grouped mean/variance/stddev/correlation from exact
  integer power sums (the map-side-combinable moments pattern);
* q_linreg — per-group OLS slope+intercept of order total vs order date
  (regr_slope/regr_intercept semantics) from the same exact sums;
* q_mode_per_group — modal event type per user with a lexicographic
  tiebreak (native mode()/arg_max are tie-ambiguous on both engines);
* q_exists_correlated — correlated EXISTS + NOT EXISTS subqueries
  (Catalyst decorrelates to semi/anti joins — plan-pinned);
* q_islands — gaps-and-islands: consecutive active hours per user via
  the hour-minus-row_number grouping trick, one shuffle on the key;
* q_calendar_spine — date-spine densification: generated calendar LEFT
  JOIN daily rollup, zero-filled gaps (explode(sequence()) vs
  DuckDB generate_series);
* q_ohlc_bars — per (event_type, day) open/high/low/close/volume bars;
  open/close picked by lexicographic struct min/max over the
  (ts, event_id) total order — exact value selection, no float math;
* q_interval_overlap — peak concurrency over sessionized intervals via
  the +1/-1 sweep line with a RANGE-frame running sum (ties collapse
  into one frame, so equal timestamps cannot reorder the answer);
* q_global_shuffle — deterministic pseudo-random corpus shuffle: a
  multiplicative-hash bijection on [0, 2^32) (Fibonacci hashing; the
  classic seeded-permutation shuffle for training data) -> shard by
  permuted value -> per-shard position. The window partitions by
  shard, so no global sort and no single-partition window;
* q_shard_manifest — per-shard manifest (docs, chars, id bounds) over
  the same permutation: the "what landed where" audit a dataloader
  reads before streaming a shard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_s3_etl_spark.operators.temporal import sessionize
from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# Exact-moments statistics
# ---------------------------------------------------------------------------

# Shared double-combination formulas over exact BIGINT power sums.
# Interpolated VERBATIM into both the Spark select and the DuckDB
# oracle so the expression trees (and therefore the IEEE results) are
# identical. x = acctbal cents, y = custkey.
_MEAN = "CAST(sx AS DOUBLE) / (100.0 * n)"
_VAR = (
    "(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " / (n * (n - 1.0)) / 10000.0"
)
_CORR = (
    "(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
    " * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
)


@register(
    "q_stats_moments",
    category="statistics",
    doc=(
        "Grouped statistical moments (mean/var_samp/stddev_samp/corr) "
        "that hash-match exactly: per-group BIGINT power sums of acctbal "
        "cents and custkey (all map-side combinable), combined in one "
        "shared double expression. Native stddev_samp/corr would differ "
        "across engines in the last ulp from summation order. Sums hold "
        "in BIGINT to ~sf10 (sxx ~ n_group * 1e12)."
    ),
    oracle=f"""
        WITH s AS (
          SELECT c_nationkey,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(cx) AS sx, SUM(cx * cx) AS sxx,
                 SUM(ky) AS sy, SUM(ky * ky) AS syy,
                 SUM(cx * ky) AS sxy
          FROM (
            SELECT c_nationkey,
                   CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cx,
                   c_custkey AS ky
            FROM customer
          ) GROUP BY c_nationkey
        )
        SELECT c_nationkey, n AS n_customers,
               {_MEAN} AS mean_acctbal,
               {_VAR} AS var_acctbal,
               sqrt({_VAR}) AS stddev_acctbal,
               {_CORR} AS corr_key_acctbal
        FROM s
    """,
)
def q_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey",
        F.expr("CAST(ROUND(c_acctbal * 100) AS BIGINT)").alias("cx"),
        F.col("c_custkey").alias("ky"),
    )
    sums = cust.groupBy("c_nationkey").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("cx").alias("sx"),
        F.sum(F.expr("cx * cx")).alias("sxx"),
        F.sum("ky").alias("sy"),
        F.sum(F.expr("ky * ky")).alias("syy"),
        F.sum(F.expr("cx * ky")).alias("sxy"),
    )
    return sums.select(
        "c_nationkey",
        F.col("n").alias("n_customers"),
        F.expr(_MEAN).alias("mean_acctbal"),
        F.expr(_VAR).alias("var_acctbal"),
        F.expr(f"sqrt({_VAR})").alias("stddev_acctbal"),
        F.expr(_CORR).alias("corr_key_acctbal"),
    )


# Slope in cents/day from exact sums; shared verbatim (see module doc).
_SLOPE_C = (
    "(n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
)
_INTERCEPT = f"(CAST(sy AS DOUBLE) - {_SLOPE_C} * CAST(sx AS DOUBLE)) / (100.0 * n)"


@register(
    "q_linreg",
    category="statistics",
    doc=(
        "Per-priority OLS regression of order total (EUR) on order date "
        "(epoch days) — regr_slope/regr_intercept semantics, hash-exact "
        "via BIGINT sums (xy products ~6e15 at sf0.1; BIGINT holds to "
        "~sf100) combined in one shared double expression."
    ),
    oracle=f"""
        WITH s AS (
          SELECT o_orderpriority,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(xd) AS sx, SUM(xd * xd) AS sxx,
                 SUM(yc) AS sy, SUM(xd * yc) AS sxy
          FROM (
            SELECT o_orderpriority,
                   CAST(datediff('day', DATE '1970-01-01',
                                 CAST(o_orderdate AS DATE)) AS BIGINT) AS xd,
                   CAST(ROUND(o_totalprice * 100) AS BIGINT) AS yc
            FROM orders
          ) GROUP BY o_orderpriority
        )
        SELECT o_orderpriority, n AS n_orders,
               {_SLOPE_C} / 100.0 AS slope_eur_per_day,
               {_INTERCEPT} AS intercept_eur
        FROM s
    """,
)
def q_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.expr(
            "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)"
        ).alias("xd"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("yc"),
    )
    sums = orders.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("xd").alias("sx"),
        F.sum(F.expr("xd * xd")).alias("sxx"),
        F.sum("yc").alias("sy"),
        F.sum(F.expr("xd * yc")).alias("sxy"),
    )
    return sums.select(
        "o_orderpriority",
        F.col("n").alias("n_orders"),
        F.expr(f"{_SLOPE_C} / 100.0").alias("slope_eur_per_day"),
        F.expr(_INTERCEPT).alias("intercept_eur"),
    )


# ---------------------------------------------------------------------------
# Relational depth
# ---------------------------------------------------------------------------


@register(
    "q_mode_per_group",
    category="aggregation",
    doc=(
        "Modal event type per user, tie-broken lexicographically — "
        "count rollup then a rank-1 window; native mode() picks an "
        "arbitrary value on ties on both engines."
    ),
    oracle="""
        SELECT user_id, event_type AS modal_type, n_events
        FROM (
          SELECT user_id, event_type,
                 CAST(COUNT(*) AS BIGINT) AS n_events
          FROM events GROUP BY user_id, event_type
        )
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY n_events DESC, event_type) = 1
    """,
)
def q_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id", "event_type").agg(
        F.count("*").cast("bigint").alias("n_events")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("n_events").desc(), F.col("event_type")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("modal_type"), "n_events")
    )


_EXISTS_SQL = """
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM {customer} c
    WHERE EXISTS (
            SELECT 1 FROM {orders} o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
          )
      AND NOT EXISTS (
            SELECT 1 FROM {orders} o2
            WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F'
          )
"""


@register(
    "q_exists_correlated",
    category="joins",
    doc=(
        "Correlated EXISTS + NOT EXISTS subqueries: customers with a "
        "large order and no failed order. Catalyst decorrelates to a "
        "semi join + anti join on o_custkey — no per-row subquery "
        "execution (plan-pinned in tests/test_plans.py)."
    ),
    oracle=_EXISTS_SQL.format(customer="customer", orders="orders"),
)
def q_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_ecq")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_ecq")
    return spark.sql(_EXISTS_SQL.format(customer="customer_ecq", orders="orders_ecq"))


@register(
    "q_islands",
    category="temporal",
    doc=(
        "Gaps-and-islands: maximal runs of consecutive active hours per "
        "user (hour-number minus row_number is constant within a run). "
        "One shuffle on user_id; hour numbers are exact integers "
        "(date_trunc micros are always a multiple of 3.6e9)."
    ),
    oracle="""
        WITH hours AS (
          SELECT DISTINCT user_id,
                 epoch_us(date_trunc('hour', ts)) // 3600000000 AS hr
          FROM events
        ),
        grouped AS (
          SELECT user_id, hr,
                 hr - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY hr)
                     AS grp
          FROM hours
        )
        SELECT user_id,
               MIN(hr) AS start_hr, MAX(hr) AS end_hr,
               CAST(COUNT(*) AS BIGINT) AS n_hours
        FROM grouped GROUP BY user_id, grp
    """,
)
def q_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One explicit shuffle on user_id up front: hashpartitioning(user_id)
    # satisfies the clustering every later stage needs — the (user_id, hr)
    # distinct, the per-user window, and the (user_id, grp) aggregate all
    # run exchange-free on top of it (pinned in tests/test_plans.py).
    hours = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("unix_micros(date_trunc('HOUR', ts)) DIV 3600000000").alias("hr"),
        )
        .repartition("user_id")
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("hr")
    return (
        hours.withColumn("grp", F.col("hr") - F.row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(
            F.min("hr").alias("start_hr"),
            F.max("hr").alias("end_hr"),
            F.count("*").cast("bigint").alias("n_hours"),
        )
        .drop("grp")
    )


@register(
    "q_calendar_spine",
    category="temporal",
    doc=(
        "Date-spine densification: the generated calendar over the "
        "order-date range LEFT JOINs the daily rollup; gap days carry "
        "zero. Revenue stays exact: cents sum in BIGINT, one division. "
        "The spine is explode(sequence(...)) from a 1-row bounds agg — "
        "no driver-side date loop."
    ),
    oracle="""
        WITH b AS (
          SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
                 MAX(CAST(o_orderdate AS DATE)) AS hi
          FROM orders
        ),
        spine AS (
          SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE)
                     AS day
          FROM b
        ),
        daily AS (
          SELECT CAST(o_orderdate AS DATE) AS day,
                 CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
          FROM orders GROUP BY 1
        )
        SELECT s.day,
               CAST(COALESCE(d.n, 0) AS BIGINT) AS n_orders,
               CAST(COALESCE(d.cents, 0) AS DOUBLE) / 100.0 AS revenue_eur
        FROM spine s LEFT JOIN daily d USING (day)
    """,
)
def q_calendar_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    spine = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)")).alias("cents"),
    )
    return spine.join(daily, "day", "left").select(
        "day",
        F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_orders"),
        (F.coalesce(F.col("cents"), F.lit(0)).cast("double") / 100.0).alias(
            "revenue_eur"
        ),
    )


@register(
    "q_ohlc_bars",
    category="temporal",
    doc=(
        "OHLC downsampling: per (event_type, day) open/high/low/close of "
        "the event value plus cents-exact volume. Open/close are value "
        "selections via lexicographic struct extremes over the "
        "(ts, event_id) total order — no float arithmetic, no rounding."
    ),
    oracle="""
        SELECT event_type, CAST(ts AS DATE) AS day,
               (MIN(struct_pack(t := ts, e := event_id, v := value))).v AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               (MAX(struct_pack(t := ts, e := event_id, v := value))).v AS close,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
                   AS volume
        FROM events
        GROUP BY event_type, CAST(ts AS DATE)
    """,
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    tev = F.struct(
        F.col("ts").alias("t"), F.col("event_id").alias("e"), F.col("value").alias("v")
    )
    return events.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.min(tev)["v"].alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(tev)["v"].alias("close"),
        F.count("*").cast("bigint").alias("n_events"),
        (
            F.sum(F.expr("CAST(ROUND(value * 100) AS BIGINT)")).cast("double") / 100.0
        ).alias("volume"),
    )


# Shared by q_interval_overlap and its scalable twin (plans/scalewin.py)
# — both must produce the identical answer.
INTERVAL_OVERLAP_ORACLE = """
        WITH marked AS (
          SELECT user_id, ts,
                 CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                               PARTITION BY user_id ORDER BY ts)
                           <= 600000000
                      THEN 0 ELSE 1 END AS new_session
          FROM events
        ),
        numbered AS (
          SELECT user_id, ts,
                 SUM(new_session) OVER (
                     PARTITION BY user_id ORDER BY ts
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS session_id
          FROM marked
        ),
        sessions AS (
          SELECT user_id, session_id,
                 MIN(ts) AS session_start, MAX(ts) AS session_end
          FROM numbered GROUP BY user_id, session_id
        ),
        pts AS (
          SELECT epoch_us(session_start) AS t, 1 AS d FROM sessions
          UNION ALL
          SELECT epoch_us(session_end) + 1 AS t, -1 AS d FROM sessions
        ),
        run AS (
          SELECT t, CAST(SUM(d) OVER (
                     ORDER BY t
                     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS c
          FROM pts
        )
        SELECT (MAX(struct_pack(c := c, nt := -t))).c AS max_concurrent,
               -(MAX(struct_pack(c := c, nt := -t))).nt AS at_epoch_us
        FROM run
    """


@register(
    "q_interval_overlap",
    category="temporal",
    cost=1,
    doc=(
        "Peak concurrency over sessionized intervals (+1 at start, -1 "
        "just past end) with a RANGE-frame running sum, so coincident "
        "boundary points collapse into one frame and the answer is "
        "batching-order independent. ORACLE-PARITY TWIN, not the "
        "headline shape: the final sweep is a global single-partition "
        "window over 2 rows per session — fine here, O(sessions) "
        "through one task at scale. q_interval_overlap_scalable "
        "(plans/scalewin.py) hash-matches this oracle with the "
        "distributed two-phase prefix sum and is the shape to copy."
    ),
    oracle=INTERVAL_OVERLAP_ORACLE,
)
def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    sessions = sessionize(load_table(spark, sf_dir, "events"))
    pts = sessions.select(
        F.unix_micros("session_start").alias("t"), F.lit(1).alias("d")
    ).unionByName(
        sessions.select(
            (F.unix_micros("session_end") + F.lit(1)).alias("t"),
            F.lit(-1).alias("d"),
        )
    )
    w = Window.orderBy("t").rangeBetween(Window.unboundedPreceding, Window.currentRow)
    run = pts.select("t", F.sum("d").over(w).alias("c"))
    pick = F.max(F.struct(F.col("c").alias("c"), (-F.col("t")).alias("nt")))
    return run.agg(
        pick["c"].alias("max_concurrent"), (-pick["nt"]).alias("at_epoch_us")
    )


# ---------------------------------------------------------------------------
# Training-data pipeline: deterministic shuffle + sharding
# ---------------------------------------------------------------------------

# Knuth's multiplicative-hash constant (2654435761 = floor(2^32/phi),
# odd => coprime with 2^32), a bijection on [0, 2^32): every doc gets a
# unique pseudo-random position, i.e. a seedable permutation — the
# standard deterministic shuffle for training corpora.
_PERM = "(doc_id * 2654435761) % 4294967296"
_N_SHARDS = 8


@register(
    "q_global_shuffle",
    category="prep",
    doc=(
        "Deterministic corpus shuffle for training: a multiplicative-"
        "hash bijection permutes doc ids, shards by permuted value, and "
        "numbers positions WITHIN each shard — the window partitions on "
        "shard, so there is no global sort and no single-partition "
        "window at any scale. Re-runs (and engine swaps) produce the "
        "byte-identical order."
    ),
    oracle=f"""
        WITH p AS (
          SELECT doc_id, {_PERM} AS perm FROM documents
        )
        SELECT doc_id,
               CAST(perm % {_N_SHARDS} AS INTEGER) AS shard,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY perm % {_N_SHARDS} ORDER BY perm
               ) AS BIGINT) AS pos
        FROM p
    """,
)
def q_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_PERM).alias("perm")
    )
    w = Window.partitionBy(F.expr(f"perm % {_N_SHARDS}")).orderBy("perm")
    return docs.select(
        "doc_id",
        F.expr(f"CAST(perm % {_N_SHARDS} AS INT)").alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


@register(
    "q_shard_manifest",
    category="prep",
    doc=(
        "Shard manifest over the deterministic shuffle: per shard the "
        "document count, total characters, and id bounds — the audit "
        "record a dataloader checks before streaming a shard. Pure "
        "map-side-combinable aggregates on the 8-value shard key."
    ),
    oracle=f"""
        SELECT CAST({_PERM} % {_N_SHARDS} AS INTEGER) AS shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars,
               MIN(doc_id) AS min_doc_id,
               MAX(doc_id) AS max_doc_id
        FROM documents
        GROUP BY 1
    """,
)
def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(
        F.expr(f"CAST({_PERM} % {_N_SHARDS} AS INT)").alias("shard")
    ).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


# ---------------------------------------------------------------------------
# LM quality scoring, Z-order clustering, compaction
# ---------------------------------------------------------------------------


@register(
    "q_lm_score",
    category="text",
    doc=(
        "CCNet-style unigram-LM quality score: per-doc average token "
        "log-probability under the corpus's own unigram distribution "
        "(the perplexity filter for data curation). Hash-exact floats: "
        "ln() once per vocab word, quantized to integer micro-nats, "
        "BIGINT accumulation, one division."
    ),
    oracle="""
        WITH toks AS (
          SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
          FROM documents
        ),
        vocab AS (SELECT token, COUNT(*) AS c FROM toks GROUP BY token),
        tot AS (SELECT SUM(c) AS t FROM vocab),
        lpq AS (
          SELECT token,
                 CAST(ROUND(ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE))
                            * 1000000) AS BIGINT) AS lpq
          FROM vocab, tot
        ),
        dt AS (
          SELECT doc_id, token, COUNT(*) AS ndt
          FROM toks GROUP BY doc_id, token
        )
        SELECT doc_id,
               CAST(SUM(ndt) AS BIGINT) AS n_tokens,
               CAST(SUM(ndt * lpq) AS DOUBLE) / 1e6
                   / CAST(CAST(SUM(ndt) AS BIGINT) AS DOUBLE) AS avg_logprob
        FROM dt JOIN lpq USING (token) GROUP BY doc_id
    """,
)
def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_s3_etl_spark.operators.text import lm_quality_score

    return lm_quality_score(load_table(spark, sf_dir, "documents"))


def _duck_znorm(col: str, lo: str, hi: str) -> str:
    return (
        f"CAST(CASE WHEN {hi} = {lo} THEN 0 ELSE "
        f"floor((CAST({col} AS DOUBLE) - {lo}) * 65535.0 / ({hi} - {lo})) "
        f"END AS BIGINT)"
    )


def _duck_zexpr(a: str, b: str) -> str:
    terms = [
        f"(((({a}) >> {i}) & 1) << {2 * i}) + (((({b}) >> {i}) & 1) << {2 * i + 1})"
        for i in range(16)
    ]
    return " + ".join(terms)


_DUCK_Z = _duck_zexpr(
    _duck_znorm("o_custkey", "alo", "ahi"), _duck_znorm("oday", "blo", "bhi")
)


@register(
    "q_zorder_cluster",
    category="lakehouse",
    doc=(
        "Z-order clustering values: each order's (custkey, order-day) "
        "bit-interleaved into a Z-value + coarse Z-bucket — the "
        "multi-dimensional clustering key OPTIMIZE ZORDER BY sorts on, "
        "so file min/max stats prune filters on EITHER dimension. "
        "Bounds via a 1-row broadcast aggregate; the projection itself "
        "is scan-parallel integer/IEEE arithmetic, identical on both "
        "engines (no rounding). zorder_write covers the file-layout "
        "half (tests/test_maintenance.py pins actual file skipping)."
    ),
    oracle=f"""
        WITH src AS (
          SELECT o_orderkey, o_custkey,
                 CAST(datediff('day', DATE '1970-01-01',
                               CAST(o_orderdate AS DATE)) AS BIGINT) AS oday
          FROM orders
        ),
        b AS (
          SELECT MIN(CAST(o_custkey AS DOUBLE)) AS alo,
                 MAX(CAST(o_custkey AS DOUBLE)) AS ahi,
                 MIN(CAST(oday AS DOUBLE)) AS blo,
                 MAX(CAST(oday AS DOUBLE)) AS bhi
          FROM src
        )
        SELECT o_orderkey,
               {_DUCK_Z} AS zval,
               CAST(({_DUCK_Z}) >> 26 AS INTEGER) AS zbucket
        FROM src, b
    """,
)
def q_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_s3_etl_spark.operators.maintenance import zorder_values

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr(
            "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01') AS BIGINT)"
        ).alias("oday"),
    )
    return zorder_values(orders, "o_orderkey", "o_custkey", "oday", n_buckets=64)


# Compacted-table scratch per sf_dir (testdata is immutable).
_COMPACT_CACHE: dict[str, str] = {}


@register(
    "q_compact_files",
    category="lakehouse",
    cost=1,
    doc=(
        "Small-file compaction (the OPTIMIZE maintenance pass): a "
        "64-fragment documents table bin-packed into size-targeted "
        "files via repartition (parallel read, unlike coalesce), then "
        "read back — proving the rewrite is content-preserving. File "
        "counts pinned in tests/test_maintenance.py."
    ),
    oracle="SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def q_compact_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_s3_etl_spark.operators.maintenance import compact_small_files
    from kafka_s3_etl_spark.streaming.runner import scratch_dir

    cols = ["doc_id", "text", "lang", "source", "n_chars"]
    if sf_dir not in _COMPACT_CACHE:
        docs = load_table(spark, sf_dir, "documents").select(cols)
        frag = scratch_dir("frag")
        docs.repartition(64).write.mode("overwrite").parquet(frag)
        out = scratch_dir("compacted")
        compact_small_files(spark, frag, out)
        _COMPACT_CACHE[sf_dir] = out
    return spark.read.parquet(_COMPACT_CACHE[sf_dir]).select(cols)


# ---------------------------------------------------------------------------
# Composite relational benchmarks (TPC-H shapes) + funnel analytics
# ---------------------------------------------------------------------------


@register(
    "q_tpch_pricing",
    category="relational",
    doc=(
        "TPC-H Q1 shape (pricing summary report): the classic composite "
        "scan -> filter -> wide grouped aggregation. Hash-exact floats "
        "via integer units: quantities are integral, prices are cents, "
        "discount/tax are integer percent, so disc_price accumulates in "
        "cents x pct (1e4 scale) and charge in cents x pct^2 (1e6 "
        "scale) — BIGINT holds to ~sf10; past that the same plan "
        "carries with DECIMAL(38,0) partials. One map-side-combined "
        "shuffle on a 6-value group key."
    ),
    oracle="""
        WITH s AS (
          SELECT l_returnflag, l_linestatus,
                 CAST(ROUND(l_quantity) AS BIGINT) AS qty,
                 CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents,
                 CAST(ROUND(l_discount * 100) AS BIGINT) AS dpc,
                 CAST(ROUND(l_tax * 100) AS BIGINT) AS tpc
          FROM lineitem
          WHERE l_shipdate <= TIMESTAMP '2001-08-01 00:00:00'
        )
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(qty) AS BIGINT) AS sum_qty,
               CAST(SUM(cents) AS DOUBLE) / 100.0 AS sum_base_price,
               CAST(SUM(cents * (100 - dpc)) AS DOUBLE) / 1e4
                   AS sum_disc_price,
               CAST(SUM(cents * (100 - dpc) * (100 + tpc)) AS DOUBLE) / 1e6
                   AS sum_charge,
               CAST(SUM(qty) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM(cents) AS DOUBLE) / 100.0 / COUNT(*) AS avg_price,
               CAST(SUM(dpc) AS DOUBLE) / 100.0 / COUNT(*) AS avg_disc,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM s GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= "2001-08-01 00:00:00")
        .select(
            "l_returnflag",
            "l_linestatus",
            F.expr("CAST(ROUND(l_quantity) AS BIGINT)").alias("qty"),
            F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT)").alias("cents"),
            F.expr("CAST(ROUND(l_discount * 100) AS BIGINT)").alias("dpc"),
            F.expr("CAST(ROUND(l_tax * 100) AS BIGINT)").alias("tpc"),
        )
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty").cast("bigint").alias("sum_qty"),
        F.expr("CAST(SUM(cents) AS DOUBLE) / 100.0").alias("sum_base_price"),
        F.expr("CAST(SUM(cents * (100 - dpc)) AS DOUBLE) / 1e4").alias(
            "sum_disc_price"
        ),
        F.expr(
            "CAST(SUM(cents * (100 - dpc) * (100 + tpc)) AS DOUBLE) / 1e6"
        ).alias("sum_charge"),
        F.expr("CAST(SUM(qty) AS DOUBLE) / COUNT(*)").alias("avg_qty"),
        F.expr("CAST(SUM(cents) AS DOUBLE) / 100.0 / COUNT(*)").alias("avg_price"),
        F.expr("CAST(SUM(dpc) AS DOUBLE) / 100.0 / COUNT(*)").alias("avg_disc"),
        F.count("*").cast("bigint").alias("count_order"),
    )


@register(
    "q_tpch_shipping",
    category="relational",
    doc=(
        "TPC-H Q3 shape (shipping priority): segment-filtered customer "
        "dim BROADCAST into orders, shuffle join to lineitem on the "
        "order key, cents-exact revenue rollup, top-10 via "
        "TakeOrderedAndProject (never a global sort). Revenue ties are "
        "broken by (o_orderdate, o_orderkey) so the limit is "
        "deterministic on both engines."
    ),
    oracle="""
        SELECT l.l_orderkey,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT)))
                    AS DOUBLE) / 1e4 AS revenue,
               o.o_orderdate, o.o_orderpriority
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
          AND l.l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
        LIMIT 10
    """,
)
def q_tpch_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-06-01 00:00:00"
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-06-01 00:00:00"
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.expr(
                "CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)"
                " * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))"
                " AS DOUBLE) / 1e4"
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q_window_funnel",
    category="temporal",
    doc=(
        "Conversion funnel (view -> click -> purchase, each step "
        "strictly after the previous): prefix-min windows carry the "
        "earliest qualifying prior-step timestamp to every row, so the "
        "whole funnel is ONE event-stream shuffle on user_id (stacked "
        "same-spec windows + a co-located agg, plan-pinned) — the "
        "join-chain formulation would scan and shuffle events six "
        "times. The oracle states the same semantics as the naive "
        "3-stage CTE chain."
    ),
    oracle="""
        WITH v AS (
          SELECT user_id, MIN(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
          SELECT e.user_id, MIN(e.ts) AS t2
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t1
          GROUP BY e.user_id
        ),
        p AS (
          SELECT e.user_id, MIN(e.ts) AS t3
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t2
          GROUP BY e.user_id
        )
        SELECT v.user_id, v.t1, c.t2, p.t3,
               CAST(1 + CASE WHEN c.t2 IS NULL THEN 0 ELSE 1 END
                      + CASE WHEN p.t3 IS NULL THEN 0 ELSE 1 END
                    AS INTEGER) AS steps
        FROM v
        LEFT JOIN c ON v.user_id = c.user_id
        LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def q_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id"
    )
    # Prefix frame in event-time order: r1 at a click row is the
    # earliest view ts among events up to it, which equals the user's
    # global first view EXACTLY WHEN that view precedes the click — so
    # the strict `r1 < ts` test reproduces "click strictly after first
    # view" row-locally. Same argument chains r2 into the purchase step.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_view = F.col("event_type") == "view"
    staged = (
        ev.withColumn("r1", F.min(F.when(is_view, F.col("ts"))).over(w))
        .withColumn(
            "c2",
            F.when(
                (F.col("event_type") == "click") & (F.col("r1") < F.col("ts")),
                F.col("ts"),
            ),
        )
        .withColumn("r2", F.min("c2").over(w))
        .withColumn(
            "c3",
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("r2") < F.col("ts")),
                F.col("ts"),
            ),
        )
    )
    return (
        staged.groupBy("user_id")
        .agg(
            F.min(F.when(is_view, F.col("ts"))).alias("t1"),
            F.min("c2").alias("t2"),
            F.min("c3").alias("t3"),
        )
        .filter(F.col("t1").isNotNull())
        .select(
            "user_id",
            "t1",
            "t2",
            "t3",
            F.expr(
                "CAST(1 + CASE WHEN t2 IS NULL THEN 0 ELSE 1 END"
                " + CASE WHEN t3 IS NULL THEN 0 ELSE 1 END AS INT)"
            ).alias("steps"),
        )
    )
