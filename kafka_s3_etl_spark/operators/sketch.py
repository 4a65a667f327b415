"""Bounded-memory summary operators: Misra-Gries heavy hitters and a
2-D skyline (Pareto frontier).

Heavy hitters is the canonical two-pass exact pattern for 100 TB
frequency mining:

  pass 1 (map-only)  — per-partition Misra-Gries summaries with m
                       counters each. MG guarantees any item whose
                       TRUE partition count exceeds n_p/(m+1) survives
                       that partition's summary; by pigeonhole, any
                       item with GLOBAL count >= n/(m+1) survives in
                       at least one partition (if it fell below
                       n_p/(m+1) everywhere, its total would be below
                       n/(m+1)). With m >= k the candidate set is a
                       SUPERSET of every item with count >= n/k.
  pass 2 (verify)    — exact counts of the candidates AND the grand
                       total in ONE aggregation: a broadcast left join
                       tags candidate rows, everything else collapses
                       into a NULL group, and n_total is the sum over
                       the <= 2k+1 grouped rows. The threshold filter
                       then makes the output EXACT (no false
                       positives, none missed) with exactly two corpus
                       scans.

So the sketch buys bounded memory (m counters per task, independent of
the item domain) while the final answer stays hash-checkable against a
plain GROUP BY ... HAVING oracle — approximation in the plan, not in
the result.

The skyline keeps points minimal in BOTH dimensions. The distributed
shape: one map-side-combined min(y) per distinct x (the only corpus
pass), then a running strict-prefix min over the per-x minima — a
window over |distinct x| rows, corpus-independent — and a broadcast
semi-join back to fetch the surviving points. Equivalent to the
NOT EXISTS dominance definition because (a) within one x only the
minimal y can be undominated, and (b) a pair (x, y) with the sweep in
x-order is dominated iff some strictly-smaller x reached a y' <= y.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _mg_summarize(col: str, m: int):
    """mapInPandas body: one Misra-Gries summary per partition.

    Peak memory is a HARD 2m dict entries: each Arrow batch's
    value_counts is merged in chunks of <= m items with a decrement
    round after every chunk, so the summary never holds more than
    m (carried) + m (one chunk) entries — independent of both the item
    domain AND the per-batch distinct count. The decrement subtracts
    the (len-m)-th smallest counter from everyone; >= m+1 counters lose
    that amount each round, so any item's cumulative deficit is at most
    n_p/(m+1) (the standard aggressive-MG argument), preserving the
    superset guarantee heavy_hitters' verify pass relies on.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary: dict = {}
        for pdf in batches:
            counts = pdf[col].value_counts()
            for lo in range(0, len(counts), m):
                for item, c in counts.iloc[lo : lo + m].items():
                    summary[item] = summary.get(item, 0) + int(c)
                summary = _mg_prune(summary, m)
        yield pd.DataFrame({col: list(summary.keys())})

    return fn


def _mg_prune(summary: dict, m: int) -> dict:
    """One Misra-Gries decrement round: if over budget, subtract the
    (len-m)-th smallest counter from everyone; at least len-m items hit
    zero, restoring len <= m. Split out so tests can instrument the
    peak dict size at every prune point."""
    if len(summary) <= m:
        return summary
    vals = sorted(summary.values())
    dec = vals[len(summary) - m - 1]
    return {i: c - dec for i, c in summary.items() if c > dec}


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """Exact items with count >= ceil(n/k), found via per-partition
    Misra-Gries candidates (m = 2k counters, peak 4k dict entries per
    task — see _mg_summarize) + an exact verify pass.

    Returns (col, n_occurrences) — identical to the naive
    GROUP BY/HAVING, and the corpus is touched exactly TWICE: the MG
    candidate pass and one verify aggregation. The verify pass folds
    n_total in by bucketing non-candidate rows under a NULL group (a
    broadcast left join + conditional group key, still map-side
    combined), so the grand total is the sum over <= 2k+1 grouped rows
    — no third corpus scan for count(*)."""
    src = df.select(col)
    m = 2 * k
    candidates = src.mapInPandas(
        _mg_summarize(col, m), schema=f"{col} {dict(src.dtypes)[col]}"
    ).distinct()
    grouped = (
        src.join(
            F.broadcast(candidates.withColumn("_cand", F.lit(True))),
            col,
            "left",
        )
        # non-candidates (and null items, which can never be candidates)
        # collapse into one NULL group that only feeds the total
        .groupBy(F.when(F.col("_cand"), F.col(col)).alias(col))
        .agg(F.count("*").alias("n_occurrences"))
    )
    # grand total over the grouped rows (<= 2k+1 of them, corpus-
    # independent) via an unpartitioned window — tiny by construction
    return (
        grouped.withColumn(
            "n_total", F.sum("n_occurrences").over(Window.partitionBy())
        )
        # integer form of count >= ceil(n/k): count * k >= n
        .filter(
            F.col(col).isNotNull()
            & (F.col("n_occurrences") * k >= F.col("n_total"))
        )
        .select(col, "n_occurrences")
    )


def skyline_2d(df: DataFrame, x: str, y: str, *keep: str) -> DataFrame:
    """Points not dominated when minimizing both ``x`` and ``y``
    (q dominates p iff q.x <= p.x, q.y <= p.y, strict in one).

    One corpus aggregation (min y per distinct x, map-side combined),
    a strict-prefix running min over the per-x minima (|distinct x|
    rows — corpus-independent), and a broadcast join back."""
    min_y = df.groupBy(x).agg(F.min(y).alias("_min_y"))
    w = Window.orderBy(x).rowsBetween(Window.unboundedPreceding, -1)
    frontier = (
        min_y.withColumn("_prefix_min", F.min("_min_y").over(w))
        .filter(
            F.col("_prefix_min").isNull()
            | (F.col("_min_y") < F.col("_prefix_min"))
        )
        .select(x, F.col("_min_y").alias("_sky_y"))
    )
    return df.join(
        F.broadcast(frontier),
        (df[x] == frontier[x]) & (df[y] == frontier["_sky_y"]),
        "left_semi",
    ).select(x, y, *keep)


def countmin_sketch(
    items: DataFrame, col: str, depth: int = 4, width: int = 8192
) -> DataFrame:
    """Count-Min sketch of a column's frequency vector as a DataFrame
    of ``(r, pos, c)`` counter cells — the ONE-PASS bounded-state
    regime Misra-Gries' two-pass exact pattern can't serve (r7 verdict
    #7): one corpus pass, per-task state bounded by depth*width
    counters via the map-side combine, and the result is a mergeable
    summary (counters are sums, so sketches of shards union-combine by
    addition into exactly the single-pass global sketch).

    Each row increments ``depth`` counters at
    ``pmod(xxhash64(item, r), width)`` for r in [0, depth). Estimates
    read ``min`` over the item's depth cells — always >= the true
    count (counters only ever add), within eps*n (eps = e/width) with
    probability 1 - e^-depth. All JVM expressions: the explode feeds a
    hash aggregate whose partial rows are bounded by the sketch size,
    independent of the item domain."""
    return (
        items.select(
            F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("r"),
            F.col(col),
        )
        .select("r", F.expr(f"pmod(xxhash64({col}, r), {width})").alias("pos"))
        .groupBy("r", "pos")
        .agg(F.count("*").cast("bigint").alias("c"))
    )


def countmin_topk(
    items: DataFrame,
    col: str,
    k: int = 20,
    depth: int = 4,
    width: int = 8192,
) -> DataFrame:
    """Approximate top-k items by Count-Min estimated count (the
    sketch+heap one-pass pattern): build ``countmin_sketch`` over the
    corpus, probe it with the distinct-item dimension via a broadcast
    join (the sketch is depth*width rows — tiny and constant), take
    ``min`` over each item's depth cells, and keep the k largest
    estimates under the (est DESC, item) total order (deterministic
    tie-break; TakeOrdered, never a global sort).

    Returns (item-col, est_count). est_count >= the item's true count
    always; the top-k set can differ from the exact top-k only where
    true counts are within the sketch's eps*n error band —
    property-tested in tests/test_sketch_ops.py. Rows-only by design
    (estimates are sketch-valued); the EXACT alternative is
    ``heavy_hitters``."""
    cm = countmin_sketch(items, col, depth=depth, width=width)
    return (
        items.select(col)
        .distinct()
        .select(
            F.col(col),
            F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("r"),
        )
        .select(
            col, "r", F.expr(f"pmod(xxhash64({col}, r), {width})").alias("pos")
        )
        # inner join is total: every existing item incremented its own
        # depth cells, so all its (r, pos) rows exist in the sketch
        .join(F.broadcast(cm), ["r", "pos"])
        .groupBy(col)
        .agg(F.min("c").alias("est_count"))
        .orderBy(F.col("est_count").desc(), F.col(col))
        .limit(k)
    )
