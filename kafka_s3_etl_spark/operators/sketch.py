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
  pass 2 (verify)    — exact counts of the candidates only, via a
                       broadcast semi-join + map-side-combined count;
                       the threshold filter then makes the output
                       EXACT (no false positives, none missed).

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
    """mapInPandas body: one Misra-Gries summary per partition."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary: dict = {}
        for pdf in batches:
            for item, c in pdf[col].value_counts().items():
                summary[item] = summary.get(item, 0) + int(c)
            if len(summary) > m:
                # decrement step: subtract the (len-m)-th smallest
                # count from everyone; at least len-m items hit zero
                vals = sorted(summary.values())
                dec = vals[len(summary) - m - 1]
                summary = {i: c - dec for i, c in summary.items() if c > dec}
        yield pd.DataFrame({col: list(summary.keys())})

    return fn


def heavy_hitters(df: DataFrame, col: str, k: int) -> DataFrame:
    """Exact items with count >= ceil(n/k), found via per-partition
    Misra-Gries candidates (m = 2k counters) + an exact verify pass.

    Returns (col, n_occurrences) — identical to the naive
    GROUP BY/HAVING, but pass 1 never holds more than 2k counters per
    task regardless of the item domain's size."""
    src = df.select(col)
    m = 2 * k
    candidates = src.mapInPandas(
        _mg_summarize(col, m), schema=f"{col} {dict(src.dtypes)[col]}"
    ).distinct()
    total = src.agg(F.count("*").alias("n_total"))
    return (
        src.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("n_occurrences"))
        .crossJoin(F.broadcast(total))
        # integer form of count >= ceil(n/k): count * k >= n
        .filter(F.col("n_occurrences") * k >= F.col("n_total"))
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
