"""Scalable global ranking: exact ROW_NUMBER/NTILE over a total order
WITHOUT the single-task global window sort.

`Window.orderBy(...)` with an empty partition spec funnels every row
through ONE task — the sort itself is the bottleneck at 100 TB, not
the rank arithmetic. The escape hatch promised in plans/mleval.py's
scale notes is implemented here: a value-histogram prefix sum.

    rn(c, k)  =  (# rows in buckets strictly before c's bucket)
               + row_number within the bucket

* `bucket = (c + shift) DIV width` — pure integer projection, no
  sampling (deterministic on both engines; repartitionByRange would
  also work but picks boundaries by reservoir sampling, which is
  harder to reason about for oracle parity).
* bucket counts roll up map-side to O(value_range / width) cells; the
  prefix-sum window runs over THAT rollup (thousands of rows), never
  the data;
* the per-bucket row_number window partitions by bucket — every
  partition sorts a bounded slice in parallel;
* offsets come back via one broadcast join.

Cost: one hash shuffle on bucket + one tiny broadcast, versus the
global window's one shuffle into a single sort task. Exactness does
NOT depend on bucket balance — skewed buckets only cost time.

NTILE is then pure arithmetic on (rn, n): with q = n DIV parts and
r = n % parts, the first r tiles have q+1 rows, so
    tile = (rn - 1) DIV (q + 1) + 1                 if rn <= (q+1)*r
         = r + (rn - (q+1)*r - 1) DIV q + 1         otherwise
— integer-exact on both engines (all operands non-negative).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def bucketed_global_row_number(
    df: DataFrame,
    value: str,
    tiebreak: str,
    *,
    shift: int,
    width: int = 256,
    descending: bool = True,
    rn_col: str = "rn",
    n_col: str = "n",
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Append exact ``rn`` (ROW_NUMBER over the (value [DESC],
    tiebreak ASC) total order) and group count ``n`` without a
    single-task sort. ``value`` must be an integer column with
    ``value + shift >= 0`` (Spark DIV truncates toward zero while an
    oracle's // floors; non-negative operands make them agree).

    ``partition_by`` generalizes the rank to PER-GROUP total orders
    (ROW_NUMBER ... OVER (PARTITION BY groups ORDER BY ...)): bucket
    counts, the prefix sum, and the local windows all carry the group
    columns, so even a LOW-cardinality partition column (e.g. 2
    periods, each holding half the corpus) never funnels a group
    through one task — the naive partitioned window would."""
    parts = list(partition_by or [])
    b = df.withColumn(
        "__bucket", F.expr(f"CAST(({value} + {shift}) DIV {width} AS BIGINT)")
    )
    counts = b.groupBy(*parts, "__bucket").agg(F.count("*").alias("__cnt"))
    order = (
        F.col("__bucket").desc() if descending else F.col("__bucket").asc()
    )
    # Prefix-sum + total over the BUCKET ROLLUP only (a few thousand
    # rows per group) — the lone data-independent-size window in the
    # plan (empty partition spec when partition_by is unset).
    w_off = Window.partitionBy(*parts).orderBy(order).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        *parts,
        "__bucket",
        F.coalesce(F.sum("__cnt").over(w_off), F.lit(0))
        .cast("bigint")
        .alias("__off"),
        F.sum("__cnt")
        .over(Window.partitionBy(*parts))
        .cast("bigint")
        .alias(n_col),
    )
    v_order = F.col(value).desc() if descending else F.col(value).asc()
    w_local = Window.partitionBy(*parts, "__bucket").orderBy(v_order, tiebreak)
    return (
        b.join(F.broadcast(offsets), [*parts, "__bucket"])
        .withColumn(
            rn_col,
            (F.col("__off") + F.row_number().over(w_local)).cast("bigint"),
        )
        .drop("__bucket", "__off", "__cnt")
    )


def ntile_expr(parts: int, rn: str = "rn", n: str = "n") -> str:
    """NTILE({parts}) as closed-form integer arithmetic on a global
    row number ``rn`` in 1..``n`` — the shared SQL string is embedded
    verbatim on both engines (swap DIV for // on the oracle side via
    .replace). Lazy CASE keeps the q=0 division unreachable when
    n < parts."""
    q = f"({n} DIV {parts})"
    r = f"({n} % {parts})"
    return (
        f"CAST(CASE WHEN {rn} <= ({q} + 1) * {r} "
        f"THEN ({rn} - 1) DIV ({q} + 1) + 1 "
        f"ELSE {r} + ({rn} - ({q} + 1) * {r} - 1) DIV {q} + 1 END "
        f"AS INTEGER)"
    )
