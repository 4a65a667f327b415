"""Snapshot diff — the table-versioning audit operator.

Given two snapshots of a keyed table (yesterday's export vs today's,
or a lakehouse version pair), classify every key as inserted, deleted,
or updated — the reconciliation report a migration/CDC-validation
pipeline produces before promoting a new snapshot.

Scale shape: ONE full-outer hash join on the key (both sides shuffle
once, partition-pruned if the snapshots are key-partitioned), then a
pure JVM column comparison — no fingerprint materialization pass, no
collect. Column comparison uses null-safe inequality (`IS DISTINCT
FROM` semantics via ``eqNullSafe``), so NULL -> value and value -> NULL
transitions count as updates.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(old: DataFrame, new: DataFrame, key: str) -> DataFrame:
    """Classify rows of ``new`` vs ``old`` by ``key``.

    Returns (key, change_type) for every key whose row changed:
    ``insert`` (key only in new), ``delete`` (key only in old),
    ``update`` (key in both, any non-key column differs null-safely).
    Unchanged keys are omitted. Both inputs must share the same schema.
    """
    cols = [c for c in old.columns if c != key]
    if set(old.columns) != set(new.columns):
        raise ValueError("snapshot_diff: snapshots must share a schema")
    o = old.select(
        F.col(key), F.struct(*cols).alias("_o"), F.lit(True).alias("_in_o")
    )
    n = new.select(
        F.col(key), F.struct(*cols).alias("_n"), F.lit(True).alias("_in_n")
    )
    joined = o.join(n, on=key, how="full_outer")
    changed = reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"_o.{c}").eqNullSafe(F.col(f"_n.{c}"))
            for c in cols
        ],
    )
    return (
        joined.withColumn(
            "change_type",
            F.when(F.col("_in_o").isNull(), F.lit("insert"))
            .when(F.col("_in_n").isNull(), F.lit("delete"))
            .when(changed, F.lit("update")),
        )
        .filter(F.col("change_type").isNotNull())
        .select(key, "change_type")
    )
