"""MERGE / upsert — the lakehouse CDC-apply primitive Spark core lacks
without a table format (Delta/Iceberg MERGE INTO).

``merge_upsert`` implements SCD-type-1 apply as pure DataFrame algebra:
source rows REPLACE matching target rows wholesale and INSERT unmatched
ones; untouched target rows pass through. One full-outer join on the
merge key — a single hash shuffle of each side — and a column-wise
coalesce. No window, no row_number, no driver participation, so the
plan is the same shape at 100 TB: join exchanges on the key, then a
projection. When the target is bucketed/partitioned by the key, the
join co-locates and the target side's exchange disappears entirely
(the bucketed-join path pinned in tests/test_bucketing.py).

Semantics (matching SQL MERGE with WHEN MATCHED THEN UPDATE SET * /
WHEN NOT MATCHED THEN INSERT *):

* source must be unique per key (CDC change-sets are; enforce upstream
  or pre-dedup with a latest-wins window);
* a matched source row replaces the target row WHOLESALE — including
  its genuine NULLs (a per-column coalesce would silently splice stale
  target values into NULL-ing updates);
* ``action`` tags each output row 'U' (updated), 'I' (inserted), or
  'K' (kept) so downstream audits don't re-derive the diff. Presence
  is tracked with literal flags, not key NULL-ness, so rows whose
  merge key IS NULL (which never join) are still tagged correctly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str,
    action_col: str | None = "action",
) -> DataFrame:
    """Apply ``source`` onto ``target`` by ``key`` (SCD1 upsert).

    Both inputs must share a schema. Returns target's columns (+ the
    optional action tag). ``action_col=None`` drops the tag.
    """
    if target.columns != source.columns:
        raise ValueError(
            f"merge_upsert: schemas differ: {target.columns} vs {source.columns}"
        )
    t = target.withColumn("_in_t", F.lit(True)).alias("t")
    s = source.withColumn("_in_s", F.lit(True)).alias("s")
    merged = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    # NULL on the flag column <=> that side had no row in this pair.
    matched_source = F.col("s._in_s").isNotNull()
    out = [
        F.when(matched_source, F.col(f"s.{c}"))
        .otherwise(F.col(f"t.{c}"))
        .alias(c)
        for c in target.columns
    ]
    if action_col is not None:
        out.append(
            F.when(matched_source & F.col("t._in_t").isNotNull(), "U")
            .when(matched_source, "I")
            .otherwise("K")
            .alias(action_col)
        )
    return merged.select(*out)
