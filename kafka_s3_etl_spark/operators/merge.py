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
* every non-key column is taken from the source when the key matched,
  else from the target;
* ``action`` tags each output row 'U' (updated), 'I' (inserted), or
  'K' (kept) so downstream audits don't re-derive the diff.
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
    t, s = target.alias("t"), source.alias("s")
    merged = t.join(s, F.col(f"t.{key}") == F.col(f"s.{key}"), "full_outer")
    out = [
        F.coalesce(F.col(f"s.{c}"), F.col(f"t.{c}")).alias(c)
        for c in target.columns
    ]
    if action_col is not None:
        out.append(
            F.when(F.col(f"t.{key}").isNull(), "I")
            .when(F.col(f"s.{key}").isNull(), "K")
            .otherwise("U")
            .alias(action_col)
        )
    return merged.select(*out)
