"""Skew-mitigation join: explicit key salting.

AQE's skew-join split handles most skew at runtime; salting is the
deterministic, planner-independent fallback for keys so hot they
overwhelm a single post-split task (the classic 100 TB failure mode:
one null-ish or default key holding 10% of a fact table).

Mechanics: the fact side sprays each row into one of ``salt_n``
sub-keys via a deterministic hash of its full row identity; the dim
side is replicated ``salt_n`` times (an explode, cheap because the dim
is the small side). The join key becomes (key, salt), so the hot key's
rows spread over ``salt_n`` tasks. Result is row-identical to the
unsalted join — which is exactly how the oracle checks it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_N = 8


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    dim_key: str,
    fact_salt_cols: list[str],
    salt_n: int = SALT_N,
    how: str = "inner",
) -> DataFrame:
    """Inner/left equi join on ``fact.key == dim.dim_key`` with salted
    key distribution. ``fact_salt_cols`` must identify fact rows well
    enough to spread them (any high-cardinality columns work; the salt
    only affects placement, never the result)."""
    salt: Column = F.pmod(F.xxhash64(*[F.col(c) for c in fact_salt_cols]), F.lit(salt_n))
    f = fact.withColumn("_salt", salt.cast("int"))
    d = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)))
    )
    joined = f.join(d, (f[key] == d[dim_key]) & (f["_salt"] == d["_salt"]), how)
    return joined.drop("_salt")
