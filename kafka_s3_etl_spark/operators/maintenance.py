"""Lakehouse table-maintenance operators: small-file compaction and
Z-order clustering.

Both are the OPTIMIZE half of a table format (Delta OPTIMIZE /
OPTIMIZE ZORDER BY), expressed on plain parquet directories:

* ``compact_small_files`` — bin-packs a fragmented table into
  size-targeted files. Streaming sinks and per-batch CDC writes leave
  thousands of kilobyte files behind; at 100 TB the resulting
  footer/open overhead dominates scan time, so compaction is a
  first-class maintenance pass, not a nicety.
* ``zorder_values`` / ``zorder_write`` — interleave the bits of two
  clustering dimensions into a Z-value and range-partition + sort the
  table by it, so each output file covers a NARROW range of BOTH
  dimensions and min/max file statistics prune scans filtered on
  either one (the multi-dimensional-clustering trick linear sorting
  cannot give: sorting by (a, b) prunes a-filters only).

The Z-value is pure integer/float arithmetic (floor-normalize each
dimension to 16 bits, interleave via shift/and/or), identical on any
engine — which is what makes q_zorder_cluster DuckDB-oracle-checkable.
"""

from __future__ import annotations

import glob
import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

Z_BITS = 16


def compact_small_files(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Rewrite the parquet directory at ``src_path`` into
    ceil(total/target) files at ``dest_path``; returns the output file
    count. Uses repartition (round-robin, parallel) rather than
    coalesce: coalesce(n) would narrow the READ to n tasks and lose
    scan parallelism on a big table."""
    total = sum(
        os.path.getsize(p)
        for p in glob.glob(os.path.join(src_path, "part-*.parquet"))
    )
    n_files = max(1, math.ceil(total / target_bytes))
    spark.read.parquet(src_path).repartition(n_files).write.mode(
        "overwrite"
    ).parquet(dest_path)
    return n_files


def _zexpr(a_norm: str, b_norm: str) -> str:
    """Bit-interleave two 16-bit normalized values into a Z-value
    (a gets even bits, b odd) as one portable SQL expression."""
    terms = [
        f"(shiftleft(shiftright({a_norm}, {i}) & 1, {2 * i})"
        f" + shiftleft(shiftright({b_norm}, {i}) & 1, {2 * i + 1}))"
        for i in range(Z_BITS)
    ]
    return " + ".join(terms)


def _norm(col: str, lo: str, hi: str) -> str:
    """Floor-normalize ``col`` to [0, 2^Z_BITS): identical IEEE ops on
    every engine; degenerate ranges (hi == lo) map to 0."""
    scale = (1 << Z_BITS) - 1
    return (
        f"CAST(CASE WHEN {hi} = {lo} THEN 0 ELSE "
        f"floor((CAST({col} AS DOUBLE) - {lo}) * {scale}.0 / ({hi} - {lo})) "
        f"END AS BIGINT)"
    )


def zorder_values(
    df: DataFrame, key: str, dim_a: str, dim_b: str, n_buckets: int = 64
) -> DataFrame:
    """Z-value + coarse Z-bucket per row. Dimension bounds come from a
    1-row aggregate broadcast against the table (never a collect), so
    the projection itself is scan-parallel. ``n_buckets`` is the
    clustering granularity (== target file count for zorder_write)."""
    bounds = df.agg(
        F.min(F.col(dim_a).cast("double")).alias("alo"),
        F.max(F.col(dim_a).cast("double")).alias("ahi"),
        F.min(F.col(dim_b).cast("double")).alias("blo"),
        F.max(F.col(dim_b).cast("double")).alias("bhi"),
    )
    z = _zexpr(_norm(dim_a, "alo", "ahi"), _norm(dim_b, "blo", "bhi"))
    bucket_shift = 2 * Z_BITS - int(math.log2(n_buckets))
    return df.crossJoin(F.broadcast(bounds)).select(
        key,
        F.expr(z).alias("zval"),
        F.expr(f"CAST(shiftright({z}, {bucket_shift}) AS INT)").alias("zbucket"),
    )


def zorder_write(
    df: DataFrame,
    path: str,
    key: str,
    dim_a: str,
    dim_b: str,
    n_buckets: int = 64,
) -> None:
    """Cluster ``df`` by Z-value and write one file per Z-bucket range:
    repartitionByRange on zval + sortWithinPartitions gives every file
    a tight min/max envelope on BOTH dimensions, which parquet file
    statistics then turn into file skipping for filters on either."""
    bounds = df.agg(
        F.min(F.col(dim_a).cast("double")).alias("alo"),
        F.max(F.col(dim_a).cast("double")).alias("ahi"),
        F.min(F.col(dim_b).cast("double")).alias("blo"),
        F.max(F.col(dim_b).cast("double")).alias("bhi"),
    )
    z = _zexpr(_norm(dim_a, "alo", "ahi"), _norm(dim_b, "blo", "bhi"))
    out = (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("zval", F.expr(z))
        .drop("alo", "ahi", "blo", "bhi")
    )
    (
        out.repartitionByRange(n_buckets, "zval")
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(path)
    )
