"""Table-maintenance operators: compaction must shrink file counts
without touching content; Z-order clustering must produce files whose
min/max statistics actually prune filters on BOTH clustered dimensions
(the property a linear sort cannot give)."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from kafka_s3_etl_spark.operators.maintenance import (
    compact_small_files,
    zorder_write,
)
from kafka_s3_etl_spark.sources.tables import load_table
from kafka_s3_etl_spark.streaming.runner import scratch_dir


def _files(path: str) -> list[str]:
    return sorted(glob.glob(os.path.join(path, "part-*.parquet")))


def test_compact_preserves_content_and_shrinks_files(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    frag = scratch_dir("m_frag")
    docs.repartition(64).write.mode("overwrite").parquet(frag)
    assert len(_files(frag)) == 64

    out = scratch_dir("m_out")
    n = compact_small_files(spark, frag, out)
    assert len(_files(out)) == n == 1  # tiny table -> one target file

    before = sorted(map(tuple, docs.collect()))
    after = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert before == after


def _file_ranges(path: str, col: str) -> list[tuple[float, float]]:
    """(min, max) of ``col`` per parquet file from footer statistics —
    exactly what a scan's file-skipping reads."""
    out = []
    for f in _files(path):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((float(lo), float(hi)))
    return out


def _overlapping(ranges: list[tuple[float, float]], lo: float, hi: float) -> int:
    return sum(1 for a, b in ranges if not (b < lo or a > hi))


def test_zorder_files_prune_on_both_dimensions(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr(
            "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')"
            " AS BIGINT)"
        ).alias("oday"),
    )
    path = scratch_dir("m_zorder")
    zorder_write(orders, path, "o_orderkey", "o_custkey", "oday", n_buckets=16)
    files = _files(path)
    assert len(files) >= 8  # range partitioner may merge a couple

    klo, khi, dlo, dhi = orders.agg(
        F.min("o_custkey"), F.max("o_custkey"), F.min("oday"), F.max("oday")
    ).first()

    # Probe a narrow band (5% of the value range, placed at 37.5% —
    # interior to a Z-quarter, not on a quarter boundary) in EACH
    # dimension: the Z layout leaves most files' min/max envelopes
    # outside the band, so the scan skips them.
    def _band(lo: float, hi: float) -> tuple[float, float]:
        c = lo + (hi - lo) * 0.375
        w = (hi - lo) * 0.05
        return c - w / 2, c + w / 2

    for col, lo, hi in (("o_custkey", klo, khi), ("oday", dlo, dhi)):
        ranges = _file_ranges(path, col)
        hit = _overlapping(ranges, *_band(lo, hi))
        assert hit <= len(files) * 0.65, (col, hit, len(files), ranges)

    # Control: a LINEAR sort on o_custkey leaves (nearly) every file
    # overlapping the same oday band — the second dimension only prunes
    # because of the interleaved ordering.
    lin = scratch_dir("m_linear")
    (
        orders.repartitionByRange(16, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(lin)
    )
    lin_ranges = _file_ranges(lin, "oday")
    lin_hit = _overlapping(lin_ranges, *_band(dlo, dhi))
    assert lin_hit >= len(lin_ranges) * 0.9, (lin_hit, lin_ranges)
