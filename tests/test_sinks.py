"""Sink-side scale behaviors: partitioned layout + partition pruning.

A 100 TB corpus is written partitioned by its natural query dimensions
(date, status, language...); the payoff is that a filter on the
partition column prunes whole directories at planning time — zero I/O
for excluded partitions. This pins both directions: the layout the
writer produces and the PartitionFilters the reader plans.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kafka_s3_etl_spark.sources.tables import load_table
from kafka_s3_etl_spark.streaming.runner import scratch_dir


def test_partitioned_write_then_pruned_read(spark, sf_dir):
    out = scratch_dir("part_orders")
    orders = load_table(spark, sf_dir, "orders")
    orders.write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)

    # layout: one directory per status value
    dirs = {d for d in os.listdir(out) if d.startswith("o_orderstatus=")}
    statuses = {r[0] for r in orders.select("o_orderstatus").distinct().collect()}
    assert dirs == {f"o_orderstatus={s}" for s in statuses}

    read = spark.read.parquet(out).filter(F.col("o_orderstatus") == "O")
    plan = spark._jvm.PythonSQLUtils.explainString(
        read._jdf.queryExecution(), "formatted"
    )
    import re

    assert "PartitionFilters" in plan
    assert re.search(r"o_orderstatus#\d+ = O", plan)  # pruning predicate
    assert read.count() == orders.filter(F.col("o_orderstatus") == "O").count()


def test_schema_evolution_merge(spark, sf_dir):
    """Schema drift discipline: a corpus written over months grows
    columns. mergeSchema reads old+new files as one table with the
    union schema, old rows null-filled in the added column."""
    out = scratch_dir("evolving")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    v1 = docs.filter(F.col("doc_id") < 100)
    v2 = docs.filter(F.col("doc_id") >= 100).withColumn(
        "quality", F.lit(0.5)
    )
    v1.write.parquet(out + "/batch=1")
    v2.write.parquet(out + "/batch=2")
    merged = spark.read.option("mergeSchema", True).parquet(out)
    assert set(merged.columns) == {"doc_id", "lang", "quality", "batch"}
    assert merged.count() == docs.count()
    old_rows = merged.filter(F.col("doc_id") < 100)
    assert old_rows.filter(F.col("quality").isNotNull()).count() == 0


def test_max_records_per_file_bounds_file_size(spark, sf_dir):
    """maxRecordsPerFile caps output file size — the knob that keeps
    single files splittable/readable when a partition is huge."""
    out = scratch_dir("bounded_files")
    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    (
        orders.coalesce(1)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 500)
        .parquet(out)
    )
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) >= n // 500
    assert spark.read.parquet(out).count() == n
