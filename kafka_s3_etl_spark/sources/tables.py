"""Loaders for the driver's parquet testdata tables (TESTDATA.md).

Explicit schemas keep the scan single-pass; Catalyst handles column
pruning + predicate pushdown into the parquet reader, which is the
scale path for 100 TB (only the referenced columns/row-groups are read).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_s3_etl_spark.schemas import TESTDATA_SCHEMAS, TESTDATA_TABLES
from kafka_s3_etl_spark.shiplib import ensure_workers_can_import


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame with its declared schema.

    events.ts is stored as parquet TIMESTAMP(NANOS), which Spark's reader
    rejects outright; we read it as nanos-since-epoch via the
    ``nanosAsLong`` legacy conf and rebuild a proper TimestampType with
    integer (DIV) arithmetic — exact for micro-precision values.
    """
    if name not in TESTDATA_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {TESTDATA_TABLES}")
    # Self-defend against host sessions built without UTC: timestamp
    # semantics (and DuckDB oracle parity) require a pinned session tz.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Any downstream operator may use pandas UDFs from this package;
    # executor Python workers must be able to import it.
    ensure_workers_can_import(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.schema(TESTDATA_SCHEMAS[name]).parquet(path)
        return df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return spark.read.schema(TESTDATA_SCHEMAS[name]).parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all testdata tables."""
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql paths)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
