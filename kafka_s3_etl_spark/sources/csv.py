"""Products CSV source (reference A1 parity).

The reference loads ``data/products.csv`` with pandas inference and
bulk-overwrites a SQLite table (``src/sql_to_kafka.py:107-136``); the
declared DDL is dead code (SURVEY 1.2). Here the explicit 26-column
schema (strings + 4 double price columns) reproduces the *effective*
pandas-inferred types, and empty cells read as NULL — matching the
NaN -> SQLite NULL path (39/105 rows have empty price_usd in the
shipped sample).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_s3_etl_spark.schemas import PRODUCTS_CSV_SCHEMA

REFERENCE_CSV = "/root/reference/data/products.csv"


def read_products_csv(spark: SparkSession, path: str = REFERENCE_CSV) -> DataFrame:
    return (
        spark.read.schema(PRODUCTS_CSV_SCHEMA)
        .option("header", "true")
        .option("nullValue", "")
        .csv(path)
    )


def products_table(spark: SparkSession, path: str = REFERENCE_CSV) -> DataFrame:
    """Load + register as the ``products`` temp view (reference A2/A3:
    table overwrite collapses to view re-registration under lineage)."""
    df = read_products_csv(spark, path)
    df.createOrReplaceTempView("products")
    return df
