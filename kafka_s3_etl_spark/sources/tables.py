"""Loaders for the driver's parquet testdata tables (TESTDATA.md).

Explicit schemas keep the scan single-pass; Catalyst handles column
pruning + predicate pushdown into the parquet reader, which is the
scale path for 100 TB (only the referenced columns/row-groups are read).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_s3_etl_spark.schemas import TESTDATA_SCHEMAS, TESTDATA_TABLES
from kafka_s3_etl_spark.shiplib import ensure_workers_can_import

# Loaded events always expose ts as a real TimestampType regardless of the
# file's physical precision (see _events_ts_is_nanos).
EVENTS_LOADED_SCHEMA = T.StructType(
    [
        T.StructField(
            f.name,
            T.TimestampType() if f.name == "ts" else f.dataType,
            True,
        )
        for f in TESTDATA_SCHEMAS["events"].fields
    ]
)

# Footer sniff results, keyed by file path. The sniff is one parquet
# footer read (no data scan); caching makes repeated load_table calls
# (driver sweep, streaming scratch sources) free after the first.
_TS_PRECISION_CACHE: dict[str, bool] = {}


def _events_ts_is_nanos(spark: SparkSession, path: str) -> bool:
    """True when events.ts is stored as parquet TIMESTAMP(NANOS).

    The testdata generator has shipped both TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS) files across rounds, so the loader must branch on
    the footer instead of assuming. Detection is Spark-native (works for
    any filesystem Spark can read): with ``nanosAsLong`` off, Spark's
    schema inference rejects TIMESTAMP(NANOS) outright, while a MICROS
    file infers cleanly as ts: timestamp.
    """
    if path not in _TS_PRECISION_CACHE:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
        try:
            inferred = spark.read.parquet(path).schema
            nanos = isinstance(inferred["ts"].dataType, T.LongType)
        except Exception as exc:  # inference raises on TIMESTAMP(NANOS)
            if "NANOS" not in str(exc).upper():
                raise
            nanos = True
        finally:
            # The conf is session-global and read at ACTION time: a lazy
            # NANOS DataFrame built earlier would fail its eventual scan
            # if a later MICROS sniff left this false. MICROS reads pin
            # their precision via an explicit schema and ignore it, so
            # true is the always-safe resting state.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        _TS_PRECISION_CACHE[path] = nanos
    return _TS_PRECISION_CACHE[path]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame with its declared schema.

    events.ts precision is sniffed from the parquet footer: NANOS files
    (which Spark's reader rejects) are read as nanos-since-epoch via the
    ``nanosAsLong`` legacy conf and rebuilt into TimestampType with
    integer (DIV) arithmetic — exact for micro-precision values; MICROS
    files are read directly as TimestampType.
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
        if _events_ts_is_nanos(spark, path):
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.schema(TESTDATA_SCHEMAS[name]).parquet(path)
            return df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        return spark.read.schema(EVENTS_LOADED_SCHEMA).parquet(path)
    return spark.read.schema(TESTDATA_SCHEMAS[name]).parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all testdata tables."""
    return {name: load_table(spark, sf_dir, name) for name in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql paths)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
