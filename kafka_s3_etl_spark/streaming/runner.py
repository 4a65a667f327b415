"""Streaming test/driver harness: file sources + availableNow triggers.

The north-star pipeline is Kafka -> transform -> S3 parquet. In this
container there is no broker, so streams are driven through the file
source with ``Trigger.AvailableNow`` — the documented pattern for
deterministic, broker-free verification of Structured Streaming jobs.
The transformations are identical DataFrame code either way; only the
``format("kafka")`` vs ``format("text"/"parquet")`` source/sink lines
differ (see sources/kafka.py for the broker-facing builders).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from kafka_s3_etl_spark.schemas import TESTDATA_SCHEMAS
from kafka_s3_etl_spark.sources.kafka import to_kafka_value
from kafka_s3_etl_spark.sources.tables import (
    EVENTS_LOADED_SCHEMA,
    _events_ts_is_nanos,
    load_table,
)


def scratch_dir(prefix: str) -> str:
    return tempfile.mkdtemp(prefix=f"kafka_s3_etl_spark_{prefix}_")


# Materialized stream-source dirs, keyed by (sf_dir, table). The
# testdata is immutable, so the converted-parquet / wire-text stand-ins
# are too — rebuilding them per stream_table call would bill one full
# table write to every streaming query (twice for a self-join).
_SRC_CACHE: dict[tuple[str, str], str] = {}


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Open a testdata table as a *stream* (file source over its parquet).

    events.ts needs the same precision handling as the batch loader
    (sources/tables.py): MICROS files stream directly off the original
    parquet; NANOS files are materialized once (per sf_dir, cached) as
    converted scratch parquet, because the micro-batch file source can't
    apply the nanos conversion lazily under a forced schema.
    """
    batch = load_table(spark, sf_dir, name)  # also pins tz + ships lib
    path = os.path.join(sf_dir, f"{name}.parquet")

    def _stream_single_file(schema):
        # Directory-shaped table (the normal production layout): the
        # streaming file source takes it directly. Single-FILE table
        # (the driver's testdata layout): the source wants a directory,
        # so point it at sf_dir with a glob filter selecting that file.
        # The branch matters: the glob filter matches file NAMES, so
        # against a directory named events.parquet it would match zero
        # of the part-files inside and deliver a silently EMPTY stream.
        jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.getFileStatus(jpath).isDirectory():
            return spark.readStream.schema(schema).parquet(path)
        return (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", f"{name}.parquet")
            .parquet(sf_dir)
        )

    if name == "events":
        if not _events_ts_is_nanos(spark, path):
            return _stream_single_file(EVENTS_LOADED_SCHEMA)
        key = (sf_dir, f"stream_src_{name}")
        if key not in _SRC_CACHE:
            out = scratch_dir(f"stream_src_{name}")
            batch.write.mode("overwrite").parquet(out)
            _SRC_CACHE[key] = out
        return spark.readStream.schema(batch.schema).parquet(_SRC_CACHE[key])
    return _stream_single_file(TESTDATA_SCHEMAS[name])


def kafka_wire_stream(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Simulate the Kafka wire: serialize a table to value-only JSON
    messages (reference A8/A9 format) written as text files, then open
    them as a stream with a ``value`` column — exactly the shape
    ``readStream.format("kafka")`` delivers."""
    key = (sf_dir, f"wire_{table}")
    if key not in _SRC_CACHE:
        wire_dir = scratch_dir(f"wire_{table}")
        to_kafka_value(load_table(spark, sf_dir, table)).write.mode("overwrite").text(
            wire_dir
        )
        _SRC_CACHE[key] = wire_dir
    return spark.readStream.text(_SRC_CACHE[key]).withColumnRenamed("value", "value")


class _pinned_stream_partitions:
    """Temporarily pin spark.sql.shuffle.partitions for a stream start.

    A stateful query's state-store partition count is frozen at the
    FIRST run of its checkpoint from this conf; under a vanilla session
    the default 200 means 200 state-store tasks per micro-batch for
    kilobytes of state (~13s of pure task overhead per query in the
    driver's harness). Results are partition-count-independent; the conf
    is restored on exit. The count is only read at query start, so the
    narrow window is safe for sequential harnesses (tests, driver)."""

    N = "8"

    def __init__(self, df: DataFrame):
        self.conf = df.sparkSession.conf

    def __enter__(self) -> None:
        self.prev = self.conf.get("spark.sql.shuffle.partitions")
        self.conf.set("spark.sql.shuffle.partitions", self.N)

    def __exit__(self, *exc: object) -> None:
        self.conf.set("spark.sql.shuffle.partitions", self.prev)


def run_available_now(
    df: DataFrame,
    output_mode: str = "append",
    timeout_sec: int = 120,
    progress_sink: list | None = None,
) -> DataFrame:
    """Run a streaming DataFrame to completion into a memory sink and
    return the result as a batch DataFrame. With ``progress_sink`` a
    list, the query's recentProgress dicts are appended after
    termination (per-micro-batch numInputRows etc. for admission-
    control assertions)."""
    name = f"mem_{uuid.uuid4().hex[:10]}"
    with _pinned_stream_partitions(df):
        q = (
            df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .option("checkpointLocation", scratch_dir("ckpt"))
            .start()
        )
    _await_or_fail(q, timeout_sec)
    if progress_sink is not None:
        progress_sink.extend(q.recentProgress)
    spark = df.sparkSession
    return spark.table(name)


def _await_or_fail(q, timeout_sec: int) -> None:
    """awaitTermination(timeout) returns False on timeout with the query
    STILL RUNNING — reading the sink then would silently hand partial
    results to the oracle. Surface it as a failure instead."""
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"streaming query {q.name or q.id} still running after "
            f"{timeout_sec}s; sink contents would be partial"
        )


def run_to_parquet(
    df: DataFrame, out_dir: str | None = None, timeout_sec: int = 120
) -> DataFrame:
    """Run an append-mode stream into a parquet sink (the S3 side of the
    north star: same code with an s3a:// path + checkpoint) and read the
    result back."""
    out = out_dir or scratch_dir("sink")
    q = (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", scratch_dir("ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    _await_or_fail(q, timeout_sec)
    return df.sparkSession.read.schema(df.schema).parquet(out)
