"""Streaming transformations (SURVEY.md section 2b M7).

Every transform here is written against a plain DataFrame so the SAME
code runs in batch and streaming — Structured Streaming's core design
(the logical plan is incrementalized by the engine; SIGMOD 2018
"Structured Streaming: A Declarative API"). The north-star job is:

    kafka source -> from_json decode -> A4 filter -> S3 parquet sink

At 100 TB/day this scales by Kafka partition count on the source side
and by ``maxOffsetsPerTrigger`` + AQE on the transform side; the sink
is an append-only parquet table partitioned by event date.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_s3_etl_spark.schemas import TESTDATA_SCHEMAS
from kafka_s3_etl_spark.sources.kafka import parse_kafka_json


def decode_orders_wire(wire: DataFrame) -> DataFrame:
    """Kafka value bytes -> typed orders rows (reference B2 on the
    streaming path)."""
    parsed = parse_kafka_json(wire, TESTDATA_SCHEMAS["orders"])
    return parsed.withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))


def flagship_filter(df: DataFrame, status: str, threshold: str) -> DataFrame:
    """Reference A4 semantics, batch or stream (same code path)."""
    return df.filter(
        (F.col("o_orderstatus") == status)
        & (F.col("o_orderdate") >= F.lit(threshold).cast("timestamp"))
    )


def tumbling_counts(events: DataFrame, width: str = "5 minutes") -> DataFrame:
    """Event-time tumbling window counts with a watermark."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """Sliding windows: each event lands in width/slide windows."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", width, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            "event_type",
            "n",
        )
    )


def session_counts(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Session windows per user (gap-merged)."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            "user_id",
            "n",
        )
    )


def chained_window_counts(
    events: DataFrame, inner: str = "5 minutes", outer: str = "15 minutes"
) -> DataFrame:
    """Two chained event-time window aggregations in one streaming
    query (Spark 4 multiple-stateful-operators): per-``inner`` counts
    per event_type, re-windowed via ``window_time`` into ``outer``
    buckets. Before multi-stateful support this took two jobs with an
    intermediate sink; here the inner windows finalize at the watermark
    and flow straight into the outer agg within the same trigger.

    ``outer`` must be an integer multiple of ``inner`` so inner windows
    nest exactly. Emits (ws, we, event_type, n, n_subwindows) where
    n_subwindows counts the finalized inner windows merged per bucket.

    Scale: both stateful stages hash-partition on (window, event_type);
    the second stage's input is already one-row-per-inner-window, i.e.
    pre-aggregated by a factor of events-per-window before the second
    shuffle — the same partial-rollup economics as a two-tier lambda
    pipeline, without the intermediate storage.
    """
    per_inner = (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", inner).alias("w"), "event_type")
        .agg(F.count("*").alias("n_inner"))
    )
    return (
        per_inner.groupBy(
            F.window(F.window_time("w"), outer).alias("w2"), "event_type"
        )
        .agg(
            F.sum("n_inner").cast("bigint").alias("n"),
            F.count("*").cast("bigint").alias("n_subwindows"),
        )
        .select(
            F.col("w2.start").alias("ws"),
            F.col("w2.end").alias("we"),
            "event_type",
            "n",
            "n_subwindows",
        )
    )


def stream_stream_followups(left: DataFrame, right: DataFrame) -> DataFrame:
    """Stream-stream inner join: follow-up events within 1h per user.

    Both sides carry watermarks and the join condition bounds event time
    on both ends, so each side's state is finite (Spark drops buffered
    rows once the watermark passes the window). Inner-join emission does
    not depend on micro-batch boundaries, which makes the result equal to
    the batch range join — the oracle exploits exactly that.
    """
    l_side = left.select(
        F.col("event_id").alias("a_id"),
        F.col("user_id").alias("l_user"),
        F.col("ts").alias("l_ts"),
    ).withWatermark("l_ts", "1 hour")
    r_side = right.select(
        F.col("event_id").alias("b_id"),
        F.col("user_id").alias("r_user"),
        F.col("ts").alias("r_ts"),
    ).withWatermark("r_ts", "1 hour")
    return l_side.join(
        r_side,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 1 HOUR")),
    ).select("a_id", "b_id")


def dedup_within_watermark(events: DataFrame) -> DataFrame:
    """Streaming dedup bounded by the watermark (state is droppable at
    scale, unlike an unbounded dropDuplicates)."""
    return events.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
