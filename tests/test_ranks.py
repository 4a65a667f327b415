"""Property tests for operators/ranks.py: the bucketed two-phase
global rank must equal the window ROW_NUMBER on adversarial inputs —
negatives, heavy ties, values sharing one bucket, and empty buckets —
and the closed-form NTILE must equal Spark's ntile() for every (n,
parts) shape including n < parts."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_s3_etl_spark.operators.ranks import (
    bucketed_global_row_number,
    ntile_expr,
)


def test_bucketed_rank_equals_window_row_number(spark):
    rng = random.Random(8)
    rows = []
    # negatives, dense tie blocks, one hot value, sparse tails
    for i in range(500):
        v = rng.choice(
            [rng.randint(-999, 999), 0, 7, 7, 7, rng.randint(-99999, 999999)]
        )
        rows.append((i, v))
    df = spark.createDataFrame(rows, "k long, c long")
    got = bucketed_global_row_number(
        df, "c", "k", shift=100_000, width=64, descending=True
    )
    want = df.withColumn(
        "rn_ref",
        F.row_number().over(Window.orderBy(F.col("c").desc(), "k")),
    )
    j = got.join(want, ["k", "c"]).collect()
    assert len(j) == 500
    assert all(r.rn == r.rn_ref for r in j)
    assert all(r.n == 500 for r in j)


def test_bucketed_rank_ascending(spark):
    df = spark.createDataFrame(
        [(i, (i * 37) % 11 - 5) for i in range(100)], "k long, c long"
    )
    got = bucketed_global_row_number(
        df, "c", "k", shift=5, width=3, descending=False
    )
    want = df.withColumn(
        "rn_ref", F.row_number().over(Window.orderBy("c", "k"))
    )
    j = got.join(want, ["k", "c"]).collect()
    assert all(r.rn == r.rn_ref for r in j)


def test_bucketed_rank_partitioned_equals_partitioned_row_number(spark):
    """partition_by groups: per-group rank and per-group n must equal
    ROW_NUMBER/COUNT OVER (PARTITION BY g ...) — including groups of
    wildly different sizes and values colliding across groups."""
    rng = random.Random(21)
    rows = []
    for i in range(400):
        g = 0 if i < 350 else 1  # skewed group sizes
        rows.append((i, g, rng.choice([rng.randint(-50, 50), 7, 7])))
    df = spark.createDataFrame(rows, "k long, g int, c long")
    got = bucketed_global_row_number(
        df, "c", "k", shift=50, width=16, descending=True,
        partition_by=["g"],
    )
    w = Window.partitionBy("g").orderBy(F.col("c").desc(), "k")
    want = df.withColumn("rn_ref", F.row_number().over(w)).withColumn(
        "n_ref", F.count("*").over(Window.partitionBy("g"))
    )
    j = got.join(want, ["k", "g", "c"]).collect()
    assert len(j) == 400
    assert all(r.rn == r.rn_ref for r in j)
    assert all(r.n == r.n_ref for r in j)


def test_ntile_closed_form_matches_spark_ntile(spark):
    for n, parts in [(1, 10), (7, 10), (10, 10), (23, 10), (100, 7),
                     (13, 4), (4, 4), (3, 4)]:
        df = spark.range(1, n + 1).select(
            F.col("id").alias("rn"), F.lit(n).alias("n")
        )
        got = df.select(
            "rn", F.expr(ntile_expr(parts)).alias("tile")
        )
        want = spark.range(1, n + 1).select(
            F.col("id").alias("rn"),
            F.ntile(parts).over(Window.orderBy("id")).alias("tile_ref"),
        )
        j = {r.rn: r.tile for r in got.collect()}
        for r in want.collect():
            assert j[r.rn] == r.tile_ref, (n, parts, r.rn)
