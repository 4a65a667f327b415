"""Bucketing: the co-located-join strategy for repeated big joins.

At 100 TB, a fact⋈fact join that runs daily should not re-shuffle both
sides every run: writing both tables bucketed (and sorted) by the join
key moves the shuffle to write time, once. This test pins the payoff —
a join of two bucketed tables with matching bucket counts plans with NO
Exchange (broadcast disabled to force the sort-merge path).
"""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from kafka_s3_etl_spark.sources.tables import load_table
from kafka_s3_etl_spark.streaming.runner import scratch_dir


@pytest.fixture()
def no_broadcast(spark):
    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    for k in keys:
        spark.conf.set(k, "-1")
    yield
    for k in keys:
        spark.conf.unset(k)  # back to session defaults


def test_bucketed_join_has_no_exchange(spark, sf_dir, no_broadcast):
    db = f"buck_{uuid.uuid4().hex[:6]}"
    spark.sql(f"CREATE DATABASE {db} LOCATION '{scratch_dir('warehouse')}'")
    try:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity"
        )
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(
            f"{db}.li_b"
        )
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(
            f"{db}.o_b"
        )
        joined = spark.table(f"{db}.li_b").join(
            spark.table(f"{db}.o_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        n = joined.count()
        assert n == li.count()  # every lineitem matches exactly one order
        plan = spark._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket layout replaces the shuffle
    finally:
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
