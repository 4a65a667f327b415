"""Tripwires against driver-side testdata drift (VERDICT r3 items 1/8).

Round 3 lost 8 queries to a silent regeneration of /root/testdata that
switched events.ts from TIMESTAMP(NANOS) to TIMESTAMP(MICROS) while the
loader assumed nanos. These tests make any future drift loud:

* the canary asserts the loaded event timeline actually lands in 2024
  (TESTDATA.md: 2024-01-01 .. 2024-01-30) — a precision mix-up compresses
  it into January 1970;
* the schema tripwire pins every table's on-disk arrow schema. events.ts
  accepts either timestamp precision (both are valid generator outputs
  the loader handles); anything else fails.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from kafka_s3_etl_spark.sources.tables import load_table

# Pinned from /root/testdata/sf0.001 (FIXTURES.md F5). events.ts is
# pinned loosely as {NANO_OR_MICRO_TS} — see module docstring.
NANO_OR_MICRO_TS = ("timestamp[us]", "timestamp[ns]")
EXPECTED_FILE_SCHEMAS = {
    "region": "r_regionkey:int32, r_name:string",
    "nation": "n_nationkey:int32, n_name:string, n_regionkey:int32",
    "customer": (
        "c_custkey:int64, c_name:string, c_nationkey:int32, "
        "c_acctbal:double, c_mktsegment:string"
    ),
    "supplier": (
        "s_suppkey:int64, s_name:string, s_nationkey:int32, s_acctbal:double"
    ),
    "part": (
        "p_partkey:int64, p_name:string, p_brand:string, p_type:string, "
        "p_size:int32, p_retailprice:double"
    ),
    "orders": (
        "o_orderkey:int64, o_custkey:int64, o_orderstatus:string, "
        "o_totalprice:double, o_orderdate:timestamp[us], o_orderpriority:string"
    ),
    "lineitem": (
        "l_orderkey:int64, l_partkey:int64, l_suppkey:int64, "
        "l_linenumber:int32, l_quantity:double, l_extendedprice:double, "
        "l_discount:double, l_tax:double, l_returnflag:string, "
        "l_linestatus:string, l_shipdate:timestamp[us]"
    ),
    "events": (
        "event_id:int64, ts:{ts}, user_id:int64, event_type:string, "
        "value:double, props:string"
    ),
    "documents": (
        "doc_id:int64, text:string, lang:string, source:string, n_chars:int64"
    ),
    "embeddings": (
        "vec_id:int64, embedding:list<element: float>, label:int32"
    ),
}


@pytest.mark.parametrize("table", sorted(EXPECTED_FILE_SCHEMAS))
def test_file_schema_pinned(sf_dir, table):
    actual = pq.ParquetFile(f"{sf_dir}/{table}.parquet").schema_arrow
    rendered = ", ".join(f"{f.name}:{f.type}" for f in actual)
    expected = EXPECTED_FILE_SCHEMAS[table]
    if table == "events":
        ts = str(actual.field("ts").type)
        assert ts in NANO_OR_MICRO_TS, (
            f"events.ts drifted to {ts!r}; loader handles {NANO_OR_MICRO_TS}"
        )
        expected = expected.format(ts=ts)
    assert rendered == expected, (
        f"testdata schema drift in {table}: {rendered!r} != {expected!r}; "
        "update loaders/oracles deliberately, then re-pin here"
    )


def test_embedding_dim_canary(sf_dir):
    """q_dedup_embedding's oracle bakes the LSH hyperplane matrix for
    dim=64 into its SQL (plans/llm.py::_ANN_DEDUP_DIM); a dim drift must
    fail HERE, not as a list_dot_product length error in the driver."""
    import duckdb

    (dims,) = duckdb.sql(
        f"SELECT COUNT(DISTINCT len(embedding)) FROM '{sf_dir}/embeddings.parquet'"
    ).fetchone()
    (dim,) = duckdb.sql(
        f"SELECT MAX(len(embedding)) FROM '{sf_dir}/embeddings.parquet'"
    ).fetchone()
    assert (dims, dim) == (1, 64), (
        f"embeddings dim drifted (distinct lens={dims}, max={dim}); "
        "re-pin plans/llm.py::_ANN_DEDUP_DIM and this canary deliberately"
    )


def test_events_timeline_canary(spark, sf_dir):
    """min/max(ts) must be 2024 — 1970 means a precision mix-up."""
    lo, hi = (
        load_table(spark, sf_dir, "events")
        .agg(F.min("ts"), F.max("ts"))
        .first()
    )
    assert lo.year == 2024 and hi.year == 2024, (
        f"events timeline {lo} .. {hi} is outside 2024: "
        "ts precision handling in sources/tables.py is wrong for this file"
    )


def test_events_user_ts_unique_canary(sf_dir):
    """(user_id, ts) uniqueness in events, as a DATA-DRIFT signal: the
    four as-of entries no longer depend on it (their oracles are
    deterministic union-merge window replays over a total
    (ts, side, event_id) order, never native ASOF — ADVICE r12), but a
    generator change that introduces duplicates is still worth a loud
    early report here rather than a puzzling downstream diff."""
    import duckdb

    n, d = duckdb.sql(
        f"SELECT COUNT(*), COUNT(DISTINCT (user_id, ts)) "
        f"FROM '{sf_dir}/events.parquet'"
    ).fetchone()
    assert n == d, (
        f"events has {n - d} duplicate (user_id, ts) rows — the "
        "testdata generator changed shape; asof gates stay hash-stable "
        "(deterministic replay oracles) but review distribution-"
        "sensitive entries"
    )


def test_loader_handles_both_ts_precisions(spark, tmp_path):
    """The NANOS branch of load_table is dead code against micros
    testdata — exercise it with a synthesized TIMESTAMP(NANOS) events
    file so the fallback can't bitrot, and prove both precisions load
    to identical micro-precision timestamps."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in micros
    micros = [base, base + 1, base + 59_999_999]
    ids = list(range(len(micros)))
    cols = {
        "event_id": pa.array(ids, pa.int64()),
        "user_id": pa.array(ids, pa.int64()),
        "event_type": pa.array(["a"] * len(ids)),
        "value": pa.array([1.0] * len(ids)),
        "props": pa.array(["{}"] * len(ids)),
    }

    def write(dirname: str, ts_array: pa.Array) -> str:
        d = tmp_path / dirname
        d.mkdir()
        pq.write_table(
            pa.table({**cols, "ts": ts_array}), str(d / "events.parquet")
        )
        return str(d)

    nanos_dir = write(
        "nanos", pa.array([m * 1000 for m in micros], pa.timestamp("ns"))
    )
    micros_dir = write("micros", pa.array(micros, pa.timestamp("us")))
    # Legacy INT96 — what a default-conf Spark session WRITES (e.g. the
    # scaling probe's scaled copies). pyarrow maps INT96 to arrow
    # timestamp[ns] just like TIMESTAMP(NANOS), but Spark reads INT96
    # natively: the sniff must branch on the physical type (caught live
    # by the r5 scaling probe).
    int96_dir = tmp_path / "int96"
    int96_dir.mkdir()
    pq.write_table(
        pa.table(
            {
                **cols,
                "ts": pa.array(micros, pa.timestamp("us")).cast(
                    pa.timestamp("ns")
                ),
            }
        ),
        str(int96_dir / "events.parquet"),
        use_deprecated_int96_timestamps=True,
    )

    got_n = load_table(spark, nanos_dir, "events").select("event_id", "ts").collect()
    got_u = load_table(spark, micros_dir, "events").select("event_id", "ts").collect()
    assert sorted(map(tuple, got_n)) == sorted(map(tuple, got_u))
    by_id = {r.event_id: r.ts for r in got_n}
    assert by_id[0].year == 2024 and by_id[2].microsecond == 999_999
    got_96 = (
        load_table(spark, str(int96_dir), "events").select("event_id", "ts").collect()
    )
    assert sorted(map(tuple, got_96)) == sorted(map(tuple, got_u))
