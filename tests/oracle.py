"""Local DuckDB oracle harness — mimics the driver's correctness gate.

For a (Spark DataFrame, oracle SQL) pair it compares:
  1. row count,
  2. column-name sets,
  3. an order-insensitive multiset of value-normalized rows
     (columns sorted by name, values stringified).

Strict by design: floats are compared via repr so any summation-order
noise shows up here before it shows up in CORRECTNESS_r{N}.json — the
query catalog rounds float aggregates on both sides for exactly this
reason.

Also compares column TYPES (via DESCRIBE on the oracle SQL): DuckDB
silently widens (SUM(int) -> HUGEINT, to_json -> JSON) and Python
fetchall() renders the widened values identically, so a value-only
comparison passes locally while a type-aware hash (the driver's)
fails. Round 1 lost q_sessionize exactly this way.
"""

from __future__ import annotations

import datetime
import math
from dataclasses import dataclass, field

import duckdb
from pyspark.sql import DataFrame

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register the testdata parquet tables as views (driver does the same)."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


# Spark simpleString -> the one DuckDB type the oracle must produce.
# Anything else (HUGEINT, JSON, FLOAT, DECIMAL, TIMESTAMP_NS...) is a
# driver-hash hazard and fails the comparison even when values match.
_TYPE_MAP = {
    "bigint": "BIGINT",
    "int": "INTEGER",
    "smallint": "SMALLINT",
    "double": "DOUBLE",
    "float": "FLOAT",
    "string": "VARCHAR",
    "boolean": "BOOLEAN",
    "date": "DATE",
    "timestamp": "TIMESTAMP",
}


def _norm_value(v: object) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_value(x) for x in v) + "]"
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _normalize_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm_value(r[i]) for i in order) for r in rows)


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    mismatches: list[str] = field(default_factory=list)

    def message(self) -> str:
        lines = [f"{self.name}: spark={self.spark_rows} oracle={self.oracle_rows}"]
        lines += self.mismatches[:10]
        return "\n".join(lines)


def compare(name: str, sdf: DataFrame, sql: str, sf_dir: str) -> CompareResult:
    spark_rows = sdf.collect()
    spark_cols = sdf.columns
    spark_types = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
    con = duckdb_connect(sf_dir)
    try:
        oracle_types = {
            r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()
        }
        cur = con.execute(sql)
        oracle_cols = [d[0] for d in cur.description]
        oracle_rows = cur.fetchall()
    finally:
        con.close()

    res = CompareResult(name, True, len(spark_rows), len(oracle_rows))
    if sorted(spark_cols) != sorted(oracle_cols):
        res.ok = False
        res.mismatches.append(
            f"column mismatch: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}"
        )
        return res
    for col, st in spark_types.items():
        want = _TYPE_MAP.get(st)
        got = oracle_types.get(col)
        if want is not None and got != want:
            res.ok = False
            res.mismatches.append(
                f"type mismatch on {col}: spark={st} expects duckdb {want}, got {got}"
            )
    if not res.ok:
        return res
    if len(spark_rows) != len(oracle_rows):
        res.ok = False
        res.mismatches.append("row count mismatch")
    s_norm = _normalize_rows(spark_cols, [tuple(r) for r in spark_rows])
    o_norm = _normalize_rows(oracle_cols, oracle_rows)
    if s_norm != o_norm:
        res.ok = False
        only_spark = [r for r in s_norm if r not in set(o_norm)]
        only_oracle = [r for r in o_norm if r not in set(s_norm)]
        res.mismatches.append(
            f"value mismatch: {len(only_spark)} spark-only, {len(only_oracle)} oracle-only"
        )
        res.mismatches += [f"  spark-only: {r}" for r in only_spark[:5]]
        res.mismatches += [f"  oracle-only: {r}" for r in only_oracle[:5]]
    return res
