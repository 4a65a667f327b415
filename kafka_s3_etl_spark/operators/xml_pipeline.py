"""Spark plumbing for the JSON->XML pipeline (reference B1-B4).

The reference downloads one JSON array from S3, converts it to one XML
document in a single process (``src/s3_json_to_xml.py:281-334``). Here
the per-record rendering is distributed — records fan out as rows and
render inside an Arrow-batched pandas UDF — and only the final ordered
concatenation of one document happens on the driver (a single output
artifact is inherently a single-writer step; at 100 TB you'd render
millions of *documents*, one per row, and this same code path writes
them fully in parallel with no driver assembly).

Key-order fidelity: records travel as JSON *text* (split out of the
array with ``json.loads`` which preserves key order), never through a
StructType, which would reorder and null-fill keys (SURVEY 7.3).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_s3_etl_spark.functions.xml_render import (
    assemble_document,
    render_record_block,
)
from kafka_s3_etl_spark.shiplib import ensure_workers_can_import

_RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("idx", T.LongType(), False),
        T.StructField("record_json", T.StringType(), False),
    ]
)

_XML_SCHEMA = T.StructType(
    [
        T.StructField("idx", T.LongType(), False),
        T.StructField("xml", T.StringType(), False),
    ]
)


def json_array_to_records(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSON-array file into (idx, record_json) rows, key order intact."""
    ensure_workers_can_import(spark)
    raw = spark.read.text(path, wholetext=True)

    def split_records(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for doc in pdf["value"]:
                records = json.loads(doc)
                if not isinstance(records, list):
                    raise TypeError(
                        f"expected list of records, got {type(records).__name__}"
                    )
                yield pd.DataFrame(
                    {
                        "idx": range(len(records)),
                        "record_json": [json.dumps(r) for r in records],
                    }
                )

    return raw.mapInPandas(split_records, schema=_RECORDS_SCHEMA)


def render_records(records: DataFrame) -> DataFrame:
    """(idx, record_json) -> (idx, xml) with one <product> block per row."""

    @F.pandas_udf(T.StringType())
    def render(js: pd.Series) -> pd.Series:
        return js.map(render_record_block)

    return records.select("idx", render("record_json").alias("xml"))


def xml_fragments(spark: SparkSession, path: str) -> DataFrame:
    """Full distributed pipeline: JSON array file -> per-record XML rows."""
    return render_records(json_array_to_records(spark, path))


def build_xml_document(spark: SparkSession, path: str) -> str:
    """Assemble the single-document artifact (reference B3+B4 semantics)."""
    rows = xml_fragments(spark, path).orderBy("idx").collect()
    return assemble_document([r.xml for r in rows])


def write_xml_document(spark: SparkSession, json_path: str, out_path: str) -> None:
    """Write the single XML document (reference B4: one object, string body)."""
    doc = build_xml_document(spark, json_path)
    with open(out_path, "w", encoding="utf-8") as f:
        f.write(doc)
