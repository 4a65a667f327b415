"""Explicit schemas for every table the engine touches.

Explicit schemas (never ``inferSchema``) keep scans single-pass and
plans stable at 100 TB. Three groups:

1. ``TESTDATA_SCHEMAS`` — the driver-generated TPC-H-ish tables
   (see TESTDATA.md).
2. ``PRODUCTS_CSV_SCHEMA`` — the reference's 26-column products CSV
   (DDL at reference ``src/sql_to_kafka.py:74-101``; effective types are
   pandas-inferred per SURVEY.md section 1.2: TEXT -> string,
   REAL -> double, ISO-8601 dates stored as strings).
3. ``PRODUCTS_JSON_SCHEMA`` — the nested S3 product document
   (shape from reference ``data/sample_products.json``; FIXTURES.md F3).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _struct(fields: list[tuple[str, T.DataType]]) -> T.StructType:
    return T.StructType([T.StructField(n, t, True) for n, t in fields])


# ---------------------------------------------------------------- testdata
TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": _struct(
        [("r_regionkey", T.IntegerType()), ("r_name", T.StringType())]
    ),
    "nation": _struct(
        [
            ("n_nationkey", T.IntegerType()),
            ("n_name", T.StringType()),
            ("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": _struct(
        [
            ("c_custkey", T.LongType()),
            ("c_name", T.StringType()),
            ("c_nationkey", T.IntegerType()),
            ("c_acctbal", T.DoubleType()),
            ("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": _struct(
        [
            ("s_suppkey", T.LongType()),
            ("s_name", T.StringType()),
            ("s_nationkey", T.IntegerType()),
            ("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": _struct(
        [
            ("p_partkey", T.LongType()),
            ("p_name", T.StringType()),
            ("p_brand", T.StringType()),
            ("p_type", T.StringType()),
            ("p_size", T.IntegerType()),
            ("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": _struct(
        [
            ("o_orderkey", T.LongType()),
            ("o_custkey", T.LongType()),
            ("o_orderstatus", T.StringType()),
            ("o_totalprice", T.DoubleType()),
            ("o_orderdate", T.TimestampType()),
            ("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": _struct(
        [
            ("l_orderkey", T.LongType()),
            ("l_partkey", T.LongType()),
            ("l_suppkey", T.LongType()),
            ("l_linenumber", T.IntegerType()),
            ("l_quantity", T.DoubleType()),
            ("l_extendedprice", T.DoubleType()),
            ("l_discount", T.DoubleType()),
            ("l_tax", T.DoubleType()),
            ("l_returnflag", T.StringType()),
            ("l_linestatus", T.StringType()),
            ("l_shipdate", T.TimestampType()),
        ]
    ),
    # NOTE: the testdata generator has shipped events.ts as both
    # TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across rounds.
    # sources.tables.load_table sniffs the parquet footer: NANOS files
    # (which Spark's reader rejects) are read as nanos-since-epoch
    # (LongType, via spark.sql.legacy.parquet.nanosAsLong) and converted;
    # MICROS files are read directly with EVENTS_LOADED_SCHEMA. This dict
    # records the NANOS-path *file* schema; the loaded DataFrame always
    # exposes ts: timestamp.
    "events": _struct(
        [
            ("event_id", T.LongType()),
            ("ts", T.LongType()),
            ("user_id", T.LongType()),
            ("event_type", T.StringType()),
            ("value", T.DoubleType()),
            ("props", T.StringType()),
        ]
    ),
    "documents": _struct(
        [
            ("doc_id", T.LongType()),
            ("text", T.StringType()),
            ("lang", T.StringType()),
            ("source", T.StringType()),
            ("n_chars", T.LongType()),
        ]
    ),
    "embeddings": _struct(
        [
            ("vec_id", T.LongType()),
            ("embedding", T.ArrayType(T.FloatType())),
            ("label", T.IntegerType()),
        ]
    ),
}

TESTDATA_TABLES = tuple(TESTDATA_SCHEMAS)


# --------------------------------------------------- reference products CSV
# 26 columns; DDL at reference src/sql_to_kafka.py:74-101 (22x TEXT, 4x REAL).
_PRODUCT_TEXT_COLS = [
    "ean",
    "styleNumber",
    "styleOption",
    "size",
    "color",
    "brandName",
    "brandcode",
    "subbrandName",
    "productCategory",
    "productSubcategory",
    "gender",
    "ediSeason",
    "ediStyleName",
    "countryOfOrigin",
]
_PRODUCT_REAL_COLS = ["price_eur", "price_usd", "price_gbp", "grossPrice_eur"]
_PRODUCT_TAIL_TEXT_COLS = [
    "b2bReadinessDate",
    "articleStatus",
    "enrichmentStatus",
    "createdOn",
    "lastUpdated",
    "fabricComposition",
    "washingInstructions",
    "ediDescription",
]

PRODUCTS_CSV_SCHEMA = _struct(
    [(c, T.StringType()) for c in _PRODUCT_TEXT_COLS]
    + [(c, T.DoubleType()) for c in _PRODUCT_REAL_COLS]
    + [(c, T.StringType()) for c in _PRODUCT_TAIL_TEXT_COLS]
)


# ------------------------------------------------ nested product JSON (F3)
_LANG_VALUE = _struct([("language", T.StringType()), ("value", T.StringType())])
_ITEM_PRICE = _struct(
    [
        ("priceType", T.StringType()),
        ("priceCurrency", T.StringType()),
        ("price", T.DoubleType()),
        ("validInRegion", T.StringType()),
        ("validFrom", T.StringType()),
        ("validUntil", T.StringType()),
    ]
)

PRODUCTS_JSON_SCHEMA = _struct(
    [
        ("ean", T.StringType()),
        ("styleNumber", T.StringType()),
        ("styleOption", T.StringType()),
        ("size", T.StringType()),
        ("countryOfOrigin", T.ArrayType(_LANG_VALUE)),
        ("itemSellingPrices", T.ArrayType(_ITEM_PRICE)),
        ("itemGrossPrices", T.ArrayType(_ITEM_PRICE)),
        ("b2bReadinessDate", T.StringType()),
        (
            "styleLifeCycle",
            _struct(
                [
                    ("createdOn", T.StringType()),
                    ("lastUpdated", T.StringType()),
                    ("articleStatus", T.StringType()),
                    ("enrichmentStatus", T.StringType()),
                ]
            ),
        ),
        ("color", T.StringType()),
        ("brandName", T.StringType()),
        ("brandcode", T.StringType()),
        ("subbrandName", T.StringType()),
        ("productCategory", T.StringType()),
        ("productSubcategory", T.StringType()),
        ("gender", T.StringType()),
        ("ediSeason", T.StringType()),
        ("ediStyleName", T.StringType()),
        ("fabricCompositions", T.ArrayType(_LANG_VALUE)),
    ]
)
