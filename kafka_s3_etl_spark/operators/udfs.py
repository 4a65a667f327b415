"""User-defined-function surface (SURVEY.md 2b q_udf_scalar / q_udaf /
q_udtf).

The reference has no UDF registration surface at all (its only custom
logic runs driver-side in plain Python); this module exposes the three
Spark shapes a user would reach for, each on the Arrow path:

* scalar   — @pandas_udf (vectorized, Arrow batches);
* grouped  — applyInPandas (full per-group pandas frame in/out);
* table    — one-to-many row expansion (explode of a built array here;
             pyspark's @udtf class form generates rows the same way).
"""

from __future__ import annotations

from typing import Iterator  # resolved by pandas_udf's type inference

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PRICE_TIERS = [(50_000.0, "low"), (150_000.0, "mid")]  # else "high"


@F.pandas_udf(T.StringType())
def price_tier(total: pd.Series) -> pd.Series:
    """Vectorized price-tier labeler (Arrow batch in/out)."""
    out = pd.Series("high", index=total.index, dtype="object")
    out[total <= PRICE_TIERS[1][0]] = PRICE_TIERS[1][1]
    out[total <= PRICE_TIERS[0][0]] = PRICE_TIERS[0][1]
    return out


def label_price_tiers(orders: DataFrame) -> DataFrame:
    return orders.select(
        "o_orderkey", "o_totalprice", price_tier("o_totalprice").alias("tier")
    )


def weighted_avg_price(lineitem: DataFrame) -> DataFrame:
    """Grouped pandas UDAF: quantity-weighted mean extended price per
    SUPPLIER (applyInPandas: one pandas frame per group).

    Group-key choice is the whole scale story here: applyInPandas
    materializes each group as one in-memory pandas frame on one
    worker, so a low-cardinality key (e.g. the 3-value returnflag)
    hands a single worker a third of a 100 TB table. l_suppkey's
    cardinality grows WITH the data (TPC-H: suppliers = SF x 10k,
    lineitem = SF x 6M), so every frame stays ~600 rows at any scale —
    bounded memory AND bounded per-group Python overhead. The built-in
    ``sum(price*qty)/sum(qty)`` expression is the production form; this
    exercises the custom-UDAF surface.

    Projected to the three used columns BEFORE the groupBy: the UDF
    receives whole rows, so Catalyst cannot prune through
    FlatMapGroupsInPandas — without the select, all 16 lineitem columns
    would ride the shuffle and the Arrow transfer.
    """

    def wavg(pdf: pd.DataFrame) -> pd.DataFrame:
        # Exact-integer accumulation: prices are exact cents and
        # quantities whole units, so summing int64 cents*qty is
        # order-independent (unlike float sums, whose last-bit noise
        # flips a rounded 4th decimal on ~1/1000 groups vs the oracle).
        # The single final division is one IEEE op — bit-identical to
        # the oracle's, so the output needs no rounding at all.
        cents = (pdf["l_extendedprice"] * 100).round().astype("int64")
        qty = pdf["l_quantity"].astype("int64")
        v = int((cents * qty).sum()) / (100.0 * int(qty.sum()))
        return pd.DataFrame(
            {"l_suppkey": [int(pdf["l_suppkey"].iloc[0])], "wavg_price": [v]}
        )

    return (
        lineitem.select(
            F.col("l_suppkey").cast("bigint").alias("l_suppkey"),
            "l_extendedprice",
            "l_quantity",
        )
        .groupBy("l_suppkey")
        .applyInPandas(wavg, schema="l_suppkey bigint, wavg_price double")
    )


def explode_quantity_units(lineitem: DataFrame, max_qty: int = 10) -> DataFrame:
    """Table-function surface: expand each line item into one row per
    whole quantity unit (bounded to keep the fan-out explicit)."""
    li = lineitem.filter(F.col("l_quantity") <= max_qty)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.explode(
            F.sequence(F.lit(1), F.col("l_quantity").cast("int"))
        ).alias("unit"),
    )


def quantity_units_udtf():
    """The NATIVE Spark Python UDTF (@udtf class form, Spark 3.5+/4),
    Arrow-optimized — the first-class engine surface q_udtf's
    explode-of-array form does not exercise (VERDICT r11 #2). Same
    row-generation contract as explode_quantity_units: one output row
    per whole quantity unit. Called with a TABLE argument
    (df.asTable()), so eval receives one Row per input line item; the
    class is defined locally so cloudpickle ships it by value (no
    worker import of this module required)."""
    from pyspark.sql.functions import udtf

    class QuantityUnits:
        def eval(self, row):
            for unit in range(1, int(row.l_quantity) + 1):
                yield row.l_orderkey, row.l_linenumber, unit

    return udtf(
        QuantityUnits,
        returnType="l_orderkey bigint, l_linenumber int, unit int",
        useArrow=True,
    )


def native_udtf_quantity_units(
    lineitem: DataFrame, max_qty: int = 10
) -> DataFrame:
    """explode_quantity_units re-expressed through the native @udtf
    API: project the three needed columns (column pruning happens
    BELOW the UDTF — the Python boundary blocks pushdown, so the
    filter and projection are applied to its INPUT, the
    documents_as_media rule), pass as a TABLE argument."""
    fn = quantity_units_udtf()
    li = lineitem.filter(F.col("l_quantity") <= max_qty).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    return fn(li.asTable())


@F.pandas_udf(T.IntegerType())
def _zlib_size(text: pd.Series) -> pd.Series:
    """Vectorized compressed-size probe (Arrow batch in/out).

    stdlib zlib at the default level; deterministic for a fixed zlib
    build (driver and executors share this container's Python)."""
    import zlib

    return text.map(
        lambda s: len(zlib.compress(s.encode("utf-8"))) if s is not None
        else None
    ).astype("Int32")


def compression_ratio(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document zlib compression ratio — the classic redundancy /
    boilerplate quality signal for corpus curation (highly compressible
    text is repetitive or templated; near-incompressible text is noise
    or already-encoded data).

    Only the compressed byte count crosses the Arrow boundary; byte
    length and the final ratio stay JVM-side. One scan, no shuffle —
    at 100 TB this is a pure map stage that scales with input splits.
    The ratio divides two exact ints once per row (rounded to 4dp for
    a stable report; the raw counts are also emitted)."""
    return docs.select(
        "doc_id",
        F.octet_length(text_col).alias("n_bytes"),
        _zlib_size(F.col(text_col)).alias("n_compressed"),
    ).withColumn(
        "ratio",
        F.round(F.col("n_compressed") / F.col("n_bytes"), 4),
    )


@F.pandas_udf(T.StringType())
def price_tier_iter(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    """ITERATOR-form scalar pandas UDF (SQL_SCALAR_PANDAS_ITER_UDF) —
    the eval mode that amortizes expensive per-task init (model/
    tokenizer load) across Arrow batches: state built ONCE before the
    loop, then one vectorized pass per batch. Same tier semantics as
    ``price_tier`` (the series-form twin)."""
    tiers = PRICE_TIERS  # stands in for the load-once model/tokenizer
    for total in batches:
        out = pd.Series("high", index=total.index, dtype="object")
        out[total <= tiers[1][0]] = tiers[1][1]
        out[total <= tiers[0][0]] = tiers[0][1]
        yield out


@F.pandas_udf(T.LongType())
def cents_sum_udaf(value: pd.Series) -> int:
    """Grouped-agg pandas UDF (SQL_GROUPED_AGG_PANDAS_UDF): exact
    integer cents sum — usable both in groupBy().agg() and as a
    WINDOW function (the PythonWindowFunction eval path q_udaf_window
    exercises). Values are 2-decimal, so round() never sits on a half
    boundary (the hash-gating precondition)."""
    return int((value * 100).round().astype("int64").sum())
