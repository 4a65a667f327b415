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
    return flag (applyInPandas: one pandas frame per group).

    Projected to the three used columns BEFORE the groupBy: the UDF
    receives whole rows, so Catalyst cannot prune through
    FlatMapGroupsInPandas — without the select, all 16 lineitem columns
    would ride the shuffle and the Arrow transfer.
    """

    def wavg(pdf: pd.DataFrame) -> pd.DataFrame:
        w = pdf["l_quantity"].sum()
        v = (pdf["l_extendedprice"] * pdf["l_quantity"]).sum() / w
        return pd.DataFrame(
            {"l_returnflag": [pdf["l_returnflag"].iloc[0]], "wavg_price": [round(v, 4)]}
        )

    return (
        lineitem.select("l_returnflag", "l_extendedprice", "l_quantity")
        .groupBy("l_returnflag")
        .applyInPandas(wavg, schema="l_returnflag string, wavg_price double")
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
