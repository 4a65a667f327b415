"""Shared plan-shape metric extraction for the r14 measurement tools.

Counts are anchored on the numbered details entries (``(n) NodeName``):
a formatted explain prints every physical node TWICE (once in the tree
sketch, once in the numbered details list), so bare-substring counts
are exactly 2x the real node count (tests/test_plans.py encodes the
same convention). Join-type and Python-node sets are unaffected by the
duplication but use the same anchor for consistency.
"""

from __future__ import annotations

import re

_PY_NODES = (
    "BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas"
    "|FlatMapGroupsInPandas|PythonMapInArrow"
)


def plan_stats(plan: str) -> dict:
    """Physical-node statistics of one ``explain('formatted')`` string."""
    return {
        "exchanges": len(re.findall(r"\(\d+\) Exchange\b", plan)),
        "reused": len(re.findall(r"\(\d+\) ReusedExchange\b", plan)),
        "parquet_scans": len(re.findall(r"\(\d+\) Scan parquet", plan)),
        "rdd_scans": len(re.findall(r"\(\d+\) Scan ExistingRDD", plan)),
        "joins": sorted(
            set(
                re.findall(
                    r"\(\d+\) (\w*(?:HashJoin|MergeJoin|NestedLoopJoin))",
                    plan,
                )
            )
        ),
        "py": sorted(set(re.findall(rf"\(\d+\) ({_PY_NODES})", plan))),
    }


def summary_line(plan: str) -> str:
    s = plan_stats(plan)
    return (
        f"Exchange={s['exchanges']} Reused={s['reused']}"
        f" scans={s['parquet_scans']}+{s['rdd_scans']}rdd"
        f" joins={','.join(s['joins']) or '-'}"
        f" py={','.join(s['py']) or '-'}"
    )
