"""Central query registry.

Each entry pairs a Spark query builder ``(spark, sf_dir) -> DataFrame``
with (when ANSI-SQL-expressible) an equivalent DuckDB oracle SQL string.
The driver hash-matches the two at sf0.01; the same pairs back the local
pytest oracle harness (tests/oracle.py).

Conventions (driver contract, see repo __spark_entry__.py docstring):
* every computed/aggregate column is aliased identically on both sides;
* float aggregates are rounded on both sides so summation-order noise
  cannot flip the value hash;
* Spark/DuckDB type mismatches (e.g. year(): int vs bigint) are CAST
  away in the oracle SQL.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Modules that register queries on import (one per SURVEY section 2b family).
_PLAN_MODULES = [
    "kafka_s3_etl_spark.plans.relational",
    "kafka_s3_etl_spark.plans.temporal",
    "kafka_s3_etl_spark.plans.llm",
    "kafka_s3_etl_spark.plans.prep",
    "kafka_s3_etl_spark.plans.etl",
    "kafka_s3_etl_spark.plans.streaming_queries",
    # Keep later-round modules last: within the cost-0 oracle tier the
    # sweep tie-breaks on registration order, so late registration keeps
    # the sweep prefix earlier rounds observed stable. (tests/
    # test_plans.py pins only tier/cost monotonicity, not positions.)
    "kafka_s3_etl_spark.plans.lakehouse",
    "kafka_s3_etl_spark.plans.features",
    "kafka_s3_etl_spark.plans.analytics",
    "kafka_s3_etl_spark.plans.mining",
    "kafka_s3_etl_spark.plans.olap",
    "kafka_s3_etl_spark.plans.warehouse",
    "kafka_s3_etl_spark.plans.sketches",
    "kafka_s3_etl_spark.plans.stats",
    "kafka_s3_etl_spark.plans.scaleops",
    "kafka_s3_etl_spark.plans.channels",
    "kafka_s3_etl_spark.plans.storage",
    "kafka_s3_etl_spark.plans.mlfeat",
    "kafka_s3_etl_spark.plans.semantics",
    "kafka_s3_etl_spark.plans.curation",
    "kafka_s3_etl_spark.plans.diststats",
    "kafka_s3_etl_spark.plans.mleval",
    "kafka_s3_etl_spark.plans.tsdiag",
    "kafka_s3_etl_spark.plans.graphops",
    "kafka_s3_etl_spark.plans.corpus",
    "kafka_s3_etl_spark.plans.layout",
    "kafka_s3_etl_spark.plans.bounded",
    "kafka_s3_etl_spark.plans.diagnostics",
    "kafka_s3_etl_spark.plans.signals",
    "kafka_s3_etl_spark.plans.experiments",
    "kafka_s3_etl_spark.plans.integrity",
    "kafka_s3_etl_spark.plans.inference",
    "kafka_s3_etl_spark.plans.hypothesis",
    "kafka_s3_etl_spark.plans.ranks",
    "kafka_s3_etl_spark.plans.curation_audit",
    "kafka_s3_etl_spark.plans.revenue_ops",
    "kafka_s3_etl_spark.plans.asof_ext",
    "kafka_s3_etl_spark.plans.rolling",
    "kafka_s3_etl_spark.plans.scalewin",
    "kafka_s3_etl_spark.plans.evalops",
    "kafka_s3_etl_spark.plans.oracleext",
    "kafka_s3_etl_spark.plans.mediadedup",
    "kafka_s3_etl_spark.plans.substring",
    "kafka_s3_etl_spark.plans.textmine",
    "kafka_s3_etl_spark.plans.mixing",
    "kafka_s3_etl_spark.plans.pipelineops",
    "kafka_s3_etl_spark.plans.execution",
    "kafka_s3_etl_spark.plans.opsext",
]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # None => driver's weaker rows-only check
    category: str
    doc: str = ""
    cost: int = 0  # relative runtime hint; orders the sweep, see all_queries()
    seq: int = 0  # in-module registration order (deterministic per module)


REGISTRY: dict[str, Query] = {}

# Capability-gated entries that could NOT register in this environment,
# name -> human-readable reason (printed by the gate test, mirrored in
# SURVEY section 2). An entry appears in exactly one of REGISTRY/GATED:
# when the missing capability shows up, the registration self-enables
# and the SURVEY totals tripwire prompts the docs update.
GATED: dict[str, str] = {}


def register(
    name: str,
    *,
    oracle: str | None = None,
    category: str,
    doc: str = "",
    cost: int = 0,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query builder to the catalog.

    ``cost`` is a coarse relative-runtime hint (0 = cheap expression
    plan, higher = streaming micro-batches / iterative algorithms); it
    only affects sweep ordering, never semantics.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(
            name=name,
            fn=fn,
            oracle=oracle,
            category=category,
            doc=doc,
            cost=cost,
            seq=len(REGISTRY),
        )
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import all plan modules (idempotent) and return the full catalog,
    ordered for a time-budgeted correctness sweep: hash-checkable
    (oracle-backed) entries first, rows-only after, and within each tier
    cheap before expensive — so a sweep cut short still covers every
    oracle query before spending time on iterative/streaming rows-only
    entries.

    Ties break on (_PLAN_MODULES position, in-module registration
    order) — NOT on raw REGISTRY insertion order, which depends on who
    imported which plan module first (a test importing one module
    directly would otherwise reshuffle the driver's 50-entry sweep
    prefix; tests/test_survey_totals.py pins it)."""
    for mod in _PLAN_MODULES:
        importlib.import_module(mod)
    mod_pos = {m: i for i, m in enumerate(_PLAN_MODULES)}
    ordered = sorted(
        REGISTRY.values(),
        key=lambda q: (
            q.oracle is None,
            q.cost,
            mod_pos.get(q.fn.__module__, len(_PLAN_MODULES)),
            q.seq,
        ),
    )
    return {q.name: q for q in ordered}
