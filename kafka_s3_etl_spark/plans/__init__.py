"""Query catalog: every operator from SURVEY.md section 2b, wired to the
testdata tables, with its DuckDB oracle SQL where hash-matchable."""

from kafka_s3_etl_spark.plans.registry import REGISTRY, Query, all_queries, register

__all__ = ["REGISTRY", "Query", "all_queries", "register"]
