"""Print the formatted physical plan of each headline query.

Usage: python scripts/show_plans.py [query_name ...]
Defaults to the bench headline set. Lets a reviewer inspect pushdown,
join strategies, and codegen spans without writing any code.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from kafka_s3_etl_spark.plans.registry import all_queries  # noqa: E402
from kafka_s3_etl_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    names = sys.argv[1:] or HEADLINE
    spark = build_session(app_name="show_plans")
    catalog = all_queries()
    for name in names:
        q = catalog[name]
        df = q.fn(spark, sf_dir)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        print(f"{'=' * 72}\n{name}  [{q.category}] {q.doc}\n{'=' * 72}\n{plan}")
    spark.stop()


if __name__ == "__main__":
    main()
