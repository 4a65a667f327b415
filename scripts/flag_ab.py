"""Targeted idle re-measurement for bench-flagged queries (the
committed A/B protocol, CLAUDE.md): same methodology as bench.py
(build_session, warm-up scan, best-of-2 per query), but only the named
queries, so repeated idle runs are cheap enough to establish whether a
BENCH_LOCAL per-query min is reachable on this host or stale.

    python scripts/flag_ab.py q_knn_join q_corr_matrix [...]

Prints one JSON line {"queries": {name: best_sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _warm_python_workers  # noqa: E402
from kafka_s3_etl_spark.plans.registry import all_queries  # noqa: E402
from kafka_s3_etl_spark.session import build_session  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    assert names, "pass query names"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="flag_ab")
    catalog = all_queries()
    catalog["q_scan_project"].fn(spark, sf_dir).count()
    _warm_python_workers(spark)
    timings = {}
    for name in names:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            catalog[name].fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    print(json.dumps({"queries": timings, "sf": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
