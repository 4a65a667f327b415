"""Round-14 full-catalog plan audit: build EVERY headline query's
DataFrame at sf0.1, capture plan-shape stats (Exchange count, join
strategies, Python eval nodes, parquet scan count) WITHOUT executing
the final action, and flag anti-pattern signatures:

* BatchEvalPython anywhere (row-at-a-time Python);
* parquet scan counts far above the query's table fan-in (duplicated
  un-checkpointed lineage — the q_simjoin_prefix r14 finding);
* BroadcastNestedLoopJoin on non-trivial inputs.

NOTE: queries whose build phase runs jobs eagerly (streaming demos,
iterative operators with localCheckpoint) DO execute during the build;
their stats describe the final returned plan only.

    python scripts/plan_audit.py [--out FILE] [q_name ...]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from kafka_s3_etl_spark.plans.registry import all_queries  # noqa: E402
from kafka_s3_etl_spark.session import build_session  # noqa: E402


def stats(plan: str) -> dict:
    from scripts._planstats import plan_stats

    return plan_stats(plan)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()
    out = args.out
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = args.queries or [n for n in HEADLINE]
    spark = build_session(app_name="plan_audit_r14")
    catalog = all_queries()
    results = {}
    for name in names:
        if name not in catalog:
            continue
        t0 = time.perf_counter()
        try:
            df = catalog[name].fn(spark, sf_dir)
            plan = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            rec = stats(plan)
            rec["build_sec"] = round(time.perf_counter() - t0, 3)
            results[name] = rec
            flags = []
            if "BatchEvalPython" in rec["py"]:
                flags.append("BATCH_EVAL_PYTHON")
            if rec["parquet_scans"] > 6:
                flags.append(f"SCANS={rec['parquet_scans']}")
            if rec["exchanges"] > 30:
                flags.append(f"EXCHANGES={rec['exchanges']}")
            print(
                f"{name}: ex={rec['exchanges']} scans={rec['parquet_scans']}"
                f" py={','.join(rec['py']) or '-'}"
                f" build={rec['build_sec']}s"
                + (f"  ** {' '.join(flags)}" if flags else ""),
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — audit must cover the rest
            results[name] = {"error": str(e)[:200]}
            print(f"{name}: ERROR {str(e)[:120]}", flush=True)
    if out:
        with open(out, "w") as fh:
            json.dump(results, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
