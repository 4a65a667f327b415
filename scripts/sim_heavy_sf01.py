"""Multi-SF hash evidence for the heavy tier (VERDICT r11 #3, kept
current each round): run the N most expensive headline entries (by the
committed BENCH_LOCAL baseline) through the driver simulation at sf0.1
and merge the rows into the round's CORRECTNESS_SIM artifact — sf0.1
evidence replaces the sf0.01 row (strictly stronger: AQE plan shapes
and broadcast thresholds actually differ at bench scale), with the
sf0.01 pass kept as `also_verified_sf`.

    python scripts/sim_heavy_sf01.py CORRECTNESS_SIM_r{N}.json [top_n] \\
        [--families dedup,graph,streaming]

With --families, every registry entry in those categories is added to
the top-N-by-baseline set (VERDICT r12 #3: operators whose whole risk
is DISTRIBUTIONAL — clique/skew regimes — stay untested at sf0.01).

Runs correctness_sim.py as a subprocess (fresh vanilla session, exactly
the driver contract) and edits the artifact in place.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Correctness-tier cells excluded from the sf0.1 pass. Round 14
# emptied the set: q_entity_resolution's oracle became a blocked
# deletion-neighborhood replay + fixed-round min-label chain (1.2 s
# standalone at sf0.1, vs the all-pairs levenshtein closure that
# wedged two r13 passes); q_interval_overlap (1 output row) and
# q_decile_lift (10 rows) were measured compare-trivial — the r13
# exclusion conflated their single-task CELL shape (a documented
# scale-killer with shipped _scalable twins) with verification cost;
# and q_containment_join's quadratic 15.7M pairs turned out to be
# INTERMEDIATE — its output is 4992 capped rows, and the r14 sf0.1
# run verified it end-to-end (Spark 181 s, oracle+compare within the
# timeout). Keep this set for future entries whose OUTPUT is genuinely
# compare-bound (the 3.5M-row jaccard compare measured 802 s — that
# class belongs here, carried by twins).
EXCLUDE_QUADRATIC: set[str] = set()


def heavy_names(top_n: int, families: list[str]) -> list[str]:
    with open(os.path.join(REPO, "BENCH_LOCAL.json")) as fh:
        queries = json.load(fh)["queries"]
    names = [
        k for k, _ in sorted(queries.items(), key=lambda kv: -kv[1])[:top_n]
    ]
    if families:
        sys.path.insert(0, REPO)
        from kafka_s3_etl_spark.plans.registry import all_queries

        fam = set(families)
        names += [
            q.name
            for q in all_queries().values()
            if q.category in fam and q.name not in names
        ]
    return [n for n in names if n not in EXCLUDE_QUADRATIC]


def main() -> int:
    argv = list(sys.argv[1:])
    families: list[str] = []
    if "--families" in argv:
        i = argv.index("--families")
        families = argv[i + 1].split(",")
        del argv[i : i + 2]
    artifact = argv[0]
    top_n = int(argv[1]) if len(argv) > 1 else 25
    names = heavy_names(top_n, families)
    print(f"{len(names)} entries selected for the sf0.1 pass")
    out = tempfile.mktemp(suffix=".json", prefix="sim_heavy_")
    rc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "correctness_sim.py"),
            "/root/testdata/sf0.1",
            "--only",
            ",".join(names),
            "--json",
            out,
        ],
        cwd="/tmp",
    ).returncode
    if rc != 0:
        print("heavy-tier sim FAILED — artifact left untouched")
        return rc
    path = os.path.join(REPO, artifact)
    full = json.load(open(path))
    merged = 0
    for name, rec in json.load(open(out)).items():
        prev = full.get(name)
        if prev and (prev.get("hash_match") or prev.get("rows_match")):
            rec = dict(rec)
            rec["also_verified_sf"] = prev.get("sf", "sf0.01")
        full[name] = rec
        merged += 1
    with open(path, "w") as fh:
        json.dump(full, fh, indent=2)
    print(f"merged {merged} sf0.1 rows into {artifact}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
