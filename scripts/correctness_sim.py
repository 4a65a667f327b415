"""Full driver-correctness simulation: run EVERY catalog entry through
the __spark_entry__ contract with a VANILLA SparkSession (no engine
confs — exactly what the driver builds) and hash-compare against its
DuckDB oracle at sf0.01.

The pytest oracle gate uses build_session (AQE, UTC, Arrow pinned);
this script is the stricter check that no query silently depends on
those confs. Run it from anywhere — it must not need the repo cwd.

    python scripts/correctness_sim.py [sf_dir]

Beyond values, every oracle's column TYPES are DESCRIBE-checked against
the Spark schema (tests/oracle.py::_TYPE_MAP): DuckDB silently widens
(SUM(int) -> HUGEINT, to_json -> JSON) and Python fetchall() renders
the widened values identically, so a value-only comparison would pass
queries the driver's type-aware hash fails.

Prints one line per query and a final summary; exit 1 on any mismatch.

    python scripts/correctness_sim.py [sf_dir] [--json OUT.json]

--json writes a per-query artifact in the driver's CORRECTNESS_r{N}
format ({rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err}) so the catalog entries past the driver's sweep cap carry durable
driver-contract evidence each round. Rows-only entries (no oracle)
additionally carry "rows_only": true with oracle_rows/schema/hash null.
"""

from __future__ import annotations

import datetime
import importlib.util
import json
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.oracle import _TYPE_MAP  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _norm(v: object) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        # Exact: the driver's hash is type-aware and bit-exact, so any
        # rounding here would pass values the driver fails. Queries are
        # REQUIRED to make float aggregates engine-exact (integer-exact
        # accumulation, round once — see CLAUDE.md).
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    # A wedged DuckDB oracle must become a recorded failure, not an
    # invisible multi-hour stall (q_entity_resolution's all-pairs
    # levenshtein reference wedged two sf0.1 passes at ~47 min each
    # before being identified). Default is far above the slowest
    # legitimate oracle+compare observed (q_jaccard_neighbors, 802 s
    # at sf0.1).
    oracle_timeout = 1200.0
    if "--oracle-timeout" in argv:
        i = argv.index("--oracle-timeout")
        oracle_timeout = float(argv[i + 1])
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()  # VANILLA
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    n = mod.entry(spark).count()
    print(f"entry(): {n} rows")
    qs, osql = mod.queries(), mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    records: dict[str, dict] = {}
    t_start = time.time()
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        t0 = time.time()
        rec = {
            "rows_match": None,
            "schema_match": None,
            "hash_match": None,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
            # which scale factor THIS verification actually ran at —
            # the artifact-level claim ("all entries verified at
            # sf0.01") becomes per-entry evidence (VERDICT r10 #7)
            "sf": os.path.basename(sf_dir.rstrip("/")),
        }
        records[name] = rec
        try:
            sdf = fn(spark, sf_dir)
            cols = sorted(sdf.columns)
            srows = sorted(
                "|".join(_norm(r[c]) for c in cols) for r in sdf.collect()
            )
            rec["spark_rows"] = len(srows)
            if name not in osql:
                rec["rows_only"] = True
                status = f"rows-only ({len(srows)} rows)"
                rec["rows_match"] = True
                if not srows and name not in ("q_join_anti", "q_except"):
                    failures.append((name, "rows-only returned 0 rows"))
                    rec["rows_match"] = False
                    rec["err"] = "rows-only returned 0 rows"
                    status = "EMPTY"
            else:
                spark_types = {
                    f.name: f.dataType.simpleString() for f in sdf.schema.fields
                }
                oracle_types = dict(
                    (r[0], r[1])
                    for r in con.execute(f"DESCRIBE {osql[name]}").fetchall()
                )
                type_errs = [
                    f"{c}: spark {st} wants {_TYPE_MAP[st]}, oracle {oracle_types.get(c)}"
                    for c, st in spark_types.items()
                    if st in _TYPE_MAP and oracle_types.get(c) != _TYPE_MAP[st]
                ]
                import threading

                # Interrupt guard: without it the Timer can fire AFTER
                # fetchall() returns but BEFORE timer.cancel(), landing
                # con.interrupt() on the shared connection with no query
                # running and cancelling the NEXT entry's execute
                # (ADVICE r13). The lock+flag makes fire-vs-complete
                # atomic: whichever wins, a completed entry is never
                # followed by a stray interrupt.
                guard = threading.Lock()
                entry_done = [False]

                def _interrupt_if_running() -> None:
                    with guard:
                        if not entry_done[0]:
                            con.interrupt()

                timer = threading.Timer(oracle_timeout, _interrupt_if_running)
                timer.start()
                try:
                    cur = con.execute(osql[name])
                    onames = [d[0] for d in cur.description]
                    order = sorted(
                        range(len(onames)), key=lambda i: onames[i]
                    )
                    orows = sorted(
                        "|".join(_norm(r[i]) for i in order)
                        for r in cur.fetchall()
                    )
                finally:
                    with guard:
                        entry_done[0] = True
                    timer.cancel()
                rec["oracle_rows"] = len(orows)
                rec["rows_match"] = len(srows) == len(orows)
                rec["schema_match"] = not type_errs and sorted(onames) == cols
                rec["hash_match"] = rec["schema_match"] and srows == orows
                if type_errs:
                    failures.append((name, "; ".join(type_errs)))
                    rec["err"] = "; ".join(type_errs)
                    status = "TYPE MISMATCH"
                elif sorted(onames) != cols:
                    failures.append((name, f"columns {cols} vs {sorted(onames)}"))
                    rec["err"] = f"columns {cols} vs {sorted(onames)}"
                    status = "COLUMN MISMATCH"
                elif srows != orows:
                    failures.append(
                        (name, f"values: spark={len(srows)} oracle={len(orows)}")
                    )
                    rec["err"] = "value hash mismatch"
                    status = "HASH MISMATCH"
                else:
                    status = f"hash ok ({len(srows)} rows)"
        except Exception as exc:  # noqa: BLE001 — report and continue
            failures.append((name, f"{type(exc).__name__}: {str(exc)[:100]}"))
            rec["err"] = f"{type(exc).__name__}: {str(exc)[:200]}"
            status = "ERROR"
        print(f"  {name}: {status} [{time.time() - t0:.1f}s]")

    print(
        f"\n{len(records)} queries in {time.time() - t_start:.0f}s; "
        f"{len(failures)} failures"
    )
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(records, fh, indent=2)
        print(f"wrote {json_out} ({len(records)} entries)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
