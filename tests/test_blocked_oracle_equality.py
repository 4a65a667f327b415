"""The blocked deletion-neighborhood oracle must define EXACTLY the
edge set of the all-pairs levenshtein reference (VERDICT r13 #1).

q_entity_resolution's oracle was rebuilt in round 14 on
``_FUZZY_ORACLE_EDGES_BLOCKED`` (FastSS/SymSpell signature replay,
O(n·L)) because the all-pairs CTE is O(n²) — 112M levenshtein calls at
sf0.1 wedged two sim passes. The replay is only a valid oracle if its
``e`` CTE is set-equal to the brute-force one; the blocking argument
(position-tagged deletion signatures admit exactly the distance-1
pairs — operators/linkage.py docstring) is checked here empirically at
BOTH test scale factors, pure DuckDB, no Spark session needed.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from kafka_s3_etl_spark.plans.mining import (
    _FUZZY_ORACLE_EDGES,
    _FUZZY_ORACLE_EDGES_BLOCKED,
)

_SFS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf_dir", _SFS)
def test_blocked_edges_equal_all_pairs_edges(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{sf_dir}/customer.parquet')"
    )
    tail = " SELECT a, b FROM e ORDER BY a, b"
    brute = con.execute(_FUZZY_ORACLE_EDGES + tail).fetchall()
    blocked = con.execute(_FUZZY_ORACLE_EDGES_BLOCKED + tail).fetchall()
    assert len(brute) > 0, "degenerate fixture: no ed1 pairs at all"
    assert blocked == brute
    # the blocked e must also be duplicate-free (the recursive closure
    # tolerates dup edges, but set-equality is the stronger contract)
    assert len(set(blocked)) == len(blocked)
