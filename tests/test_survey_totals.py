"""The judge's checklist is SURVEY.md §2; its stated totals line must
match the registry exactly (r5 VERDICT #3 caught a 141/14 vs 140/15
drift). Pure-Python: parses the LAST "Totals after batch" line and
compares against `all_queries()`."""

from __future__ import annotations

import os
import re

from kafka_s3_etl_spark.plans.registry import all_queries

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_survey_totals_match_registry():
    text = open(os.path.join(REPO, "SURVEY.md")).read()
    lines = re.findall(
        r"Totals after batch [^:]*:\s*\*\*(\d+) queries / (\d+) "
        r"DuckDB-oracle-checked, (\d+) rows-only",
        text,
    )
    assert lines, "SURVEY.md must keep a 'Totals after batch' line"
    total, oracle, rows_only = (int(x) for x in lines[-1])

    qs = all_queries()
    n_oracle = sum(1 for q in qs.values() if getattr(q, "oracle", None))
    assert (total, oracle, rows_only) == (
        len(qs),
        n_oracle,
        len(qs) - n_oracle,
    ), "SURVEY §2 totals line drifted from plans/registry.py"


# The exact 50-entry driver sweep prefix, as hash-checked by every
# driver round since r4 (== CORRECTNESS_r0{5..9}.json key order). A
# literal, not a file read: the guarantee must hold even where the
# artifacts aren't checked out (VERDICT r9 item 5).
SWEEP_PREFIX_50 = [
    "q_scan_project", "q_filter_conj", "q_expr_arith", "q_null_handling",
    "q_case_when", "q_string_funcs", "q_date_funcs", "q_math_funcs",
    "q_sort_limit", "q_join_inner", "q_join_left", "q_join_full",
    "q_join_semi", "q_join_anti", "q_join_broadcast", "q_join_theta_range",
    "q_join_multiway", "q_agg_global", "q_agg_group", "q_agg_distinct",
    "q_rollup", "q_cube", "q_grouping_sets", "q_window_rank",
    "q_window_lag_lead", "q_window_running", "q_topk_per_group",
    "q_union_all", "q_union_distinct", "q_intersect", "q_except",
    "q_array_explode", "q_json_extract", "q_pivot", "q_percentiles",
    "q_histogram", "q_join_salted", "q_window_range_frame",
    "q_window_ntile", "q_scalar_subquery", "q_variant_extract",
    "q_unpivot", "q_asof_join", "q_sessionize", "q_ewma_user",
    "q_dedup_exact", "q_ngram_jaccard", "q_dedup_embedding",
    "q_dedup_incremental", "q_text_stats",
]


def test_driver_sweep_prefix_is_stable():
    """The driver hash-checks only the FIRST 50 entries of
    all_queries() sweep order; every round since r4 observed the same
    prefix, and new registrations must never reorder it (new modules
    go LAST in _PLAN_MODULES, new entries sort after within their
    tier). Pin the exact names (literal above) and cross-check the
    driver's own artifact key order where present."""
    import json

    got = list(all_queries().keys())[:50]
    assert got == SWEEP_PREFIX_50, (
        "driver sweep prefix drifted — check _PLAN_MODULES order / "
        "new cost-0 oracle registrations in early modules"
    )
    for artifact in ("CORRECTNESS_r05.json", "CORRECTNESS_r09.json"):
        path = os.path.join(REPO, artifact)
        if not os.path.exists(path):
            continue
        want = list(json.load(open(path)).keys())
        assert got[: len(want)] == want, f"prefix drifted vs {artifact}"


def test_capability_gated_entries_are_exclusive():
    """Every capability-gated entry lives in exactly ONE of
    REGISTRY/GATED (r7 verdict #6: the registration logic itself is
    exercised in both environments; when the capability appears the
    entry self-enables and the totals tripwire above prompts the docs
    update). Prints each skip reason so a test run shows WHY an entry
    is absent."""
    from kafka_s3_etl_spark.plans.registry import GATED

    qs = all_queries()
    for name, reason in GATED.items():
        assert name not in qs, f"{name} both registered and gated"
        print(f"GATED {name}: {reason}")
    try:
        import google.protobuf  # noqa: F401

        have_protobuf = True
    except ImportError:
        have_protobuf = False
    if have_protobuf:
        assert "s_session_timeout_tws" in qs
    else:
        assert "s_session_timeout_tws" in GATED


def test_survey_table_ids_and_readme_counts_match_registry():
    """VERDICT r10 #8: the totals line is pinned above, but a drifted
    query id inside a SURVEY batch-table ROW (or a stale README count)
    would still pass. Assert (a) every backticked q_/s_/x_ id used as
    the FIRST cell of a SURVEY.md table row is a live registry or
    GATED entry, (b) every registry entry appears somewhere in
    SURVEY.md, and (c) README.md's "N of M catalog queries" sentence
    matches the registry exactly."""
    from kafka_s3_etl_spark.plans.registry import GATED

    qs = all_queries()
    survey = open(os.path.join(REPO, "SURVEY.md")).read()

    table_ids = set(
        re.findall(r"^\|\s*`([qsx]_[a-z0-9_]+)`\s*\|", survey, re.M)
    )
    known = set(qs) | set(GATED)
    ghost = sorted(table_ids - known)
    assert not ghost, f"SURVEY.md table rows name unknown entries: {ghost}"

    missing = sorted(n for n in qs if f"`{n}`" not in survey and n not in survey)
    assert not missing, f"registry entries absent from SURVEY.md: {missing}"

    readme = open(os.path.join(REPO, "README.md")).read()
    m = re.search(r"(\d+) of (\d+) catalog queries", readme)
    assert m, "README.md lost the 'N of M catalog queries' sentence"
    n_oracle = sum(1 for q in qs.values() if getattr(q, "oracle", None))
    assert (int(m.group(1)), int(m.group(2))) == (n_oracle, len(qs)), (
        "README catalog counts drifted from plans/registry.py"
    )


def test_catalog_md_is_fresh():
    """VERDICT r11 #8: CATALOG.md is the one-place current-state view
    of the registry (id, category, tier, file:line, headline,
    last-verified evidence). It is generated — any drift between the
    committed file and the live registry fails here; regenerate with
    `python scripts/gen_catalog.py`."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "gen_catalog", os.path.join(REPO, "scripts", "gen_catalog.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    want = mod.build_catalog_md()
    path = os.path.join(REPO, "CATALOG.md")
    assert os.path.exists(path), "CATALOG.md missing — run scripts/gen_catalog.py"
    assert open(path).read() == want, (
        "CATALOG.md stale — run python scripts/gen_catalog.py"
    )
