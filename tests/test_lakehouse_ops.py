"""Targeted tests for the round-4 lakehouse/retrieval additions:
MERGE upsert semantics, deterministic per-group sampling, and BM25
scoring against an independent pure-Python reference. (The DuckDB
oracle already hash-checks each registered query end-to-end; these pin
the operator contracts on controlled inputs.)
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_s3_etl_spark.operators.merge import merge_upsert
from kafka_s3_etl_spark.operators.prep import sample_per_group
from kafka_s3_etl_spark.operators.text import BM25_B, BM25_K1, bm25_scores
from kafka_s3_etl_spark.sources.tables import load_table


# ------------------------------------------------------------------ merge


def test_merge_upsert_update_insert_keep(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k bigint, status string, price double",
    )
    source = spark.createDataFrame(
        [(2, "b2", 22.0), (9, "new", 99.0)],
        "k bigint, status string, price double",
    )
    got = {r.k: r for r in merge_upsert(target, source, "k").collect()}
    assert set(got) == {1, 2, 3, 9}
    assert (got[1].status, got[1].price, got[1].action) == ("a", 10.0, "K")
    assert (got[2].status, got[2].price, got[2].action) == ("b2", 22.0, "U")
    assert (got[3].action) == "K"
    assert (got[9].status, got[9].price, got[9].action) == ("new", 99.0, "I")


def test_merge_upsert_replaces_matched_rows_wholesale(spark):
    """SQL MERGE 'WHEN MATCHED THEN UPDATE SET *' semantics: a matched
    source row's genuine NULL OVERWRITES the target value (a per-column
    coalesce would silently splice the stale target value back in)."""
    target = spark.createDataFrame([(1, "a")], "k bigint, status string")
    source = spark.createDataFrame([(1, None)], "k bigint, status string")
    got = merge_upsert(target, source, "k").collect()[0]
    assert got.status is None and got.action == "U"


def test_merge_upsert_null_key_rows_keep_correct_actions(spark):
    """Rows whose merge key IS NULL never join; a NULL-key target row is
    'K' (kept) and a NULL-key source row is 'I' — presence flags, not
    key NULL-ness, drive the tag."""
    target = spark.createDataFrame([(None, "t0"), (1, "t1")], "k bigint, v string")
    source = spark.createDataFrame([(None, "s0"), (1, "s1")], "k bigint, v string")
    got = {(r.k, r.v): r.action for r in merge_upsert(target, source, "k").collect()}
    assert got == {
        (None, "t0"): "K",  # pre-existing NULL-key row passes through
        (None, "s0"): "I",  # NULL-key change row inserts (never matches)
        (1, "s1"): "U",
    }


def test_merge_upsert_rejects_schema_mismatch(spark):
    t = spark.createDataFrame([(1, "a")], "k bigint, status string")
    s = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError, match="schemas differ"):
        merge_upsert(t, s, "k")


# ----------------------------------------------------------------- sample


def test_sample_per_group_partitioning_invariant(spark, sf_dir):
    """The sample is a pure row function: identical membership and ranks
    under any repartitioning (seeded-RNG sampling breaks exactly here)."""
    docs = load_table(spark, sf_dir, "documents")
    a = sorted(
        (r.lang, r.doc_id, r.rk)
        for r in sample_per_group(docs, "lang", "doc_id", 20).collect()
    )
    b = sorted(
        (r.lang, r.doc_id, r.rk)
        for r in sample_per_group(docs.repartition(13), "lang", "doc_id", 20).collect()
    )
    assert a == b
    per_group = {}
    for lang, _, rk in a:
        per_group.setdefault(lang, []).append(rk)
    for lang, rks in per_group.items():
        assert sorted(rks) == list(range(1, len(rks) + 1)), lang
        assert len(rks) <= 20


# ------------------------------------------------------------------- bm25


def _bm25_ref(docs: dict[int, str], terms: list[str]) -> dict[int, tuple[int, float]]:
    toks = {d: t.split(" ") for d, t in docs.items()}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    out = {}
    for d, v in toks.items():
        matched, score = 0, 0.0
        for t in terms:
            tf = v.count(t)
            if tf == 0:
                continue
            matched += 1
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            score += idf * (tf * (BM25_K1 + 1)) / (
                tf + BM25_K1 * (1 - BM25_B + BM25_B * len(v) / avgdl)
            )
        if matched:
            out[d] = (matched, score)
    return out


def test_bm25_matches_pure_python_reference(spark):
    docs = {
        0: "join scan join merge filter",
        1: "scan scan scan scan",
        2: "vector",
        3: "completely unrelated words here",
        4: "join vector merge scan join vector",
    }
    sdf = spark.createDataFrame(list(docs.items()), "doc_id bigint, text string")
    terms = ["join", "scan", "vector", "merge"]
    got = {r.doc_id: r for r in bm25_scores(sdf, terms).collect()}
    ref = _bm25_ref(docs, terms)
    assert set(got) == set(ref)  # doc 3 matches nothing -> absent
    for d, (matched, score) in ref.items():
        assert got[d].matched_terms == matched
        assert got[d].bm25 == pytest.approx(round(score, 4), abs=1e-4)


def test_bm25_rare_term_outranks_common(spark):
    """A doc matching only a rarer term must outscore one matching only
    a (same-tf) more common term — the IDF ordering property."""
    docs = {
        0: "rare filler filler filler",
        1: "common filler filler filler",
        2: "common filler filler filler",
        3: "common filler filler filler",
        4: "common filler filler filler",
    }
    sdf = spark.createDataFrame(list(docs.items()), "doc_id bigint, text string")
    got = {r.doc_id: r.bm25 for r in bm25_scores(sdf, ["rare", "common"]).collect()}
    assert got[0] > got[1]


def test_merge_upsert_batch_split_invariant(spark):
    """Folding a change-set in (<=1 change per key) through ANY sequence
    of partial merges converges to the one-shot MERGE — the property
    that makes s_cdc_upsert's result independent of micro-batching."""
    target = spark.createDataFrame(
        [(i, f"s{i}", float(i)) for i in range(30)],
        "k bigint, status string, price double",
    )
    changes = spark.createDataFrame(
        [(i, "upd", i * 2.0) for i in range(0, 30, 3)]
        + [(100 + i, "new", 0.5) for i in range(4)],
        "k bigint, status string, price double",
    )
    one_shot = merge_upsert(target, changes, "k", action_col=None)
    folded = target
    for i in range(3):  # arbitrary 3-way split, applied sequentially
        part = changes.filter(F.col("k") % 3 == i)
        folded = merge_upsert(folded, part, "k", action_col=None)
    key = lambda r: r.k  # noqa: E731
    assert sorted(one_shot.collect(), key=key) == sorted(folded.collect(), key=key)


# ------------------------------------------------- partitioned CDC apply


def test_apply_cdc_batch_rewrites_only_affected_partitions(spark, tmp_path):
    """The 100-TB CDC contract: a batch MERGEs into and rewrites ONLY
    the key-range partitions its keys hash into — untouched partitions'
    data files survive byte-for-byte (same names, sizes, mtimes)."""
    import glob
    import os

    from kafka_s3_etl_spark.operators.merge import (
        apply_cdc_batch,
        read_partitioned_target,
        write_partitioned_target,
    )

    path = str(tmp_path / "t")
    target = spark.createDataFrame(
        [(k, float(k)) for k in range(1, 201)], "k bigint, v double"
    )
    write_partitioned_target(target, path, "k", n_buckets=8)

    def snap() -> dict[str, dict[str, tuple[int, int]]]:
        out = {}
        for pdir in glob.glob(os.path.join(path, "_kb=*")):
            st = {
                os.path.basename(f): (os.stat(f).st_size, os.stat(f).st_mtime_ns)
                for f in glob.glob(os.path.join(pdir, "*.parquet"))
            }
            out[os.path.basename(pdir)] = st
        return out

    before = snap()
    assert len(before) == 8  # 200 keys cover all 8 buckets
    batch = spark.createDataFrame([(1, -1.0), (999, 9.0)], "k bigint, v double")
    affected = apply_cdc_batch(batch, path, "k", n_buckets=8)
    after = snap()

    aff_names = {f"_kb={b}" for b in affected}
    assert 0 < len(aff_names) <= 2  # 2 keys -> at most 2 buckets
    untouched = set(before) - aff_names
    assert untouched, "test needs at least one untouched partition"
    for pname in untouched:
        assert after[pname] == before[pname], f"{pname} was rewritten"
    for pname in aff_names:
        assert after[pname] != before[pname], f"{pname} was not rewritten"

    got = {r.k: r.v for r in read_partitioned_target(spark, path, ["k", "v"]).collect()}
    exp = {k: float(k) for k in range(1, 201)} | {1: -1.0, 999: 9.0}
    assert got == exp


def test_apply_cdc_batch_empty_batch_is_a_noop(spark, tmp_path):
    from kafka_s3_etl_spark.operators.merge import (
        apply_cdc_batch,
        write_partitioned_target,
    )

    path = str(tmp_path / "t")
    target = spark.createDataFrame([(1, 1.0)], "k bigint, v double")
    write_partitioned_target(target, path, "k", n_buckets=4)
    empty = spark.createDataFrame([], "k bigint, v double")
    assert apply_cdc_batch(empty, path, "k", n_buckets=4) == []


# -------------------------------------------- merge property (hypothesis)

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_MERGE_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_target_rows = st.lists(
    st.tuples(st.integers(0, 20), st.integers(0, 99)),
    min_size=1, max_size=15, unique_by=lambda r: r[0],
)
_source_rows = st.lists(
    st.tuples(st.integers(0, 30), st.integers(100, 199)),
    min_size=0, max_size=15, unique_by=lambda r: r[0],
)


@_MERGE_SETTINGS
@given(target=_target_rows, source=_source_rows)
def test_merge_upsert_matches_dict_semantics(spark, target, source):
    """MERGE == dict.update: target mapping updated by the source
    mapping, action = I/U/K by membership."""
    t = spark.createDataFrame(target, "k bigint, v bigint")
    s = spark.createDataFrame(source, "k bigint, v bigint") if source else \
        spark.createDataFrame([], "k bigint, v bigint")
    got = {r.k: (r.v, r.action) for r in merge_upsert(t, s, "k").collect()}
    td, sd = dict(target), dict(source)
    exp = {
        k: (sd.get(k, v), "U" if k in sd else "K") for k, v in td.items()
    } | {k: (v, "I") for k, v in sd.items() if k not in td}
    assert got == exp


def test_sorted_layout_files_disjoint_and_filter_pushed(spark, sf_dir):
    """x_sorted_layout's scratch copy must deliver what the layout
    promises: per-file ts (min, max) spans that never interleave (so
    footer stats can skip whole files for a time-range read), and the
    readback range filter reaching the scan as PushedFilters."""
    import glob

    import pyarrow.parquet as pq

    from kafka_s3_etl_spark.plans.layout import sorted_events_dir
    from kafka_s3_etl_spark.plans.registry import all_queries

    out = sorted_events_dir(spark, sf_dir)
    spans = []
    for f in glob.glob(f"{out}/*.parquet"):
        md = pq.read_metadata(f)
        lo = min(
            md.row_group(i).column(1).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(1).statistics.max
            for i in range(md.num_row_groups)
        )
        assert md.schema.column(1).name == "ts"
        spans.append((lo, hi))
    assert len(spans) > 1
    spans.sort()
    for (_, prev_hi), (next_lo, _) in zip(spans, spans[1:]):
        assert prev_hi <= next_lo, "file ts spans interleave"

    q = all_queries()["x_sorted_layout"]
    plan = spark._jvm.PythonSQLUtils.explainString(
        q.fn(spark, sf_dir)._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts," in plan


def test_nested_pruning_readschema_is_two_leaves(spark, sf_dir):
    """x_nested_pruning's scan must read ONLY the two touched struct
    leaves — nested-schema pruning narrows ReadSchema to
    payload.event_type + payload.user_id; the untouched value/props
    leaves must not appear anywhere in the scan."""
    from kafka_s3_etl_spark.plans.registry import all_queries

    q = all_queries()["x_nested_pruning"]
    plan = spark._jvm.PythonSQLUtils.explainString(
        q.fn(spark, sf_dir)._jdf.queryExecution(), "formatted"
    )
    assert (
        "ReadSchema: struct<payload:struct<user_id:bigint,"
        "event_type:string>>" in plan
    )
    assert "value" not in plan.split("ReadSchema")[1][:200]
    assert "props" not in plan
