"""containment_join_capped (batch 41): planted-containment recall and
exactness-on-survivors, on corpora the oracle-parity suite's synthetic
documents cannot shape. The cap changes which pairs are TESTED, never a
tested pair's value — both properties checked against a brute-force
reference."""

from __future__ import annotations

import itertools

from kafka_s3_etl_spark.operators.dedup import (
    containment_join,
    containment_join_capped,
)


def _corpus() -> list[tuple[int, str]]:
    """60 container docs over a 40-token vocabulary plus a planted
    excerpt of each: the excerpt keeps ceil(0.9*n) tokens of its
    container, so containment(excerpt, container) = 1.0 by
    construction. Deterministic (index arithmetic, no RNG)."""
    vocab = [f"tok{i}" for i in range(40)]
    rows = []
    for i in range(60):
        n = 10 + i % 11
        toks = [vocab[(i * 7 + j * 3) % 40] for j in range(3 * n)]
        toks = list(dict.fromkeys(toks))  # distinct, order-stable
        rows.append((2 * i, " ".join(toks)))
        keep = len(toks) - 1  # drop one token -> containment ~0.9+
        rows.append((2 * i + 1, " ".join(toks[:keep])))
    return rows


def _brute_contained(rows: list[tuple[int, str]], t: float) -> dict:
    sets = {d: set(s.split()) for d, s in rows}
    best: dict[int, int] = {}
    for a, b in itertools.permutations(sets, 2):
        inter = len(sets[a] & sets[b])
        if 1000 * inter >= int(t * 1000) * len(sets[a]):
            cur = best.get(a)
            if cur is None or inter > cur:
                best[a] = inter
    return {a: best[a] for a in best}


def test_capped_containment_finds_planted_excerpts(spark):
    rows = _corpus()
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_a: r
        for r in containment_join_capped(docs, threshold=0.9, top_m=17)
        .collect()
    }
    expected = _brute_contained(rows, 0.9)
    # recall on the PLANTED excerpts is exact: every odd doc_id is a
    # strict subset of its even sibling, and siblings share the rare
    # prefix tokens
    planted = {d for d, _ in rows if d % 2 == 1}
    assert planted <= set(got)
    # every reported pair is EXACT: n_common and containment match the
    # brute-force set intersection for that exact (a, b) pair
    sets = {d: set(s.split()) for d, s in rows}
    for a, r in got.items():
        inter = len(sets[a] & sets[r.doc_b])
        assert r.n_common == inter
        assert r.n_a == len(sets[a]) and r.n_b == len(sets[r.doc_b])
        assert abs(r.containment - inter / len(sets[a])) < 1e-12
        assert 1000 * inter >= 900 * len(sets[a])
    # no fabricated contained docs: everything reported is truly contained
    assert set(got) <= set(expected)


def test_capped_matches_uncapped_when_fanout_is_small(spark):
    """With candidates per token below top_m, the cap is inactive and
    the capped operator must return the uncapped operator's exact pair
    set (it only ever REMOVES candidates)."""
    rows = _corpus()[:30]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = {
        (r.doc_a, r.doc_b, r.n_common)
        for r in containment_join_capped(docs, 0.9, top_m=1000).collect()
    }
    full = {
        (r.doc_a, r.doc_b, r.n_common)
        for r in containment_join(docs, 0.9).collect()
    }
    assert capped == full
