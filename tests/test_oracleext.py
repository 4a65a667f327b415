"""Independent references for the batch-34 oracle-hardened twins
(plans/oracleext.py). The DuckDB oracle is one gate; these tests are
the SECOND, engine-independent reference: pure-Python integer
replicas on small deterministic inputs must match the Spark operators
EXACTLY (integer fixed-point arithmetic promises bit equality, so the
assertion is equality, not tolerance), plus ordering agreement with
the float production originals.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kafka_s3_etl_spark.operators.dedup import md5_minhash_near_dups
from kafka_s3_etl_spark.operators.graph import pagerank, pagerank_fixedpoint
from kafka_s3_etl_spark.plans.oracleext import markov_kstep

# A small fixed graph with a clear hub (node 1) and a pendant chain.
_PAIRS = [(1, 2), (1, 3), (1, 4), (2, 3), (4, 5), (5, 6), (7, 8)]


def _pagerank_fixedpoint_py(pairs, iters=6, init=10**9, num=85, den=100):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    teleport = (den - num) * init // den
    rank = {n: init for n in adj}
    for _ in range(iters):
        inflow = {n: 0 for n in adj}
        for v, outs in adj.items():
            c = rank[v] // len(outs)
            for u in outs:
                inflow[u] += c
        rank = {n: teleport + num * inflow[n] // den for n in adj}
    return rank


def test_pagerank_fixedpoint_matches_python_reference_exactly(spark):
    pairs = spark.createDataFrame(_PAIRS, "doc_a long, doc_b long")
    got = {
        r.doc_id: r.rank_fp
        for r in pagerank_fixedpoint(pairs, iters=6).collect()
    }
    assert got == _pagerank_fixedpoint_py(_PAIRS, iters=6)


def test_pagerank_fixedpoint_ordering_tracks_float_pagerank(spark):
    pairs = spark.createDataFrame(_PAIRS, "doc_a long, doc_b long")
    nodes = spark.createDataFrame(
        [(n,) for n in range(1, 9)], "doc_id long"
    )
    fp = {
        r.doc_id: r.rank_fp
        for r in pagerank_fixedpoint(pairs, iters=6).collect()
    }
    fl = {r.doc_id: r.rank for r in pagerank(pairs, nodes, iters=6).collect()}
    # Every CLEARLY-separated float pair (rel gap > 1%) must order the
    # same way in fixed point; the hub must win outright in both.
    ns = sorted(fp)
    for i, a in enumerate(ns):
        for b in ns[i + 1 :]:
            if abs(fl[a] - fl[b]) > 0.01 * max(fl[a], fl[b]):
                assert (fp[a] > fp[b]) == (fl[a] > fl[b]), (a, b, fp, fl)
    assert max(fp, key=fp.get) == max(
        (n for n in fl if n in fp), key=fl.get
    ) == 1


def _markov_kstep_py(rows, types, iters=12, init=10**9):
    # rows: (from_t, to_t, n); unit self-loop for dangling types.
    sources = {f for f, _, _ in rows}
    rows = list(rows) + [(t, t, 1) for t in types if t not in sources]
    tot: dict[str, int] = {}
    for f, _, n in rows:
        tot[f] = tot.get(f, 0) + n
    mass = {t: init for t in types}
    for _ in range(iters):
        nxt = {t: 0 for t in types}
        for f, to, n in rows:
            nxt[to] += mass[f] * n // tot[f]
        mass = nxt
    return mass


def test_markov_kstep_matches_python_reference_exactly(spark):
    # Tiny event log: user 1 walks a->b->a->c, user 2 walks b->b->c.
    events = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 00:00:00.000001", "a"),
            (2, 1, "2024-01-01 00:00:00.000002", "b"),
            (3, 1, "2024-01-01 00:00:00.000003", "a"),
            (4, 1, "2024-01-01 00:00:00.000004", "c"),
            (5, 2, "2024-01-01 00:00:01.000000", "b"),
            (6, 2, "2024-01-01 00:00:02.000000", "b"),
            (7, 2, "2024-01-01 00:00:03.000000", "c"),
            (8, 3, "2024-01-01 00:00:04.000000", "d"),  # isolated type
        ],
        "event_id long, user_id long, ts string, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        r.event_type: r.mass_fp for r in markov_kstep(events).collect()
    }
    rows = [
        ("a", "b", 1),
        ("b", "a", 1),
        ("a", "c", 1),
        ("b", "b", 1),
        ("b", "c", 1),
    ]
    assert got == _markov_kstep_py(rows, types=["a", "b", "c", "d"])


def _md5_minhash_py(text: str, k: int = 16, n: int = 3) -> list[str]:
    words = text.split(" ")
    grams = {
        " ".join(words[i : i + n]) for i in range(len(words) - n + 1)
    }
    sig = []
    for i in range(k):
        sig.append(
            min(
                hashlib.md5(
                    (hashlib.md5(g.encode()).hexdigest() + str(i)).encode()
                ).hexdigest()
                for g in grams
            )
        )
    return sig


def test_md5_minhash_pairs_identical_docs_and_python_parity(spark):
    # Two identical docs, one shared-prefix near-dup, one disjoint doc.
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = "the quick brown fox jumps over the lazy cat again and again"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),
            (3, near),
            (4, "completely different words with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in md5_minhash_near_dups(docs, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 4) not in pairs and (2, 4) not in pairs and (3, 4) not in pairs
    # The near-dup pair's estimate equals the pure-Python signature
    # agreement exactly (engine-exact md5 minhash).
    sig_base, sig_near = _md5_minhash_py(base), _md5_minhash_py(near)
    agree = sum(a == b for a, b in zip(sig_base, sig_near)) / 16
    if agree >= 0.5:
        assert pairs[(1, 3)] == agree
    else:
        assert (1, 3) not in pairs


def test_md5_simhash_identical_docs_pair_at_hamming_zero(spark):
    from kafka_s3_etl_spark.operators.dedup import md5_simhash_near_dups

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),
            (3, "totally unrelated content made of other tokens entirely"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in md5_simhash_near_dups(docs).collect()
    }
    assert pairs.get((1, 2)) == 0
    # the unrelated doc must not pair with either duplicate
    assert all(3 not in p for p in pairs)


def test_hash_sample_is_partitioning_invariant(spark, sf_dir):
    """The point of hash sampling: the kept set is a pure function of
    the key, so any repartitioning / subset re-run yields the same
    rows (rng-seeded sample() cannot promise this)."""
    from kafka_s3_etl_spark.plans.registry import all_queries

    q = all_queries()["q_sample_hash"]
    a = {r.doc_id for r in q.fn(spark, sf_dir).collect()}
    b = {
        r.doc_id
        for r in q.fn(spark, sf_dir).repartition(17, "lang").collect()
    }
    assert a == b and len(a) > 0


def _bpe_merges_py(texts, rounds=4):
    """Sequential reference for the word-level BPE merge loop:
    top adjacent pair (n DESC, x, y), x != y, fused everywhere
    left-to-right (non-overlap is guaranteed by x != y)."""
    seqs = [t.split(" ") for t in texts]
    out = []
    for _ in range(rounds):
        counts: dict[tuple[str, str], int] = {}
        for s in seqs:
            for a, b in zip(s, s[1:]):
                if a != b:
                    counts[(a, b)] = counts.get((a, b), 0) + 1
        (x, y), n = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        out.append((x, y, n))
        nxt = []
        for s in seqs:
            m, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == x and s[i + 1] == y:
                    m.append(x + " " + y)
                    i += 2
                else:
                    m.append(s[i])
                    i += 1
            nxt.append(m)
        seqs = nxt
    return out


def test_bpe_merges_matches_python_reference_exactly(spark):
    from kafka_s3_etl_spark.plans.oracleext import q_bpe_merges
    from kafka_s3_etl_spark.plans.registry import all_queries

    texts = [
        "the cat sat on the mat and the cat ran",
        "the cat sat on a hat while the cat sat still",
        "a dog sat on the mat and the dog sat down",
    ]
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    with tempfile.TemporaryDirectory() as d:
        pq.write_table(
            pa.table(
                {
                    "doc_id": list(range(len(texts))),
                    "text": texts,
                    "lang": ["en"] * len(texts),
                    "source": ["t"] * len(texts),
                    "n_chars": [len(t) for t in texts],
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        got = sorted(
            (r.round, r.x, r.y, r.n)
            for r in all_queries()["q_bpe_merges"].fn(spark, d).collect()
        )
    want = sorted(
        (i, x, y, n) for i, (x, y, n) in enumerate(_bpe_merges_py(texts))
    )
    assert got == want
