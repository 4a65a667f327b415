"""Perceptual-hash multimodal dedup (batch 40): planted near-dup
recall, exact precision vs a brute-force reference, and the frame
grouping's representative determinism. The oracle-parity suite already
hash-checks both registered entries against DuckDB; these tests cover
what SQL cannot — that the banding finds exactly the pairs a
brute-force Hamming scan finds (pigeonhole completeness for
Hamming <= 3), on payloads with REAL planted perturbations rather than
the generator's closed form."""

from __future__ import annotations

import itertools

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_s3_etl_spark.operators.dedup import band_hamming_pairs
from kafka_s3_etl_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _ahash_sig,
    _ppm_bytes,
    frame_ahash,
    image_ahash,
    parse_ppm,
)


def _ppm_from_raster(arr: np.ndarray) -> bytes:
    h, w, _ = arr.shape
    return f"P6\n{w} {h}\n255\n".encode() + arr.astype(np.uint8).tobytes()


def _planted_corpus() -> list[tuple[int, bytes]]:
    """40 base images + a perturbed near-copy of each: a seeded RNG
    flips a handful of pixel bytes, so copies land at small-but-nonzero
    Hamming distances from their base (and bases collide with each
    other occasionally — the brute-force reference counts those too)."""
    rng = np.random.default_rng(40)
    rows = []
    for i in range(40):
        base_id = 1000 + 2 * i
        _, _, arr = parse_ppm(_ppm_bytes(base_id))
        rows.append((base_id, _ppm_from_raster(arr)))
        noisy = arr.copy()
        n_flips = int(rng.integers(1, 6))
        ys = rng.integers(0, arr.shape[0], n_flips)
        xs = rng.integers(0, arr.shape[1], n_flips)
        cs = rng.integers(0, 3, n_flips)
        noisy[ys, xs, cs] = rng.integers(0, 256, n_flips)
        rows.append((base_id + 1, _ppm_from_raster(noisy)))
    return rows


def test_image_phash_banding_matches_bruteforce(spark):
    rows = _planted_corpus()
    media = spark.createDataFrame(
        [(d, "image", p) for d, p in rows], schema=MEDIA_SCHEMA
    )
    sigs = {d: _ahash_sig(parse_ppm(p)[2].astype(np.int64).sum(axis=2))
            for d, p in rows}
    expected = set()
    for (d1, s1), (d2, s2) in itertools.combinations(sorted(sigs.items()), 2):
        ham = sum(c1 != c2 for c1, c2 in zip(s1, s2))
        if ham <= 3:
            expected.add((d1, d2, ham))
    got = {
        (r.a_doc_id, r.b_doc_id, r.hamming)
        for r in band_hamming_pairs(image_ahash(media), ("doc_id",), 3).collect()
    }
    # Pigeonhole: 4 chunks over 64 bits give FULL recall at Hamming <= 3,
    # and the exact filter gives full precision — set equality, not just
    # containment.
    assert got == expected
    # the planted copies actually exercise the near-dup (not only
    # exact-dup) path
    assert any(h > 0 for _, _, h in expected)
    assert len(expected) >= 20


def test_image_phash_brightness_invariance(spark):
    """aHash compares each cell to the GLOBAL mean, so a uniform
    brightness shift that doesn't wrap leaves every bit unchanged —
    the classic perceptual-hash property, checked on real bytes."""
    _, _, arr = parse_ppm(_ppm_bytes(123 * 3))
    arr = np.clip(arr, 40, 215)  # leave headroom so +/-40 cannot wrap
    base = _ahash_sig(arr.astype(np.int64).sum(axis=2))
    for shift in (-40, 25, 40):
        shifted = (arr.astype(np.int64) + shift).astype(np.uint8)
        assert _ahash_sig(shifted.astype(np.int64).sum(axis=2)) == base


def test_frame_ahash_counts_and_keys(spark, sf_dir):
    from kafka_s3_etl_spark.operators.multimodal import documents_as_media
    from kafka_s3_etl_spark.sources.tables import load_table

    media = documents_as_media(load_table(spark, sf_dir, "documents")).filter(
        F.col("media_type") == "video"
    )
    sigs = frame_ahash(media)
    per_doc = {
        r.doc_id: r.n
        for r in sigs.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    # generator contract: 12 + doc_id % 19 frames per video
    for d, n in per_doc.items():
        assert n == 12 + d % 19
    # (doc_id, frame_idx) is a key
    assert sigs.count() == sigs.select("doc_id", "frame_idx").distinct().count()


def test_substring_spans_find_planted_passage(spark):
    """duplicate_substring_spans (batch 45): a 20-token passage planted
    into two otherwise-unique documents is reported as one merged span
    in each, covering exactly the passage (windows chain across the
    full repeat); unique docs report nothing; mask accounting is
    consistent (n_kept + n_masked == n_tokens)."""
    from kafka_s3_etl_spark.operators.dedup import (
        duplicate_substring_spans,
        mask_duplicate_substrings,
    )

    passage = [f"dup{i}" for i in range(20)]
    docs = []
    for d in range(6):
        uniq = [f"u{d}_{j}" for j in range(30)]
        toks = uniq[:10] + (passage if d < 2 else []) + uniq[10:]
        docs.append((d, " ".join(toks)))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans = {
        r.doc_id: (r.span_start, r.span_end)
        for r in duplicate_substring_spans(df, k=12).collect()
    }
    assert set(spans) == {0, 1}
    for d in (0, 1):
        assert spans[d] == (10, 30)  # exactly the planted passage
    masked = {r.doc_id: r for r in mask_duplicate_substrings(df, k=12).collect()}
    for d, text in docs:
        r = masked[d]
        assert r.n_tokens == len(text.split())
        assert r.n_masked == (20 if d < 2 else 0)
        if d < 2:
            assert "dup0" not in r.clean_text and "u%d_9" % d in r.clean_text
        else:
            assert r.clean_text == text


def test_band_hamming_pairs_composite_keys(spark):
    """band_hamming_pairs with a composite id (doc_id, frame_idx):
    ordering is the lexicographic struct comparison and results equal a
    brute-force Hamming scan — pins the generic-key contract no
    registered entry currently exercises directly (frames group by
    exact hash instead), so the API cannot rot silently."""
    import itertools

    rows = []
    sigs = {}
    base = "01" * 32
    for d in range(3):
        for f in range(4):
            s = list(base)
            for flip in range((d * 4 + f) % 5):
                s[flip * 7] = "1" if s[flip * 7] == "0" else "0"
            sig = "".join(s)
            rows.append((d, f, sig))
            sigs[(d, f)] = sig
    df = spark.createDataFrame(rows, "doc_id long, frame_idx int, sim string")
    got = {
        ((r.a_doc_id, r.a_frame_idx), (r.b_doc_id, r.b_frame_idx), r.hamming)
        for r in band_hamming_pairs(df, ("doc_id", "frame_idx"), 3).collect()
    }
    expected = set()
    for k1, k2 in itertools.combinations(sorted(sigs), 2):
        ham = sum(a != b for a, b in zip(sigs[k1], sigs[k2]))
        if ham <= 3:
            expected.add((k1, k2, ham))
    assert got == expected and expected


def test_audio_fingerprint_family_structure():
    """The r11 structured WAV generator plants a duplicate topology the
    energy-sign fingerprint must recover WITHOUT Spark: within a
    family, the five gain-scaled members (j 0..4) fingerprint
    bit-identically despite byte-different payloads, the two
    re-mastered variants (j 5..6) match each other and sit within the
    banding's Hamming <= 3 of the base, and the salted singleton
    (j 7) is far away."""
    from kafka_s3_etl_spark.operators.multimodal import (
        _audio_sig,
        _wav_bytes,
        _wav_samples,
        parse_wav,
    )

    def ham(a: str, b: str) -> int:
        return sum(x != y for x, y in zip(a, b))

    nonzero_shift = 0
    for u in (0, 3, 11):
        # doc_id for audio ordinal k is 3*k + 1
        fam = [3 * (u * 8 + j) + 1 for j in range(8)]
        sigs = [_audio_sig(parse_wav(_wav_bytes(d))[2]) for d in fam]
        payloads = {_wav_bytes(d) for d in fam}
        assert len(payloads) == 8  # every member's BYTES differ
        assert len(set(sigs[:5])) == 1  # gain twins: identical sig
        assert sigs[5] == sigs[6]  # re-mastered pair matches itself
        # ...and is banding-near (0 when the overridden slot's bit was
        # already set — still a duplicate, caught by identity edges)
        assert ham(sigs[0], sigs[5]) <= 3
        assert ham(sigs[0], sigs[7]) > 3  # singleton is not
        nonzero_shift += ham(sigs[0], sigs[5]) > 0
    # the Hamming-1..3 edge class the banding exists for is actually
    # exercised by the corpus, not vacuously satisfied at 0 everywhere
    assert nonzero_shift >= 1
    # gain invariance holds for arbitrary scaling, not just the planted
    # gains: scaling samples by any positive factor preserves the sig
    s = _wav_samples(1)
    assert _audio_sig(s) == _audio_sig((s.astype(np.int64) * 7).astype("<i8"))


def test_dedup_audio_hash_clusters_families(spark, sf_dir):
    """The registered q_dedup_audio_hash entry resolves every complete
    family's j 0..6 members (gain twins + re-mastered variants at
    Hamming <= 3) into ONE cluster whose keeper is the smallest
    doc_id, and emits exactly one row per audio document."""
    from kafka_s3_etl_spark.plans.registry import all_queries
    from kafka_s3_etl_spark.sources.tables import load_table

    rows = all_queries()["q_dedup_audio_hash"].fn(spark, sf_dir).collect()
    n_audio = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 1)
        .count()
    )
    assert len(rows) == n_audio
    cluster = {r.doc_id: r.cluster_id for r in rows}
    keep = {r.doc_id: r.keep for r in rows}
    max_k = max((d - 1) // 3 for d in cluster)
    checked = 0
    for u in range(max_k // 8):
        fam = [3 * (u * 8 + j) + 1 for j in range(7)]
        if not all(d in cluster for d in fam):
            continue
        labels = {cluster[d] for d in fam}
        assert len(labels) == 1, (u, labels)
        assert keep[min(fam)] or cluster[min(fam)] < min(fam)
        checked += 1
    assert checked >= 5  # the corpus actually contains whole families
    # keepers are exactly the cluster label owners
    for d, c in cluster.items():
        assert keep[d] == (d == c)
