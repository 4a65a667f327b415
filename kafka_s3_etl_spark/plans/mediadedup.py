"""Round-10 batch 40: perceptual-hash dedup over the REAL decoded
multimodal rasters — the missing dedup operator for the image/video
columns (VERDICT r9 item 1).

The media generators are closed-form (pixel byte i of doc d =
(d + i) % 256, operators/multimodal.py), so the DuckDB oracles can
recompute every aHash bit from doc_id alone via exact integer
arithmetic — the q_multimodal_decode pattern extended from decode
statistics to the full dedup pipeline. Spark computes the same hash
from the ACTUAL bytes (PPM/Y4M parse -> numpy aHash inside
mapInPandas), so a hash match proves decode + hash + banding + pairing
end-to-end.

Scale shapes (the 100 TB story):

* images emit near-dup PAIRS through the shared banded-Hamming
  machinery (operators/dedup.py::band_hamming_pairs): candidates share
  one of four 16-bit chunks, an equi self-join — never all-pairs.
* video FRAMES deliberately do NOT emit pairs: tiny correlated rasters
  form huge hash cliques (37k exact-dup pairs from 3.5k frames at
  sf0.01 — quadratic in clique size, the q_dedup_embedding-pairs trap).
  The registered shape is the linear-output dedup deliverable: one row
  per distinct frame hash with its deterministic representative and
  multiplicity — exactly the "keep one copy per perceptual identity"
  reduction a frame-level feature extractor wants upstream.
* AUDIO rides the same machinery since r11: the r10 blocker was the
  GENERATOR (modular PCM ramps gave every document the same
  near-uniform energy envelope — ALL 1.39M audio pairs at sf0.1
  within Hamming 3, one corpus-wide clique, so no entry was
  registered). The r11 structured generator
  (operators/multimodal.py::_wav_samples: per-family pseudo-random
  segment amplitudes x per-variant gain, all integer) plants a real
  duplicate topology — gain-scaled copies share the energy-sign
  fingerprint bit-for-bit, "re-mastered" variants sit a couple of
  Hamming bits away, salted singletons ~30 bits away — and the
  measured distribution is healthy (sf0.1: 1667 audio docs -> 542
  distinct signatures, largest signature group 15, largest 16-bit
  band bucket 179 pre-collapse; recorded in SCALE.md). The registered
  shape is CLUSTERS (signature collapse -> band pairs on
  representatives -> star closure), never pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_s3_etl_spark.operators.dedup import band_hamming_pairs
from kafka_s3_etl_spark.operators.multimodal import (
    documents_as_media,
    frame_ahash,
    image_ahash,
)
from kafka_s3_etl_spark.plans.registry import register
from kafka_s3_etl_spark.sources.tables import load_table

# Shared oracle CTE: the integer-exact 8x8 average hash of every image
# document, recomputed from the generator's closed form. Cell of pixel
# (x, y) is the standard downsample grid (x*8 // w, y*8 // h); bit c is
# cell_sum * n_total > total_sum * n_cell (cross-multiplied cell mean >
# global mean — no division, engine-exact).
_IMAGE_SIGS_CTE = """
        m AS (
          SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
          FROM documents WHERE doc_id % 3 = 0
        ),
        px AS (
          SELECT doc_id, w, h, UNNEST(range(0, w * h * 3)) AS i FROM m
        ),
        g AS (
          SELECT doc_id,
                 ((((i // 3) // w) * 8 // h) * 8
                    + ((i // 3) % w) * 8 // w) AS cell,
                 (doc_id + i) % 256 AS v, w, h
          FROM px
        ),
        cells AS (
          SELECT doc_id, cell, SUM(v) AS cs, COUNT(*) / 3 AS cc,
                 MIN(w * h) AS tc
          FROM g GROUP BY doc_id, cell
        ),
        tot AS (
          SELECT doc_id, SUM(cs) AS ts FROM cells GROUP BY doc_id
        ),
        sigs AS MATERIALIZED (
          SELECT c.doc_id,
                 string_agg(CASE WHEN c.cs * c.tc > t.ts * c.cc
                            THEN '1' ELSE '0' END, '' ORDER BY c.cell) AS sim
          FROM cells c JOIN tot t USING (doc_id)
          GROUP BY c.doc_id
        )
"""

_CHUNKED_CTE = """
        chunked AS (
          SELECT doc_id, sim, 0 AS chunk_id, substr(sim, 1, 16) AS chunk FROM sigs
          UNION ALL
          SELECT doc_id, sim, 1, substr(sim, 17, 16) FROM sigs
          UNION ALL
          SELECT doc_id, sim, 2, substr(sim, 33, 16) FROM sigs
          UNION ALL
          SELECT doc_id, sim, 3, substr(sim, 49, 16) FROM sigs
        )
"""


@register(
    "q_dedup_image_phash",
    cost=2,
    category="dedup",
    doc=(
        "Perceptual-hash image near-dup detection over the REAL "
        "decoded PPM rasters: pure-numpy P6 parse (operators/"
        "multimodal.py::parse_ppm) -> integer-exact 8x8 average hash "
        "(_ahash_sig: bit = cell mean > global mean by cross "
        "multiplication) inside partition-preserving mapInPandas, "
        "then the shared 16-bit-band Hamming candidate machinery "
        "(band_hamming_pairs — pigeonhole-complete for Hamming <= 3, "
        "bit_count(xor) over conv'd bigint halves, never all-pairs). "
        "The oracle recomputes every hash bit from the generator's "
        "closed form (pixel byte i of doc d = (d + i) % 256) and "
        "replays the banding in SQL, so the driver hash gates decode "
        "+ hash + banding + pairing end-to-end. CAVEAT (the "
        "q_dedup_embedding-pairs class): PAIR output is quadratic in "
        "duplicate multiplicity by definition — the 30x twinned probe "
        "measured 8.8x because 30-copy cliques emit 435 pairs each; "
        "q_dedup_image_clusters (signature pre-pass, 1.4x at 30x) is "
        "the shape a production pipeline consumes. PAIRS-output rule "
        "(SCALE.md): this entry is an oracle gate, headline-excluded "
        "since r11."
    ),
    oracle=f"""
        WITH {_IMAGE_SIGS_CTE},
        {_CHUNKED_CTE}
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(hamming(a.sim, b.sim) AS INTEGER) AS hamming
        FROM chunked a JOIN chunked b
          ON b.chunk_id = a.chunk_id AND b.chunk = a.chunk
             AND b.doc_id > a.doc_id
        WHERE hamming(a.sim, b.sim) <= 3
    """,
)
def q_dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 0  # predicate below the payload generator
    )
    media = documents_as_media(docs)
    sigs = image_ahash(media.filter(F.col("media_type") == "image"))
    return band_hamming_pairs(sigs, ("doc_id",), max_hamming=3).select(
        F.col("a_doc_id").alias("doc_a"),
        F.col("b_doc_id").alias("doc_b"),
        "hamming",
    )


_FRAME_SIGS_CTE = """
        m AS (
          SELECT doc_id, 8 + doc_id % 5 AS w, 8 + doc_id % 3 AS h,
                 12 + doc_id % 19 AS f,
                 (8 + doc_id % 5) * (8 + doc_id % 3) * 3 AS per
          FROM documents WHERE doc_id % 3 = 2
        ),
        px AS (
          SELECT doc_id, w, h, per, UNNEST(range(0, f * per)) AS i FROM m
        ),
        g AS (
          SELECT doc_id, CAST(i // per AS INTEGER) AS frame_idx,
                 ((((i % per) % (w * h)) // w) * 8 // h) * 8
                   + (((i % per) % (w * h)) % w) * 8 // w AS cell,
                 (doc_id + i) % 256 AS v, w, h
          FROM px
        ),
        cells AS (
          SELECT doc_id, frame_idx, cell, SUM(v) AS cs,
                 COUNT(*) / 3 AS cc, MIN(w * h) AS tc
          FROM g GROUP BY doc_id, frame_idx, cell
        ),
        tot AS (
          SELECT doc_id, frame_idx, SUM(cs) AS ts
          FROM cells GROUP BY doc_id, frame_idx
        ),
        sigs AS MATERIALIZED (
          SELECT c.doc_id, c.frame_idx,
                 string_agg(CASE WHEN c.cs * c.tc > t.ts * c.cc
                            THEN '1' ELSE '0' END, '' ORDER BY c.cell) AS sim
          FROM cells c JOIN tot t USING (doc_id, frame_idx)
          GROUP BY c.doc_id, c.frame_idx
        )
"""


@register(
    "q_dedup_frame_phash",
    cost=2,
    category="dedup",
    doc=(
        "Frame-level perceptual dedup over the REAL decoded Y4M video "
        "streams: pure-numpy YUV4MPEG2 parse -> per-frame integer-"
        "exact aHash (operators/multimodal.py::frame_ahash) -> global "
        "exact-hash grouping with a deterministic representative "
        "(min (doc_id, frame_idx) struct) and multiplicity counts. "
        "Deliberately NOT a pair emission: tiny correlated rasters "
        "form large perceptual cliques (37k dup pairs from 3.5k "
        "frames at sf0.01) and pair output is quadratic in clique "
        "size; the linear-output keep-one-representative reduction is "
        "the shape a 100 TB video pipeline ships. The oracle "
        "recomputes every frame hash from the generator's closed form "
        "(planar C444: byte i -> frame i/per, pixel (i%per)%(w*h)) "
        "and replays the grouping."
    ),
    oracle=f"""
        WITH {_FRAME_SIGS_CTE}
        SELECT sim,
               CAST(MIN(doc_id * 1048576 + frame_idx) // 1048576
                 AS BIGINT) AS rep_doc,
               CAST(MIN(doc_id * 1048576 + frame_idx) % 1048576
                 AS INTEGER) AS rep_frame,
               CAST(COUNT(*) AS BIGINT) AS n_frames,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_videos
        FROM sigs GROUP BY sim
    """,
)
def q_dedup_frame_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 2  # predicate below the payload generator
    )
    media = documents_as_media(docs)
    sigs = frame_ahash(media.filter(F.col("media_type") == "video"))
    # rep as min over a PACKED bigint, not min(struct): an unordered
    # struct min forces SortAggregate (no codegen); the packed key
    # keeps the whole rollup in whole-stage HashAggregate. frame_idx
    # < 2^20 by generator contract (and any sane video), doc_id keeps
    # 43 bits of headroom.
    rep = F.min(F.shiftleft(F.col("doc_id"), 20) + F.col("frame_idx"))
    # shiftright, not float division: doc_id*2^20 exceeds double's 53
    # exact bits long before bigint overflows, and `/` goes through
    # double in Spark SQL.
    return sigs.groupBy("sim").agg(
        F.shiftright(rep, 20).alias("rep_doc"),
        (rep % 1048576).cast("int").alias("rep_frame"),
        F.count(F.lit(1)).alias("n_frames"),
        F.countDistinct("doc_id").alias("n_videos"),
    )


@register(
    "q_dedup_image_clusters",
    cost=2,
    category="dedup",
    doc=(
        "Image dedup resolved to CLUSTERS — the deliverable a pipeline "
        "consumes (the q_dedup_embedding_clusters lesson applied to "
        "media): aHash near-dup pairs (band_hamming_pairs, Hamming <= "
        "3) close under connected components (alternating-star "
        "contraction, O(log n) rounds regardless of graph diameter — "
        "brightness-shifted near-dup CHAINS give this graph diameter "
        "> 20 at the 10x probe, where plain min-label propagation "
        "times out) into (doc_id, cluster_id, keep); keep = the "
        "smallest member, the drop-list is everything else. The "
        "oracle recomputes every hash bit from the pixel generator's "
        "closed form, replays the banding, and closes the pairs with "
        "a recursive-CTE min-label closure. dHash (the gradient "
        "variant) was evaluated and deliberately NOT registered: on "
        "the smooth synthetic ramps adjacent-cell gradient bits "
        "correlate corpus-wide (measured: one 16-bit band bucket held "
        "76% of images, 13.4k of 13.9k possible candidate pairs at "
        "sf0.01 — the 8-bit-SimHash mega-bucket failure mode), so its "
        "banding does not prune; aHash's global-mean bits split the "
        "same corpus cleanly."
    ),
    oracle=f"""
        WITH RECURSIVE {_IMAGE_SIGS_CTE},
        {_CHUNKED_CTE},
        prs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM chunked a JOIN chunked b
            ON b.chunk_id = a.chunk_id AND b.chunk = a.chunk
               AND b.doc_id > a.doc_id
          WHERE hamming(a.sim, b.sim) <= 3
        ),
        sym AS (
          SELECT doc_a AS src, doc_b AS dst FROM prs
          UNION ALL
          SELECT doc_b AS src, doc_a AS dst FROM prs
        ),
        reach AS (
          SELECT doc_id AS node, doc_id AS lbl
          FROM documents WHERE doc_id % 3 = 0
          UNION
          SELECT s.dst AS node, r.lbl
          FROM reach r JOIN sym s ON r.node = s.src
          WHERE r.lbl < s.dst
        )
        SELECT node AS doc_id, MIN(lbl) AS cluster_id,
               node = MIN(lbl) AS keep
        FROM reach GROUP BY node
    """,
)
def q_dedup_image_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_s3_etl_spark.operators.dedup import connected_components_star

    docs = load_table(spark, sf_dir, "documents")
    # predicate below the payload generator (mapInPandas blocks pushdown)
    media = documents_as_media(docs.filter(F.col("doc_id") % 3 == 0))
    sigs = image_ahash(media.filter(F.col("media_type") == "image"))
    # Exact-dup pre-pass (the q_dedup_embedding_clusters discipline):
    # identical SIGNATURES have identical band buckets and Hamming 0,
    # so collapsing each signature group to its min-id representative
    # before the band self-join and re-attaching members via identity
    # edges preserves components EXACTLY, while a k-copy clique stops
    # contributing O(k^2) band pairs (30 exact twins per image on the
    # 30x probe corpus = 435 pairs per clique before this pass). The
    # oracle closes over the FULL pair set — components are equal by
    # construction, so the hash gate is unaffected.
    rep_w = Window.partitionBy("sim")
    with_rep = sigs.select(
        "doc_id", "sim", F.min("doc_id").over(rep_w).alias("rep")
    ).localCheckpoint()
    rep_sigs = with_rep.filter(F.col("doc_id") == F.col("rep")).select(
        "doc_id", "sim"
    )
    band_pairs = band_hamming_pairs(
        rep_sigs, ("doc_id",), max_hamming=3
    ).select(F.col("a_doc_id").alias("doc_a"), F.col("b_doc_id").alias("doc_b"))
    identity_edges = with_rep.filter(F.col("doc_id") != F.col("rep")).select(
        F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b")
    )
    pairs = band_pairs.unionByName(identity_edges)
    nodes = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    cc = connected_components_star(pairs, nodes)
    return cc.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
    )


# Shared oracle CTE: the integer-exact 64-segment energy-sign
# fingerprint of every audio document, recomputed from the r11
# structured generator's closed form (operators/multimodal.py::
# _wav_samples). Bit s is e_s * 64 > total_energy (cross-multiplied
# mean comparison — no division, engine-exact); the per-variant gain
# (16 + j) squares into every term and cancels, which is exactly why
# gain-twin family members j in 0..4 share the signature.
_AUDIO_ENERGY_CTE = """
        m AS (
          SELECT doc_id, (doc_id - 1) // 3 AS k
          FROM documents WHERE doc_id % 3 = 1
        ),
        par AS (
          SELECT doc_id, k, k // 8 AS u, k % 8 AS j,
                 4 + (k // 8) % 3 AS msz
          FROM m
        ),
        par2 AS (
          SELECT doc_id, k, u, j, msz,
                 CASE WHEN j = 7 THEN 1000003 + k ELSE u END AS base,
                 (u * 31) % 64 AS i0,
                 CASE WHEN (u * 31) % 64 + 7 < 64
                      THEN (u * 31) % 64 + 7
                      ELSE (u * 31) % 64 - 7 END AS i1
          FROM par
        ),
        samp AS (
          SELECT doc_id, u, j, msz, base, i0, i1,
                 UNNEST(range(0, 64 * msz)) AS i
          FROM par2
        ),
        sv AS (
          SELECT doc_id, i // msz AS seg,
                 (1 + ((base * 2654435761
                        + (CASE WHEN j BETWEEN 5 AND 6
                                     AND (i // msz) = i0 THEN i1
                                WHEN j BETWEEN 5 AND 6
                                     AND (i // msz) = i1 THEN i0
                                ELSE i // msz END) * 97) % 1009) % 13)
                 * (16 + j)
                 * (((i * 2654435761 + u) % 7) - 3) AS v
          FROM samp
        ),
        e AS (
          SELECT doc_id, seg, SUM(v * v) AS es
          FROM sv GROUP BY doc_id, seg
        ),
        te AS (SELECT doc_id, SUM(es) AS ts FROM e GROUP BY doc_id)
"""

_AUDIO_SIGS_CTE = (
    _AUDIO_ENERGY_CTE
    + """,
        sigs AS MATERIALIZED (
          SELECT e.doc_id,
                 string_agg(CASE WHEN e.es * 64 > t.ts
                            THEN '1' ELSE '0' END, '' ORDER BY e.seg) AS sim
          FROM e JOIN te t USING (doc_id)
          GROUP BY e.doc_id
        )
"""
)


@register(
    "q_dedup_audio_hash",
    cost=2,
    category="dedup",
    doc=(
        "Acoustic-fingerprint audio dedup resolved to CLUSTERS over "
        "the REAL decoded WAV samples: pure-numpy RIFF/PCM16 parse "
        "(operators/multimodal.py::parse_wav) -> integer-exact "
        "64-segment energy-sign fingerprint (_audio_sig: bit = "
        "segment energy over per-segment mean by cross "
        "multiplication, int64 sums of squared int16 samples — any "
        "uniform gain cancels, so volume-normalized copies "
        "fingerprint identically) inside partition-preserving "
        "mapInPandas, then the media-dedup discipline end-to-end: "
        "identical-signature collapse to min-id representatives, "
        "banded-Hamming candidate pairs on representatives only "
        "(band_hamming_pairs, 16-bit chunks, Hamming <= 3), "
        "identity-edge re-attachment, alternating-star connected "
        "components, (doc_id, cluster_id, keep) out — linear output, "
        "never pairs. The r10 energy-envelope hash was measured "
        "degenerate on the ramp generator and NOT registered; the "
        "r11 structured generator plants a real duplicate topology "
        "(gain twins Hamming 0, re-mastered variants Hamming ~1, "
        "salted singletons ~30; measured sf0.1: 542 distinct sigs "
        "over 1667 docs, largest band bucket 179 pre-collapse — "
        "SCALE.md) and the oracle recomputes every bit from doc_id "
        "alone, replays the banding, and closes with a recursive-CTE "
        "min-label closure, so the driver hash gates decode + "
        "fingerprint + banding + closure end-to-end."
    ),
    oracle=f"""
        WITH RECURSIVE {_AUDIO_SIGS_CTE},
        {_CHUNKED_CTE},
        prs AS (
          SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM chunked a JOIN chunked b
            ON b.chunk_id = a.chunk_id AND b.chunk = a.chunk
               AND b.doc_id > a.doc_id
          WHERE hamming(a.sim, b.sim) <= 3
        ),
        sym AS (
          SELECT doc_a AS src, doc_b AS dst FROM prs
          UNION ALL
          SELECT doc_b AS src, doc_a AS dst FROM prs
        ),
        reach AS (
          SELECT doc_id AS node, doc_id AS lbl
          FROM documents WHERE doc_id % 3 = 1
          UNION
          SELECT s.dst AS node, r.lbl
          FROM reach r JOIN sym s ON r.node = s.src
          WHERE r.lbl < s.dst
        )
        SELECT node AS doc_id, MIN(lbl) AS cluster_id,
               node = MIN(lbl) AS keep
        FROM reach GROUP BY node
    """,
)
def q_dedup_audio_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_s3_etl_spark.operators.dedup import connected_components_star
    from kafka_s3_etl_spark.operators.multimodal import audio_fingerprint

    docs = load_table(spark, sf_dir, "documents")
    # predicate below the payload generator (mapInPandas blocks pushdown)
    media = documents_as_media(docs.filter(F.col("doc_id") % 3 == 1))
    sigs = audio_fingerprint(media.filter(F.col("media_type") == "audio"))
    # Identical-signature collapse (the q_dedup_image_clusters
    # discipline): gain-twin families are Hamming-0 cliques BY
    # GENERATOR DESIGN, so collapsing each signature group to its
    # min-id representative before the band self-join removes the
    # O(k^2) intra-clique band pairs while identity edges keep the
    # components exactly equal to the oracle's full-pair closure.
    rep_w = Window.partitionBy("sim")
    with_rep = sigs.select(
        "doc_id", "sim", F.min("doc_id").over(rep_w).alias("rep")
    ).localCheckpoint()
    rep_sigs = with_rep.filter(F.col("doc_id") == F.col("rep")).select(
        "doc_id", "sim"
    )
    band_pairs = band_hamming_pairs(
        rep_sigs, ("doc_id",), max_hamming=3
    ).select(F.col("a_doc_id").alias("doc_a"), F.col("b_doc_id").alias("doc_b"))
    identity_edges = with_rep.filter(F.col("doc_id") != F.col("rep")).select(
        F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b")
    )
    pairs = band_pairs.unionByName(identity_edges)
    nodes = docs.filter(F.col("doc_id") % 3 == 1).select("doc_id")
    cc = connected_components_star(pairs, nodes)
    return cc.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
    )


# ---------------------------------------------------- round 11, batch 63


@register(
    "q_audio_band_energies",
    cost=1,
    category="multimodal",
    doc=(
        "Band-energy audio features over the REAL decoded WAV samples "
        "— the dense-feature sibling of q_dedup_audio_hash's sign "
        "fingerprint (same parse_wav seam inside partition-preserving "
        "mapInPandas): the sample vector splits into 8 equal time "
        "bands, each band's energy is the exact int64 sum of squared "
        "int16 samples, and the only float is the single share-of-"
        "total division, computed JVM-side with the identical IEEE op "
        "in both engines. The oracle recomputes every energy from the "
        "generator's integer closed form. This is the shape an audio "
        "quality filter / loudness normalizer consumes upstream of "
        "training; 8 rows per doc, map-only plus nothing — no "
        "shuffle beyond the rollup-free emission."
    ),
    oracle=f"""
        WITH {_AUDIO_ENERGY_CTE},
        bands AS (
          SELECT doc_id, CAST(seg // 8 AS INTEGER) AS band,
                 CAST(SUM(es) AS BIGINT) AS energy
          FROM e GROUP BY doc_id, seg // 8
        )
        SELECT b.doc_id, b.band, b.energy,
               CAST(t.ts AS BIGINT) AS total_energy,
               CAST(b.energy AS DOUBLE) / CAST(t.ts AS DOUBLE) AS share
        FROM bands b JOIN te t USING (doc_id)
    """,
)
def q_audio_band_energies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kafka_s3_etl_spark.operators.multimodal import audio_band_energies

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 3 == 1  # predicate below the payload generator
    )
    media = documents_as_media(docs)
    feats = audio_band_energies(
        media.filter(F.col("media_type") == "audio")
    )
    return feats.select(
        "doc_id",
        "band",
        "energy",
        "total_energy",
        F.expr(
            "CAST(energy AS DOUBLE) / CAST(total_energy AS DOUBLE)"
        ).alias("share"),
    )
