"""Multimodal column plumbing (SURVEY.md 2b / north-star LLM ops).

Images/audio/video are opaque ``binary`` columns plus typed metadata —
the layout a 100 TB multimodal training corpus uses in parquet. The
Spark side is real and tested end-to-end: schemas, binary payload
handling, mapInPandas batch iteration, Arrow transfer,
partition-preserving metadata extraction. Codec status:

* **image (PPM/P6) — REAL.** ``documents_as_media`` synthesizes actual
  P6 image files (header + raw RGB plane) and ``parse_ppm`` /
  ``decode_pixels`` decode them with a pure-numpy codec: header
  tokenizer (whitespace/comment tolerant per the netpbm spec) +
  ``np.frombuffer`` reshape to (h, w, 3). Uncompressed formats need no
  external library, so this path exercises genuine bytes-in /
  pixels-out decoding through the exact mapInPandas plumbing a
  PIL/libvips decoder would use.
* **audio (WAV/PCM16) — REAL.** audio rows carry actual RIFF/WAVE
  files (fmt + data chunks, int16-LE samples); ``parse_wav`` walks the
  chunk list and ``decode_samples`` reduces the sample array to
  decode-proving statistics. Audio metadata maps as width=sample_rate,
  height=n_channels, n_frames=n_samples.
* **video (Y4M/YUV4MPEG2, C444 uncompressed) — REAL since r9.** video
  rows carry actual Y4M streams (parameter header + FRAME-delimited
  planar 4:4:4 rasters — the ffmpeg interchange format for raw video);
  ``parse_y4m`` parses the header and splits frames, ``decode_frames``
  reduces them to decode-proving statistics, and ``frame_sample`` fans
  out REAL frame counts.
* compressed image/audio/video — STUB: those codecs (PIL, soundfile,
  pyav) aren't in this container. ``decode_metadata`` falls back to a
  deterministic fake (``_fake_decode``) for unknown payloads, and the
  full decoders raise NotImplementedError naming the seam.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
    ]
)


def _ppm_bytes(doc_id: int) -> bytes:
    """Deterministic REAL P6 PPM file for a document: width/height from
    the doc id, pixel byte i = (doc_id + i) % 256 — a closed form both
    the decoder test and the DuckDB oracle can recompute independently."""
    w = 8 + doc_id % 9
    h = 8 + doc_id % 7
    n = w * h * 3
    px = ((np.arange(n, dtype=np.int64) + doc_id) % 256).astype(np.uint8)
    return f"P6\n{w} {h}\n255\n".encode() + px.tobytes()


WAV_RATE = 8000

# Audio corpus structure (r11): the r1-r10 generator was a modular ramp
# (sample i = ((d + i) % 65536) - 32768) whose 64-segment energy
# envelope is near-uniform for EVERY document — the obvious audio
# fingerprint thresholded to one corpus-wide signature (measured r10:
# all 1.39M audio pairs within Hamming 3), so audio dedup could not be
# registered at all. The r11 closed form keeps every sample an exact
# integer (so DuckDB recomputes each one from doc_id alone) but gives
# each document spectral-envelope STRUCTURE plus a planted duplicate
# topology:
#
#   audio ordinal k = (doc_id - 1) // 3, family u = k // 8, j = k % 8
#   segment width m = 4 + u % 3  (n = 64 * m samples, 64 segments)
#   amp(base, seg) = 1 + ((base*2654435761 + seg*97) % 1009) % 13
#   phase p(i)     = ((i*2654435761 + u) % 7) - 3
#   sample i       = amp(BASE, i // m) * (16 + j) * p(i)      [int16]
#   BASE = u for j <= 6 (members j in 5..6 additionally SWAP the
#   amplitudes of segments i0 = (u*31) % 64 and i1 = i0 +- 7 — an
#   "edited" variant), and 1000003 + k for j = 7 (an unrelated
#   singleton).
#
# The per-segment energy amp^2 * (16+j)^2 * sum(p^2) divided by the
# total is INDEPENDENT of the gain term (16+j), so the five j in 0..4
# members of a family share their energy-sign fingerprint bit-for-bit
# while their payload BYTES all differ — exactly the near-duplicate
# structure a fingerprint must recover, with no float anywhere. The
# edited variant's swap partners sit exactly 7 segments apart because
# the phase pattern has period 7 in i (2654435761 % 7 = 5, gcd(5,7)=1
# ... the windows [s*m, s*m + m) and [(s+7)*m, (s+7)*m + m) see the
# SAME p values since 7*m = 0 mod 7), so the two segments have equal
# phase weight sum(p^2), the swap preserves both segment-pair and
# total energy, and the variant's fingerprint differs from the base in
# AT MOST the two swapped bits — a guaranteed Hamming <= 2 planted
# near-duplicate (a naive single-slot amplitude override shifts the
# global mean and flips an unbounded bit set; measured ham 0..5+).
AUDIO_SEGS = 64
_AUDIO_FAMILY = 8


def _audio_params(doc_id: int) -> tuple[int, int, int, int, int]:
    """(k, u, j, m, gain) for an audio document — the integer closed
    form mirrored by every audio DuckDB oracle."""
    k = (doc_id - 1) // 3
    u = k // _AUDIO_FAMILY
    j = k % _AUDIO_FAMILY
    m = 4 + u % 3
    return k, u, j, m, 16 + j


def _wav_samples(doc_id: int) -> np.ndarray:
    """The exact int16 sample vector of an audio document (see the
    closed-form comment above)."""
    k, u, j, m, gain = _audio_params(doc_id)
    idx = np.arange(AUDIO_SEGS * m, dtype=np.int64)
    seg = idx // m
    base = 1000003 + k if j == _AUDIO_FAMILY - 1 else u
    aseg = seg
    if 5 <= j <= 6:
        i0 = (u * 31) % AUDIO_SEGS
        i1 = i0 + 7 if i0 + 7 < AUDIO_SEGS else i0 - 7
        aseg = np.where(seg == i0, i1, np.where(seg == i1, i0, seg))
    amp = 1 + ((base * 2654435761 + aseg * 97) % 1009) % 13
    p = ((idx * 2654435761 + u) % 7) - 3
    return (amp * gain * p).astype("<i2")


def _wav_bytes(doc_id: int) -> bytes:
    """Deterministic REAL WAV (RIFF/PCM16 mono) file for a document:
    samples from the integer closed form in ``_wav_samples`` — exactly
    recomputable by the decoder tests and the DuckDB oracles."""
    import struct

    samples = _wav_samples(doc_id)
    n = len(samples)
    fmt = struct.pack("<HHIIHH", 1, 1, WAV_RATE, WAV_RATE * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + 2 * n)
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", 2 * n)
        + samples.tobytes()
    )


def _y4m_bytes(doc_id: int) -> bytes:
    """Deterministic REAL Y4M (YUV4MPEG2) stream for a document:
    w/h/frame-count from the doc id, raster byte i (concatenated across
    frames, FRAME markers excluded) = (doc_id + i) % 256 — a closed
    form the decoder test and the DuckDB oracle recompute
    independently. C444 (planar 4:4:4): each frame is 3 full-resolution
    planes, w*h*3 bytes."""
    w = 8 + doc_id % 5
    h = 8 + doc_id % 3
    frames = 12 + doc_id % 19
    n = frames * w * h * 3
    raster = ((np.arange(n, dtype=np.int64) + doc_id) % 256).astype(np.uint8)
    out = [f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C444\n".encode()]
    per = w * h * 3
    for f in range(frames):
        out.append(b"FRAME\n")
        out.append(raster[f * per : (f + 1) * per].tobytes())
    return b"".join(out)


def parse_y4m(b: bytes) -> tuple[int, int, np.ndarray]:
    """Real YUV4MPEG2 decoder (pure numpy): parses the parameter header
    (W/H/C tags), splits the FRAME-delimited stream, and returns
    (width, height, frames) with frames an (n, h, w, 3) uint8 array
    (C444 planar Y/Cb/Cr transposed to interleaved). Subsampled or
    compressed colorspaces raise — that seam needs pyav/ffmpeg."""
    nl = b.find(b"\n")
    if not b.startswith(b"YUV4MPEG2") or nl < 0:
        raise NotImplementedError("not a YUV4MPEG2 payload")
    w = h = None
    colorspace = "C420jpeg"  # the spec default when no C tag is present
    for tag in b[:nl].decode("ascii").split()[1:]:
        if tag[0] == "W":
            w = int(tag[1:])
        elif tag[0] == "H":
            h = int(tag[1:])
        elif tag[0] == "C":
            colorspace = tag
    if w is None or h is None:
        raise NotImplementedError("Y4M header missing W/H parameters")
    if colorspace != "C444":
        raise NotImplementedError(
            "only uncompressed C444 decodes without codec libraries; "
            "subsampled/compressed video needs pyav/ffmpeg"
        )
    per = w * h * 3
    frames = []
    pos = nl + 1
    while pos < len(b):
        if b[pos : pos + 5] != b"FRAME":
            raise NotImplementedError("malformed Y4M: missing FRAME marker")
        fnl = b.find(b"\n", pos)  # FRAME lines may carry parameters
        raster = np.frombuffer(b, np.uint8, count=per, offset=fnl + 1)
        # planar Y, Cb, Cr (each h*w) -> (h, w, 3)
        frames.append(np.moveaxis(raster.reshape(3, h, w), 0, -1))
        pos = fnl + 1 + per
    return w, h, np.stack(frames) if frames else np.empty((0, h, w, 3), np.uint8)


def parse_wav(b: bytes) -> tuple[int, int, np.ndarray]:
    """Real RIFF/WAVE decoder (pure numpy): walks the chunk list, reads
    the fmt chunk, returns (sample_rate, n_channels, int16 samples).
    Non-PCM / non-16-bit encodings raise — that seam needs soundfile."""
    import struct

    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    pos, rate, channels, bits, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid, size = b[pos : pos + 4], struct.unpack("<I", b[pos + 4 : pos + 8])[0]
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError(
                    "only uncompressed PCM16 decodes without codec "
                    "libraries; compressed audio needs soundfile/ffmpeg"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    if rate is None or data is None:
        raise NotImplementedError("WAV missing fmt or data chunk")
    return rate, channels, np.frombuffer(data, dtype="<i2")


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Stand-in multimodal corpus over the documents table: image rows
    carry REAL PPM(P6) files (``_ppm_bytes``), audio rows carry REAL
    WAV/PCM16 files (``_wav_bytes``), video rows carry REAL Y4M/C444
    streams (``_y4m_bytes``)."""
    base = documents.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        "text",
    )

    def payload(doc_id: int, media_type: str, text: str) -> bytes:
        if media_type == "image":
            return _ppm_bytes(doc_id)
        if media_type == "audio":
            return _wav_bytes(doc_id)
        return _y4m_bytes(doc_id)

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": [
                        payload(int(d), mt, t)
                        for d, mt, t in zip(
                            pdf["doc_id"], pdf["media_type"], pdf["text"]
                        )
                    ],
                }
            )

    return base.mapInPandas(build, schema=MEDIA_SCHEMA)


def parse_ppm(b: bytes) -> tuple[int, int, np.ndarray]:
    """Real netpbm P6 decoder (pure numpy): tolerant header tokenizer
    (any whitespace between tokens, ``#`` comments skipped), then the
    raw RGB plane as a (height, width, 3) uint8 array."""
    if b[:2] != b"P6":
        raise NotImplementedError(
            "only P6 PPM decodes without codec libraries; compressed "
            "formats need PIL/libvips plugged into this same seam"
        )
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        vals.append(int(b[start:pos]))
    pos += 1  # exactly one whitespace byte separates maxval from raster
    w, h, maxval = vals
    if maxval > 255:
        raise NotImplementedError("16-bit PPM rasters not supported")
    return w, h, np.frombuffer(b, np.uint8, count=w * h * 3, offset=pos).reshape(
        h, w, 3
    )


def _fake_decode(media_type: str, payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake codec: metadata derived from payload size.

    STUB — a real deployment replaces this one function with PIL /
    soundfile / pyav; every Spark-side line stays identical.
    """
    n = len(payload)
    width = 64 + (n % 129)
    height = 64 + (n % 97)
    n_frames = 1 if media_type == "image" else 1 + (n % 30)
    return width, height, n_frames


def decode_metadata(media: DataFrame) -> DataFrame:
    """Extract typed metadata from payload bytes via mapInPandas.

    Partition-preserving (no shuffle): each Arrow batch is decoded
    in-place, the pattern for feature extraction over a 100 TB corpus.
    PPM(P6), WAV, and Y4M payloads are decoded for REAL (header/chunk/
    frame parse; audio maps as width=sample_rate, height=n_channels,
    n_frames=n_samples); unknown formats fall back to the
    deterministic fake codec.
    """

    def _meta(mt: str, b: bytes) -> tuple[int, int, int]:
        if b[:2] == b"P6":
            w, h, _ = parse_ppm(b)
            return w, h, 1
        if b[:4] == b"RIFF":
            rate, channels, samples = parse_wav(b)
            return rate, channels, len(samples)
        if b[:9] == b"YUV4MPEG2":
            w, h, frames = parse_y4m(b)
            return w, h, len(frames)
        return _fake_decode(mt, b)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                _meta(mt, bytes(pl))
                for mt, pl in zip(pdf["media_type"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "n_frames": [m[2] for m in meta],
                }
            )

    return media.mapInPandas(decode, schema=META_SCHEMA)


PIXELS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_px", T.IntegerType(), False),
        T.StructField("pixel_sum", T.LongType(), False),
    ]
)


def decode_pixels(media: DataFrame) -> DataFrame:
    """Full pixel decode — REAL for PPM(P6) payloads: ``parse_ppm``
    yields the (h, w, 3) uint8 array per image and this operator reduces
    it to decode-proving statistics (dimensions, raster size, exact
    pixel sum). Compressed formats raise NotImplementedError inside the
    task (the seam where PIL/pyav plug into this same signature)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, ns, sums = [], [], [], []
            for pl in pdf["payload"]:
                w, h, arr = parse_ppm(bytes(pl))
                ws.append(w)
                hs.append(h)
                ns.append(arr.size)
                sums.append(int(arr.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": ws,
                    "height": hs,
                    "n_px": ns,
                    "pixel_sum": sums,
                }
            )

    return media.mapInPandas(decode, schema=PIXELS_SCHEMA)


SAMPLES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("sample_sum", T.LongType(), False),
        T.StructField("peak", T.IntegerType(), False),
    ]
)


def decode_samples(media: DataFrame) -> DataFrame:
    """Full audio decode — REAL for WAV/PCM16 payloads: ``parse_wav``
    yields the int16 sample array per document and this operator reduces
    it to decode-proving statistics (rate, count, exact sum, peak
    amplitude). Compressed formats raise inside the task (the
    soundfile/ffmpeg seam, same mapInPandas signature)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, ns, sums, peaks = [], [], [], []
            for pl in pdf["payload"]:
                rate, _, samples = parse_wav(bytes(pl))
                rates.append(rate)
                ns.append(len(samples))
                s64 = samples.astype(np.int64)
                sums.append(int(s64.sum()))
                peaks.append(int(np.abs(s64).max()) if len(s64) else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sample_rate": rates,
                    "n_samples": ns,
                    "sample_sum": sums,
                    "peak": peaks,
                }
            )

    return media.mapInPandas(decode, schema=SAMPLES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def resize_media(
    media: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Resize plumbing via mapInPandas: partition-preserving, Arrow-
    batched, binary-in/binary-out — the exact shape a PIL/pyav resize
    plugs into. STUB codec: the "resized" payload is a deterministic
    byte slice/pad to the target pixel budget (w*h bytes), so batch
    shapes, schema, and size accounting are real and testable without
    image libraries.
    """
    budget = target_w * target_h

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for pl in pdf["payload"]:
                b = bytes(pl)
                # STUB — replace with Image.open(...).resize(...).tobytes()
                out.append((b * (budget // max(len(b), 1) + 1))[:budget])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": target_w,
                    "height": target_h,
                    "payload": out,
                }
            )

    return media.mapInPandas(resize, schema=RESIZED_SCHEMA)


def frame_sample(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame sampling over REAL decoded frame counts (Y4M parse in
    decode_metadata): every-nth frame index per video document — the
    fan-out a frame-level feature extractor consumes."""
    meta = decode_metadata(media)
    return meta.filter(F.col("media_type") == "video").select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
        ).alias("frame_idx"),
    )


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_frames", T.IntegerType(), False),
        T.StructField("n_px", T.IntegerType(), False),
        T.StructField("byte_sum", T.LongType(), False),
    ]
)


def decode_frames(media: DataFrame) -> DataFrame:
    """Full video decode — REAL for Y4M/C444 payloads: ``parse_y4m``
    yields the (n_frames, h, w, 3) uint8 array per document and this
    operator reduces it to decode-proving statistics (dimensions,
    frame count, raster size, exact byte sum). Compressed video raises
    inside the task (the pyav/ffmpeg seam, same mapInPandas
    signature)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, nf, npx, sums = [], [], [], [], []
            for pl in pdf["payload"]:
                w, h, frames = parse_y4m(bytes(pl))
                ws.append(w)
                hs.append(h)
                nf.append(len(frames))
                npx.append(frames.size)
                sums.append(int(frames.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": ws,
                    "height": hs,
                    "n_frames": nf,
                    "n_px": npx,
                    "byte_sum": sums,
                }
            )

    return media.mapInPandas(decode, schema=FRAMES_SCHEMA)


AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("sim", T.StringType(), False),
    ]
)

FRAME_AHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("sim", T.StringType(), False),
    ]
)


def _ahash_sig(gray: np.ndarray) -> str:
    """Integer-exact 8x8 average hash of a grayscale raster.

    gray is (h, w) int64 (per-pixel r+g+b sum — no division, so the
    value stays exact). Cells are the standard downsample grid
    cell_x = x*8 // w (every cell non-empty for w, h >= 8); bit c is 1
    iff the cell mean exceeds the global mean, compared by exact cross
    multiplication (cell_sum * n_total > total_sum * n_cell) so ANSI
    SQL recomputes the identical bit. Returned as the 64-char '0'/'1'
    string the banded-Hamming machinery (operators/dedup.py::
    band_hamming_pairs) and the DuckDB oracles share."""
    h, w = gray.shape
    cx = (np.arange(w) * 8) // w
    cy = (np.arange(h) * 8) // h
    cell = (cy[:, None] * 8 + cx[None, :]).ravel()
    sums = np.bincount(cell, weights=gray.ravel(), minlength=64).astype(
        np.int64
    )
    cnts = np.bincount(cell, minlength=64).astype(np.int64)
    total_sum = int(gray.sum())
    total_cnt = w * h
    bits = sums * total_cnt > total_sum * cnts
    return "".join("1" if b else "0" for b in bits)


def image_ahash(media: DataFrame) -> DataFrame:
    """Perceptual hash (average hash) per image document over the REAL
    decoded PPM rasters — partition-preserving mapInPandas, the exact
    seam a PIL-decoded corpus would use. Returns (doc_id, sim) with
    sim the 64-char '0'/'1' aHash signature."""

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = []
            for pl in pdf["payload"]:
                _, _, arr = parse_ppm(bytes(pl))
                sigs.append(_ahash_sig(arr.astype(np.int64).sum(axis=2)))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sim": sigs})

    return media.mapInPandas(hash_batch, schema=AHASH_SCHEMA)


def frame_ahash(media: DataFrame) -> DataFrame:
    """Perceptual hash per VIDEO FRAME over the REAL decoded Y4M
    streams: one (doc_id, frame_idx, sim) row per frame, the fan-out a
    frame-level dedup/feature pipeline consumes. Same integer-exact
    aHash as image_ahash, same banded-Hamming downstream machinery."""

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sigs = [], [], []
            for d, pl in zip(pdf["doc_id"], pdf["payload"]):
                _, _, frames = parse_y4m(bytes(pl))
                for f, arr in enumerate(frames):
                    ids.append(int(d))
                    idxs.append(f)
                    sigs.append(_ahash_sig(arr.astype(np.int64).sum(axis=2)))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "sim": sigs})

    return media.mapInPandas(hash_batch, schema=FRAME_AHASH_SCHEMA)


def _audio_sig(samples: np.ndarray, n_segs: int = AUDIO_SEGS) -> str:
    """Integer-exact energy-sign fingerprint of a PCM sample vector:
    the vector is cut into ``n_segs`` equal segments (sample count must
    divide evenly — the generator guarantees n = 64*m), bit s is 1 iff
    segment s's energy exceeds the per-segment mean, compared by exact
    cross multiplication (e_s * n_segs > total_energy) so ANSI SQL
    recomputes the identical bit. Energies are int64 sums of squared
    int16 samples — exact, no float. Any uniform GAIN applied to the
    whole signal cancels out of the comparison, so re-mastered /
    volume-normalized copies fingerprint identically; the 64-char
    '0'/'1' output rides the shared banded-Hamming machinery
    (operators/dedup.py::band_hamming_pairs) like the image/frame
    aHashes."""
    s64 = samples.astype(np.int64)
    m = s64.size // n_segs
    e = (s64[: m * n_segs] ** 2).reshape(n_segs, m).sum(axis=1)
    total = int(e.sum())
    bits = e * n_segs > total
    return "".join("1" if b else "0" for b in bits)


def audio_fingerprint(media: DataFrame) -> DataFrame:
    """Acoustic fingerprint per audio document over the REAL decoded
    WAV samples — partition-preserving mapInPandas, the seam a
    soundfile/ffmpeg-decoded corpus would use. Returns (doc_id, sim)
    with sim the 64-char energy-sign signature of ``_audio_sig``."""

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = []
            for pl in pdf["payload"]:
                _, _, samples = parse_wav(bytes(pl))
                sigs.append(_audio_sig(samples))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sim": sigs})

    return media.mapInPandas(hash_batch, schema=AHASH_SCHEMA)


BAND_ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("band", T.IntegerType(), False),
        T.StructField("energy", T.LongType(), False),
        T.StructField("total_energy", T.LongType(), False),
    ]
)


def audio_band_energies(media: DataFrame, n_bands: int = 8) -> DataFrame:
    """Band-energy profile per audio document over the REAL decoded WAV
    samples — the feature-extraction sibling of ``audio_fingerprint``
    (same decode seam, dense features instead of sign bits): the sample
    vector is cut into ``n_bands`` equal time bands and each band's
    energy is the exact int64 sum of squared int16 samples. Emits one
    (doc_id, band, energy, total_energy) row per band — the shape a
    downstream audio-quality filter or loudness normalizer consumes;
    any float (share-of-total) stays a single downstream division."""

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bands, es, tots = [], [], [], []
            for d, pl in zip(pdf["doc_id"], pdf["payload"]):
                _, _, samples = parse_wav(bytes(pl))
                s64 = samples.astype(np.int64)
                m = s64.size // n_bands
                e = (s64[: m * n_bands] ** 2).reshape(n_bands, m).sum(axis=1)
                tot = int(e.sum())
                for b in range(n_bands):
                    ids.append(int(d))
                    bands.append(b)
                    es.append(int(e[b]))
                    tots.append(tot)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "band": bands,
                    "energy": es,
                    "total_energy": tots,
                }
            )

    return media.mapInPandas(feat, schema=BAND_ENERGY_SCHEMA)


CHANNEL_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("channel", T.IntegerType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("byte_min", T.IntegerType()),
        T.StructField("byte_max", T.IntegerType()),
    ]
)


def channel_stats(media: DataFrame) -> DataFrame:
    """Per-channel pixel statistics from a REAL decode — the
    white-balance / dead-channel QA a vision-data pipeline runs before
    training: ``parse_ppm`` yields the (h, w, 3) array, this reduces
    each RGB plane to exact integer stats (3 rows per image). Numpy
    vectorized inside mapInPandas (Arrow batches); same seam contract
    as ``decode_pixels`` for compressed formats."""

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [], "channel": [], "n": [],
                "byte_sum": [], "byte_min": [], "byte_max": [],
            }
            for doc_id, pl in zip(pdf["doc_id"], pdf["payload"]):
                _, _, arr = parse_ppm(bytes(pl))
                planes = arr.reshape(-1, 3).astype(np.int64)
                for c in range(3):
                    p = planes[:, c]
                    rows["doc_id"].append(doc_id)
                    rows["channel"].append(c)
                    rows["n"].append(int(p.size))
                    rows["byte_sum"].append(int(p.sum()))
                    rows["byte_min"].append(int(p.min()))
                    rows["byte_max"].append(int(p.max()))
            yield pd.DataFrame(rows)

    return media.mapInPandas(stats, schema=CHANNEL_STATS_SCHEMA)
