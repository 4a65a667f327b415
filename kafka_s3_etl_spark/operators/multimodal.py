"""Multimodal column plumbing (SURVEY.md 2b / north-star LLM ops).

Images/audio/video are opaque ``binary`` columns plus typed metadata —
the layout a 100 TB multimodal training corpus uses in parquet. The Spark
side here is real and tested: schemas, binary payload handling,
mapInPandas batch iteration, Arrow transfer, partition-preserving
metadata extraction. The actual codec work is STUBBED: this container
has no image/audio libraries, so

* ``decode_metadata``  — uses a deterministic fake decoder
  (``_fake_decode``) that derives width/height/frames from payload
  bytes, making the plumbing oracle-checkable end-to-end;
* ``decode_pixels``    — raises NotImplementedError with the library
  it would use (PIL/libvips), clearly marking the seam where a real
  decoder plugs into the same mapInPandas signature.
"""

from __future__ import annotations

from collections.abc import Iterator

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


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Stand-in corpus: text bytes as the opaque payload column (the
    synthetic testdata has no real image bytes; the schema and byte
    handling are exactly what a real corpus would use)."""
    return documents.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        F.encode("text", "UTF-8").alias("payload"),
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
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [
                _fake_decode(mt, bytes(pl))
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


def decode_pixels(media: DataFrame) -> DataFrame:
    """Full decode (pixel/sample arrays). STUB: no codec libraries in
    this environment."""
    raise NotImplementedError(
        "pixel/sample decode requires an image/audio codec library "
        "(e.g. PIL, soundfile, pyav) not present in this environment; "
        "plug it into decode_metadata's mapInPandas pattern"
    )


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
    """Frame-sampling plumbing: expands fake per-frame rows (real codec
    would emit decoded frames; the fan-out/batch shape is the same)."""
    meta = decode_metadata(media)
    return meta.filter(F.col("media_type") == "video").select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
        ).alias("frame_idx"),
    )
