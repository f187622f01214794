"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a `media_type`
discriminator; decode / feature-extract / resize / frame-sample run as
Arrow-batched kernels over ``mapInPandas``. The actual codecs (PIL/ffmpeg/
librosa) are not in this container, so the decode step is STUBBED: if the
library import fails we fall back to a clearly-marked deterministic fake
derived from the payload bytes. The Spark-side plumbing — schema, UDF
signature, batch shape, partitioning — is real and tested; swapping the
fake for a real decoder changes only the body of ``_decode_one``.

Scale notes: payload columns are the dominant bytes at 100 TB — metadata
extraction projects them away immediately after the kernel, and the media
table is stored with payloads in their own parquet column chunk so
metadata-only queries never read them (column pruning verified via
.explain ReadSchema).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_TYPES = ["image", "audio", "video"]

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),
    T.StructField("payload", T.BinaryType(), False),
])

META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("media_type", T.StringType(), False),
    T.StructField("n_bytes", T.IntegerType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("n_frames", T.IntegerType(), True),
    T.StructField("codec", T.StringType(), True),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("frame", T.BinaryType(), False),
])


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table from the documents fixture: the text bytes
    stand in for an encoded payload; media_type rotates by doc_id % 3."""
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        F.col("doc_id"),
        mt.alias("media_type"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def _try_real_decoder():
    try:  # pragma: no cover - PIL absent in this container by design
        from PIL import Image  # noqa: F401
        return Image
    except ImportError:
        return None


def _decode_one(media_type: str, payload: bytes) -> dict:
    """Decode one payload to typed metadata.

    STUB: with no codec libraries installed this returns a deterministic
    fake derived from the byte length — real plumbing, fake decode. A real
    deployment replaces the fake branches with PIL / soundfile / pyav calls.
    """
    n = len(payload)
    pil = _try_real_decoder()
    if pil is not None and media_type == "image":
        raise NotImplementedError(
            "real image decode path not exercised in this container")
    if media_type == "image":
        return {"width": 16 + n % 640, "height": 16 + (n * 7) % 480,
                "sample_rate": None, "n_frames": None, "codec": "fake/png"}
    if media_type == "audio":
        return {"width": None, "height": None,
                "sample_rate": 8000 + (n % 5) * 8000, "n_frames": None,
                "codec": "fake/pcm"}
    return {"width": 16 + n % 320, "height": 16 + (n * 3) % 240,
            "sample_rate": None, "n_frames": 1 + n % 5, "codec": "fake/h264"}


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        metas = [_decode_one(mt, p)
                 for mt, p in zip(pdf["media_type"], pdf["payload"])]
        out = pd.DataFrame(metas)
        # nullable Int32 so None-bearing numeric columns survive the Arrow
        # cast to IntegerType (a plain float64-with-NaN column would not)
        for c in ("width", "height", "sample_rate", "n_frames"):
            out[c] = pd.array(out[c], dtype="Int32")
        out.insert(0, "doc_id", pdf["doc_id"].values)
        out.insert(1, "media_type", pdf["media_type"].values)
        out.insert(2, "n_bytes", pd.array([len(p) for p in pdf["payload"]], dtype="Int32"))
        yield out


def extract_media_meta(media: DataFrame) -> DataFrame:
    """media → typed metadata via Arrow-batched mapInPandas; payloads are
    projected away inside the kernel (nothing downstream carries the bytes)."""
    return media.mapInPandas(_decode_batches, schema=META_SCHEMA)


def _frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Frame sampling stub: slices the payload into n_frames equal chunks
    (deterministic fake of keyframe extraction; same shape as a real one)."""
    for pdf in batches:
        ids, idxs, frames = [], [], []
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            n = 1 + len(p) % 5
            step = max(1, len(p) // n)
            for i in range(n):
                ids.append(doc_id)
                idxs.append(i)
                frames.append(bytes(p[i * step:(i + 1) * step]))
        yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})


def sample_frames(media: DataFrame) -> DataFrame:
    """video rows → one row per sampled frame (explode via mapInPandas —
    output batches are row-multiplying, the Arrow batch size bounds memory)."""
    return (media.filter(F.col("media_type") == "video")
            .mapInPandas(_frame_sample_batches, schema=FRAME_SCHEMA))
