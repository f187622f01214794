"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a `media_type`
discriminator; decode / feature-extract / resize / frame-sample run as
Arrow-batched kernels over ``mapInPandas``. Header decode is REAL for the
dominant formats — PNG / JPEG / GIF / BMP / WAV header fields are stdlib
``struct`` reads (functions/mediahdr.py), no codec libraries needed. Only
payloads no header parser recognizes (video containers, which truly need
ffmpeg/pyav) fall back to a clearly-marked deterministic fake derived from
the payload bytes; a real deployment swaps that one branch.

Scale notes: payload columns are the dominant bytes at 100 TB — metadata
extraction projects them away immediately after the kernel (and header
parsing reads O(1) bytes per payload), and the media table is stored with
payloads in their own parquet column chunk so metadata-only queries never
read them (column pruning verified via .explain ReadSchema).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import mediahdr

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


def _be32(c):
    """4-byte big-endian binary of an int column (hex → unhex, JVM-side)."""
    return F.unhex(F.lpad(F.hex(c.cast("bigint")), 8, "0"))


def _le_bytes(c, n: int):
    """n-byte little-endian binary of an int column: per-byte hex/unhex
    concat — all JVM column expressions, no Python in the row path."""
    c = c.cast("bigint")
    return F.concat(*[
        F.unhex(F.lpad(F.hex(F.shiftrightunsigned(c, 8 * i) % 256), 2, "0"))
        for i in range(n)])


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table from the documents fixture: the text bytes
    are the payload BODY, wrapped in a REAL format header so the decode
    kernel exercises the stdlib header parsers — image rows get a valid PNG
    IHDR, audio rows a valid RIFF/WAVE fmt+data header (mono 16-bit PCM),
    while video rows stay a bare byte blob (video containers are the one
    stub left; functions/mediahdr.py). Header fields derive from the body
    length n exactly as the old stub did (width = 16 + n % 640, ...), so
    the DuckDB oracle recomputes them in closed form while the engine
    round-trips them through real encode → parse. All header packing is
    JVM column expressions (hex/unhex concat) — media_type rotates by
    doc_id % 3."""
    mt = F.element_at(
        F.array(*[F.lit(m) for m in MEDIA_TYPES]),
        (F.col("doc_id") % 3 + 1).cast("int"))
    body = F.encode(F.col("text"), "UTF-8")
    n = F.length(body)
    png = F.concat(
        F.lit(mediahdr.PNG_MAGIC), F.lit(b"\x00\x00\x00\x0dIHDR"),
        _be32(16 + n % 640), _be32(16 + (n * 7) % 480),
        F.lit(b"\x08\x02\x00\x00\x00" + b"\x00" * 4), body)
    rate = 8000 + (n % 5) * 8000
    wav = F.concat(
        F.lit(b"RIFF"), _le_bytes(36 + n, 4), F.lit(b"WAVEfmt "),
        _le_bytes(F.lit(16), 4), _le_bytes(F.lit(1), 2), _le_bytes(F.lit(1), 2),
        _le_bytes(rate, 4), _le_bytes(rate * 2, 4),
        _le_bytes(F.lit(2), 2), _le_bytes(F.lit(16), 2),
        F.lit(b"data"), _le_bytes(n, 4), body)
    return docs.select(
        F.col("doc_id"),
        mt.alias("media_type"),
        F.when(mt == "image", png)
        .when(mt == "audio", wav)
        .otherwise(body).alias("payload"),
    )


def _decode_one(media_type: str, payload: bytes) -> dict:
    """Decode one payload to typed metadata.

    Real path: a recognized PNG/JPEG/GIF/BMP/WAV head is parsed with
    stdlib struct reads (functions/mediahdr.py), restricted to the row's
    declared media_type family so a payload whose BODY bytes coincidentally
    start with another family's magic is never misdecoded. Fallback:
    payloads no header parser recognizes (video containers — the one codec
    family that truly needs libraries) get the documented deterministic
    fake derived from the byte length; a real deployment replaces that
    branch with a pyav/ffmpeg call."""
    meta = mediahdr.parse_header(bytes(payload), media_type)
    if meta is not None:
        return meta
    n = len(payload)
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
