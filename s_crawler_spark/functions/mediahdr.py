"""Stdlib media *header* codecs — real decode for the dominant formats.

The container has no image/audio libraries, but the header fields the
pipeline needs (dimensions, sample rate, frame count) are plain
``struct.unpack`` reads on the payload head — public file-format layouts:

- PNG: 8-byte magic, then the IHDR chunk — width/height are big-endian
  u32 at bytes 16–24 (PNG spec §11.2.2).
- JPEG: marker scan for a start-of-frame segment (SOF0/1/2/...) — height
  and width are big-endian u16 at offsets 5/7 inside it (ITU T.81 §B.2.2).
- GIF: logical screen descriptor — width/height little-endian u16 at
  bytes 6–10 (GIF89a spec §18).
- BMP: BITMAPINFOHEADER — width/height little-endian i32 at bytes 18/22
  (height may be negative = top-down); the ancient BITMAPCOREHEADER
  variant stores u16 at the same offsets.
- WAV: RIFF chunk scan for ``fmt `` (sample rate u32 LE at chunk offset 4,
  block align u16 LE at offset 12) and ``data`` (frame count = chunk size
  / block align) — RIFF/WAVE spec.

``parse_header`` is the decode kernel's fast path (operators/multimodal.py);
unrecognized payloads fall back to the documented deterministic fake (the
only codecs that truly need libraries — video containers — stay stubbed).
The ``*_bytes`` encoders build minimal valid headers around an arbitrary
body, used by the media fixture generator and the round-trip tests; they
are header-only (a PNG made here has a real IHDR but no IDAT — exactly
what a header parser consumes).
"""

from __future__ import annotations

import struct

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
GIF_MAGICS = (b"GIF87a", b"GIF89a")

# header sizes the encoders emit (the generator's oracle arithmetic —
# n_bytes = body length + these constants — depends on them)
PNG_HEADER_LEN = 33   # magic(8) + len(4) + 'IHDR'(4) + data(13) + crc(4)
WAV_HEADER_LEN = 44   # RIFF(12) + 'fmt '(8+16) + 'data'(8)


def _parse_png(p: bytes) -> dict | None:
    if len(p) < 24 or p[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", p[16:24])
    return {"width": w, "height": h, "sample_rate": None,
            "n_frames": None, "codec": "png"}


# SOFn markers carrying frame dimensions: C0–C3, C5–C7, C9–CB, CD–CF
_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _parse_jpeg(p: bytes) -> dict | None:
    i = 2  # past SOI
    while i + 4 <= len(p):
        if p[i] != 0xFF:
            return None
        marker = p[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD9:
            # standalone TEM/RSTn/SOI/EOI — no length word follows;
            # reading one would desync the scan by two arbitrary bytes
            i += 2
            continue
        seglen = struct.unpack(">H", p[i + 2:i + 4])[0]
        if marker in _SOF:
            if i + 9 > len(p):
                return None
            h, w = struct.unpack(">HH", p[i + 5:i + 9])
            return {"width": w, "height": h, "sample_rate": None,
                    "n_frames": None, "codec": "jpeg"}
        i += 2 + seglen
    return None


def _parse_gif(p: bytes) -> dict | None:
    if len(p) < 10:
        return None
    w, h = struct.unpack("<HH", p[6:10])
    return {"width": w, "height": h, "sample_rate": None,
            "n_frames": None, "codec": "gif"}


def _parse_bmp(p: bytes) -> dict | None:
    if len(p) < 22:  # file header(14) + DIB size(4) + core w/h(2+2)
        return None
    dib = struct.unpack("<I", p[14:18])[0]
    if dib == 12:  # BITMAPCOREHEADER: u16 fields
        w, h = struct.unpack("<HH", p[18:22])
    else:  # BITMAPINFOHEADER and successors: i32, height<0 = top-down
        if len(p) < 26:
            return None
        w, h = struct.unpack("<ii", p[18:26])
        h = abs(h)
    return {"width": w, "height": h, "sample_rate": None,
            "n_frames": None, "codec": "bmp"}


def _parse_wav(p: bytes) -> dict | None:
    if len(p) < 12 or p[8:12] != b"WAVE":
        return None
    rate, block_align, data_size = None, None, None
    i = 12
    while i + 8 <= len(p):
        cid = p[i:i + 4]
        size = struct.unpack("<I", p[i + 4:i + 8])[0]
        if cid == b"fmt " and i + 8 + 14 <= len(p):
            rate = struct.unpack("<I", p[i + 12:i + 16])[0]
            block_align = struct.unpack("<H", p[i + 20:i + 22])[0]
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None:
        return None
    n_frames = (data_size // block_align
                if data_size is not None and block_align else None)
    return {"width": None, "height": None, "sample_rate": rate,
            "n_frames": n_frames, "codec": "wav"}


def parse_header(payload: bytes, media_type: str | None = None) -> dict | None:
    """Typed metadata from a recognized payload head, else None (caller
    falls back to the deterministic stub). Pure stdlib, header-only —
    never touches the body bytes, so cost is O(1) per payload regardless
    of size (JPEG: O(metadata segments)).

    A declared ``media_type`` restricts the sniff to that family's formats:
    an image parser must never claim a video/audio payload whose body bytes
    coincidentally start with a magic (e.g. a document beginning "BM…" —
    _parse_bmp would happily read garbage dimensions out of it). Types with
    no stdlib parser (video containers) return None outright so the caller's
    deterministic fake stays authoritative for them."""
    if media_type in (None, "image"):
        if payload.startswith(PNG_MAGIC):
            return _parse_png(payload)
        if payload.startswith(b"\xff\xd8\xff"):
            return _parse_jpeg(payload)
        if payload[:6] in GIF_MAGICS:
            return _parse_gif(payload)
        if payload.startswith(b"BM"):
            return _parse_bmp(payload)
    if media_type in (None, "audio"):
        if payload.startswith(b"RIFF"):
            return _parse_wav(payload)
    return None


# -- encoders: minimal valid headers around an arbitrary body ---------------

def png_bytes(width: int, height: int, body: bytes = b"") -> bytes:
    ihdr = struct.pack(">II5B", width, height, 8, 2, 0, 0, 0)
    return (PNG_MAGIC + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
            + b"\x00\x00\x00\x00" + body)  # CRC unchecked by header parsers


def jpeg_bytes(width: int, height: int, body: bytes = b"") -> bytes:
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    return (b"\xff\xd8" + b"\xff\xc0" + struct.pack(">H", 2 + len(sof0))
            + sof0 + body)


def gif_bytes(width: int, height: int, body: bytes = b"") -> bytes:
    return b"GIF89a" + struct.pack("<HHBBB", width, height, 0, 0, 0) + body


def bmp_bytes(width: int, height: int, body: bytes = b"") -> bytes:
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, 0, 0, 0, 0, 0)
    return (b"BM" + struct.pack("<IHHI", 14 + len(dib) + len(body), 0, 0,
                                14 + len(dib)) + dib + body)


def wav_bytes(sample_rate: int, body: bytes = b"") -> bytes:
    """Mono 16-bit PCM header; ``body`` is the data chunk (n_frames =
    len(body) // 2 by block align)."""
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(body)) + body)
