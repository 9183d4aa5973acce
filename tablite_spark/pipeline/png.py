"""Minimal real PNG codec — stdlib only (zlib + struct + numpy).

Implements the public PNG specification (RFC 2083 / W3C PNG) for the
subset that matters to a data pipeline: 8-bit greyscale/RGB/RGBA,
non-interlaced, all five scanline filters on decode, filter-0 on
encode. This makes the multimodal image path REAL in this container
(no PIL needed): `decode_images` reads true dimensions from IHDR and
`extract_image_features` computes true pixel statistics.

Not a general-purpose imaging library: paletted images, 16-bit depth,
interlacing, and ancillary color chunks raise ValueError.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel


def png_encode(pixels: np.ndarray) -> bytes:
    """Encode an (H, W) or (H, W, C) uint8 array (C in {1, 3, 4}) as a
    non-interlaced 8-bit PNG with filter type 0."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 3: 2, 4: 6}.get(c)
    if color_type is None:
        raise ValueError(f"unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    idat = zlib.compress(raw, 6)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    return (_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


def png_header(data: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from IHDR without decompressing."""
    if not data or not data.startswith(_MAGIC):
        raise ValueError("not a PNG")
    if data[12:16] != b"IHDR":
        raise ValueError("IHDR not first chunk")
    w, h, depth, color_type = struct.unpack(">IIBB", data[16:26])
    if depth != 8 or color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG (depth={depth}, color={color_type})")
    return w, h, _CHANNELS[color_type]


def png_decode(data: bytes) -> np.ndarray:
    """Decode to an (H, W, C) uint8 array. Handles all five scanline
    filters (None/Sub/Up/Average/Paeth) per the PNG spec."""
    w, h, c = png_header(data)
    # walk chunks, concatenate IDAT
    pos, idat = 8, []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        if tag == b"IDAT":
            idat.append(data[pos + 8:pos + 8 + length])
        if tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(b"".join(idat))
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch (interlaced?)")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride,
            offset=row_start + 1).astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for i in range(c, stride):
                cur[i] = (cur[i] + cur[i - c]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                a = cur[i - c] if i >= c else 0
                cur[i] = (cur[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = cur[i - c] if i >= c else 0
                b = prev[i]
                cc = prev[i - c] if i >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, c)
