"""Minimal GIF codec (pure stdlib+numpy) — completes the web-image
trio next to pipeline/png.py and pipeline/jpeg.py.

Implements the public GIF87a/89a specification: logical screen
descriptor, global/local color tables, LZW decompression with
variable code widths (LSB-first packing, clear/EOI codes, 4096-entry
dictionary reset), interlaced row order, and extension-block
skipping. The encoder writes a single-frame GIF with a real LZW
compressor for fixtures and round-trip tests.

Scope: the FIRST image frame decodes to (H, W, 3) uint8 RGB;
animation timing and frame composition (disposal methods) are out of
scope — frame sampling for animations belongs to the video surface
(pipeline/avi.py). Transparency indexes render as their palette
color. Original from-spec implementation; the reference has no image
codecs at all.
"""
from __future__ import annotations

import struct

import numpy as np


def gif_header(data: bytes) -> tuple[int, int]:
    """(width, height) from the logical screen descriptor."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack_from("<HH", data, 6)
    return w, h


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at pos; return (bytes,
    position after the 0-size terminator)."""
    chunks = []
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(data[pos:pos + n])
        pos += n


def _lzw_decode(raw: bytes, min_code: int) -> list[int]:
    clear, end = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: bytes | None = None
    acc = bits = 0
    pos = 0
    while True:
        while bits < width:
            if pos >= len(raw):
                return list(out)  # tolerate missing explicit EOI
            acc |= raw[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        bits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code + 1
            prev = None
            continue
        if code == end:
            return list(out)
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt LZW stream")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


def _lzw_encode(indices, min_code: int) -> bytes:
    clear, end = 1 << min_code, (1 << min_code) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code + 1
    out = bytearray()
    acc = bits = 0

    def emit(code: int):
        nonlocal acc, bits, width
        acc |= code << bits
        bits += width
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear)
    w = b""
    for px in indices:
        wk = w + bytes([px])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        if next_code - 1 == 1 << width and width < 12:
            width += 1
        if next_code == 4096:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code + 1
        w = bytes([px])
    if w:
        emit(table[w])
    emit(end)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_decode(data: bytes) -> np.ndarray:
    """First frame as (H, W, 3) uint8 RGB."""
    sw, sh = gif_header(data)
    packed = data[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            _, pos = _sub_blocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, w, h, ipacked = struct.unpack_from("<HHHHB", data, pos + 1)
        pos += 10
        ct = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(data, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF image has no color table")
        min_code = data[pos]
        raw, pos = _sub_blocks(data, pos + 1)
        idx = np.array(_lzw_decode(raw, min_code), dtype=np.int32)
        if len(idx) < w * h:
            raise ValueError("truncated GIF image data")
        idx = idx[: w * h].reshape(h, w)
        if ipacked & 0x40:  # interlaced: reorder rows
            rows = [r for start, step in _INTERLACE
                    for r in range(start, h, step)]
            fixed = np.empty_like(idx)
            fixed[rows] = idx
            idx = fixed
        return ct[np.clip(idx, 0, len(ct) - 1)].astype(np.uint8)
    raise ValueError("GIF has no image frame")


def gif_encode(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """Single-frame GIF from (H, W, 3) uint8 RGB; the palette is the
    image's distinct colors (<= 256 required)."""
    h, w = pixels.shape[:2]
    flat = pixels.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("gif_encode requires <= 256 distinct colors")
    depth = max(1, int(np.ceil(np.log2(max(len(colors), 2)))))
    table_n = 1 << depth
    gct = np.zeros((table_n, 3), dtype=np.uint8)
    gct[: len(colors)] = colors
    idx = idx.reshape(h, w)
    if interlace:
        rows = [r for start, step in _INTERLACE
                for r in range(start, h, step)]
        idx = idx[rows]
    min_code = max(2, depth)
    lzw = _lzw_encode(idx.ravel().astype(np.uint8).tolist(), min_code)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 7), 0, 0)
    out += gct.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h,
                       0x40 if interlace else 0)
    out.append(min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    out.append(0x3B)
    return bytes(out)
