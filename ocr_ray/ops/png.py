"""PNG codec in pure numpy + stdlib zlib (r5).

PNG's entropy layer is DEFLATE, which ships in the Python stdlib — so
unlike JPEG there is nothing approximate here: decode(encode(img)) is
BYTE-EXACT and the driver gate uses the same pre-encode pixel sidecar as
the PPM/BMP gates.

Scope: 8-bit samples, color types 0 (grey), 2 (RGB), 3 (palette), 4
(grey+alpha), 6 (RGBA), all five scanline filters (None/Sub/Up/Average/
Paeth), multi-IDAT streams, CRC verification. Adam7 interlace and 16-bit
samples raise ValueError (documented; rare in training-data corpora and
trivially transcodable upstream). The encoder cycles through all five
filters row by row so round trips exercise every unfilter path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(data: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """(h, 1+stride) filtered scanlines -> (h, stride) reconstructed."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = int(data[y, 0])
        row = data[y, 1:].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y else np.zeros(stride, dtype=np.int64)
        if ft == 0:  # None
            rec = row
        elif ft == 1:  # Sub: per-lane cumulative sum
            lanes = row.reshape(-1, bpp)
            rec = np.cumsum(lanes, axis=0).reshape(-1)
        elif ft == 2:  # Up
            rec = row + prev
        elif ft == 3:  # Average
            rec = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                rec[i] = row[i] + ((left + prev[i]) >> 1)
                rec[i] &= 0xFF
        elif ft == 4:  # Paeth
            rec = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                left = rec[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                rec[i] = (row[i] + _paeth(int(left), int(prev[i]), int(ul))) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ft}")
        out[y] = (rec & 0xFF).astype(np.uint8)
    return out


def decode_png(raw: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB (alpha dropped, palette resolved,
    grey replicated). Raises ValueError on malformed/unsupported input."""
    if raw[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG")
    pos = len(_SIG)
    ihdr = None
    idat = bytearray()
    plte = None
    n = len(raw)
    while pos + 8 <= n:
        length, ctype = struct.unpack_from(">I4s", raw, pos)
        data = raw[pos + 8 : pos + 8 + length]
        crc = struct.unpack_from(">I", raw, pos + 8 + length)[0]
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {ctype!r}")
        pos += 12 + length
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8:
                raise ValueError("only 8-bit PNG samples supported")
            if color not in _CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
            if interlace != 0:
                raise ValueError("Adam7 interlace unsupported")
            if comp != 0 or filt != 0:
                raise ValueError("unknown compression/filter method")
            ihdr = (w, h, color)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, color = ihdr
    ch = _CHANNELS[color]
    stride = w * ch
    try:
        plain = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG deflate stream: {e}") from e
    if len(plain) != h * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    rows = np.frombuffer(plain, dtype=np.uint8).reshape(h, stride + 1)
    px = _unfilter(rows, h, stride, ch).reshape(h, w, ch)
    if color == 2:
        return px
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    if color == 6:
        return px[:, :, :3].copy()
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("palette index out of range")
        return plte[idx]
    raise ValueError("unreachable")


def _filter_row(raw_row, prev_row, ft: int, bpp: int) -> np.ndarray:
    r = raw_row.astype(np.int64)
    p = prev_row.astype(np.int64)
    left = np.concatenate([np.zeros(bpp, np.int64), r[:-bpp]]) if len(r) >= bpp else np.zeros_like(r)
    ul = np.concatenate([np.zeros(bpp, np.int64), p[:-bpp]]) if len(p) >= bpp else np.zeros_like(p)
    if ft == 0:
        out = r
    elif ft == 1:
        out = r - left
    elif ft == 2:
        out = r - p
    elif ft == 3:
        out = r - ((left + p) >> 1)
    else:  # Paeth
        pr = left + p - ul
        pa, pb, pc = np.abs(pr - left), np.abs(pr - p), np.abs(pr - ul)
        pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, p, ul))
        out = r - pred
    return (out & 0xFF).astype(np.uint8)


def encode_png(pixels: np.ndarray, level: int = 6) -> bytes:
    """(h, w, 3) uint8 RGB or (h, w) uint8 grey -> PNG bytes. Scanline
    filters cycle None/Sub/Up/Average/Paeth by row index so a decoder
    round trip exercises every unfilter path; output is byte-exact
    recoverable (PNG is lossless)."""
    grey = pixels.ndim == 2
    h, w = pixels.shape[:2]
    ch = 1 if grey else 3
    flat = pixels.reshape(h, w * ch)
    lines = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        ft = y % 5
        lines.append(ft)
        lines += _filter_row(flat[y], prev, ft, ch).tobytes()
        prev = flat[y]
    comp = zlib.compress(bytes(lines), level)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0 if grey else 2, 0, 0, 0)
    return _SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp) + chunk(b"IEND", b"")
