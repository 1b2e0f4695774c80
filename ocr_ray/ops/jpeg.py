"""Baseline JPEG (SOF0) codec in pure numpy (r5, VERDICT r4 #8).

Scope: sequential baseline DCT JPEGs — SOI/APP/DQT/SOF0/DHT/DRI/SOS/EOI
marker stream, 8-bit quantization tables, standard Huffman decoding with
byte-stuffing and restart markers, grayscale and 3-component YCbCr with
arbitrary sampling factors in {1, 2} (chroma upsampled by pixel
replication — a spec-permitted decoder choice, pinned by pytest).
Progressive (SOF2), arithmetic coding, and 12-bit precision stay behind
``NotImplementedError`` / ``ValueError`` — with this module, the remaining
multimodal stub slots are progressive-JPEG/PNG/video-codec only.

The encoder emits 4:4:4 (or single-component) baseline files with the
Annex-K example tables, which keeps the fixture generator dependency-free
and gives the decoder REAL entropy-coded input.

Determinism contract (everything the gate relies on is pinned here):
  * forward DCT / IDCT are float64 separable orthonormal matrix products;
  * quantization is ``floor(coef / q + 0.5)`` (round-half-up, symmetric
    implementation on both encode paths);
  * reconstruction rounds with ``floor(x + 0.5)`` then clamps to [0, 255];
  * RGB<->YCbCr uses the JFIF formulas with the same rounding.
JPEG is lossy, so decode(encode(img)) != img in general — the driver gate
uses BLOCK-CONSTANT mosaics, where every DCT is DC-only and the whole
pipeline collapses to scalar integer arithmetic that an INDEPENDENT
analytic oracle (``mosaic_expected_color``) reproduces exactly.
"""

from __future__ import annotations

import struct

import numpy as np

# --- tables (ITU-T T.81 Annex K) -------------------------------------------

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)

_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)

# standard Huffman tables: (bits[1..16], values)
_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))
_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal DCT-II basis: D @ block @ D.T == scaled DCT coefficients
_DCT_M = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT_M[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base table, clamped to [1, 255]."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255)


def _quantize(coef: np.ndarray, q: np.ndarray) -> np.ndarray:
    # round-half-up, symmetric: floor(x/q + 0.5) for x >= 0, mirrored for
    # x < 0 (the convention the analytic mosaic oracle reproduces)
    x = coef / q
    return np.where(x >= 0, np.floor(x + 0.5), -np.floor(-x + 0.5)).astype(np.int64)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r = px[..., 0].astype(np.float64)
    g = px[..., 1].astype(np.float64)
    b = px[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    out = np.stack([y, cb, cr], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    y = y.astype(np.float64)
    cb = cb.astype(np.float64) - 128.0
    cr = cr.astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)


# --- bit I/O ----------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill padding per spec


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.marker is not None or self.pos >= len(d):
                self.acc = (self.acc << 8) | 0  # zero-fill past segment end
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn handled by caller
                    self.marker = nxt
                    continue
                else:
                    self.marker = nxt
                    continue
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read(self, length: int) -> int:
        if length == 0:
            return 0
        if self.nbits < length:
            self._fill()
        v = (self.acc >> (self.nbits - length)) & ((1 << length) - 1)
        self.nbits -= length
        self.acc &= (1 << self.nbits) - 1
        return v

    def sync_restart(self) -> None:
        """Consume an expected RSTn marker and reset bit state. Residual
        padding bits before the marker are dropped (the spec pads each
        restart interval to a byte boundary)."""
        self.acc = 0
        self.nbits = 0
        if self.marker is None:
            d = self.data
            while self.pos + 1 < len(d) and not (
                d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7
            ):
                self.pos += 1
            if self.pos + 1 >= len(d):
                raise ValueError("expected restart marker")
            self.marker = d[self.pos + 1]
        if not 0xD0 <= self.marker <= 0xD7:
            raise ValueError(f"expected RSTn, found marker {self.marker:#x}")
        self.pos += 2
        self.marker = None


class _HuffTable:
    __slots__ = ("lookup", "max_len", "enc")

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        # one canonical-code pass builds both the decode map and the
        # encode map (value -> (code, length))
        self.lookup: dict[tuple[int, int], int] = {}
        self.enc: dict[int, tuple[int, int]] = {}
        if len(bits) < 16 or sum(bits) > len(vals):
            raise ValueError("malformed Huffman table definition")
        code = 0
        k = 0
        self.max_len = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = vals[k]
                self.enc[vals[k]] = (code, length)
                code += 1
                k += 1
                self.max_len = length
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            v = self.lookup.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code in JPEG stream")


def _magnitude(v: int) -> tuple[int, int]:
    """value -> (size, amplitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# --- encoder ---------------------------------------------------------------


def encode_jpeg_baseline(
    pixels: np.ndarray,
    quality: int = 90,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """(h, w, 3) uint8 RGB or (h, w) uint8 grey -> baseline JFIF bytes
    (standard tables scaled by ``quality``). ``subsampling``: "444"
    (default; exact chroma) or "420" (2x2 box-averaged chroma, the
    ubiquitous real-world shape — MCU = 4 Y blocks + Cb + Cr).
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (the error-resilience feature real encoders use;
    exercises the decoder's restart resync path)."""
    grey = pixels.ndim == 2
    h, w = pixels.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub420 = subsampling == "420" and not grey
    qy = _scaled_q(_Q_LUMA, quality)
    qc = _scaled_q(_Q_CHROMA, quality)

    if grey:
        planes = [pixels.astype(np.float64)]
        qtabs = [qy]
        samps = [(1, 1)]
    elif not sub420:
        ycc = _rgb_to_ycbcr(pixels)
        planes = [ycc[..., i].astype(np.float64) for i in range(3)]
        qtabs = [qy, qc, qc]
        samps = [(1, 1), (1, 1), (1, 1)]
    else:
        ycc = _rgb_to_ycbcr(pixels)
        y = ycc[..., 0].astype(np.float64)
        # chroma: pad to even dims (edge), 2x2 box mean, floor(x+0.5)
        he, we = (h + 1) & ~1, (w + 1) & ~1
        cbcr = []
        for i in (1, 2):
            p = np.pad(
                ycc[..., i].astype(np.float64),
                ((0, he - h), (0, we - w)),
                mode="edge",
            )
            m = p.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cbcr.append(np.floor(m + 0.5))
        planes = [y, cbcr[0], cbcr[1]]
        qtabs = [qy, qc, qc]
        samps = [(2, 2), (1, 1), (1, 1)]

    hmax = max(sx for sx, _ in samps)
    vmax = max(sy for _, sy in samps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    dc_y = _HuffTable(_DC_LUMA_BITS, _DC_LUMA_VALS)
    ac_y = _HuffTable(_AC_LUMA_BITS, _AC_LUMA_VALS)
    dc_c = _HuffTable(_DC_CHROMA_BITS, _DC_CHROMA_VALS)
    ac_c = _HuffTable(_AC_CHROMA_BITS, _AC_CHROMA_VALS)
    htabs = [(dc_y, ac_y)] + ([(dc_c, ac_c), (dc_c, ac_c)] if not grey else [])

    # quantized zigzag coefficients per component (vectorized DCT); each
    # component's plane pads to its own MCU-aligned block grid
    qz = []
    bdims = []
    for (plane, qt), (sx, sy) in zip(zip(planes, qtabs), samps):
        pbh, pbw = mcuy * sy, mcux * sx
        ph, pw = plane.shape
        padded = np.pad(
            plane, ((0, pbh * 8 - ph), (0, pbw * 8 - pw)), mode="edge"
        )
        blk = padded.reshape(pbh, 8, pbw, 8).transpose(0, 2, 1, 3) - 128.0
        coef = np.einsum("ij,bcjk,lk->bcil", _DCT_M, blk, _DCT_M)
        # DC computed exactly (integer block sum / 8): the matrix product
        # carries ~1e-13 of irrational-basis rounding, enough to flip a
        # round-half quantization boundary — the analytic mosaic oracle
        # (and any bit-exactness contract) needs the exact value
        coef[:, :, 0, 0] = blk.sum(axis=(2, 3)) / 8.0
        q = _quantize(coef, qt)
        # baseline AC categories stop at size 10: clamp AC magnitudes to
        # 1023 (reachable only at quality ~100 on pathological blocks)
        dc = q[:, :, 0, 0].copy()
        q = np.clip(q, -1023, 1023)
        q[:, :, 0, 0] = dc
        qz.append(q.reshape(pbh, pbw, 64)[:, :, _ZIGZAG])
        bdims.append((pbh, pbw))

    def emit_block(ci: int, by: int, bx: int) -> None:
        dct, act = htabs[ci] if not grey else (dc_y, ac_y)
        z = qz[ci][by, bx]
        diff = int(z[0]) - pred[ci]
        pred[ci] = int(z[0])
        size, bits = _magnitude(diff)
        code, ln = dct.enc[size]
        bwr.write(code, ln)
        if size:
            bwr.write(bits, size)
        run = 0
        nz = np.nonzero(z[1:])[0]
        last_nz = nz[-1] + 1 if len(nz) else 0
        k = 1
        while k <= last_nz:
            v = int(z[k])
            if v == 0:
                run += 1
                if run == 16:
                    code, ln = act.enc[0xF0]  # ZRL
                    bwr.write(code, ln)
                    run = 0
            else:
                size, bits = _magnitude(v)
                code, ln = act.enc[(run << 4) | size]
                bwr.write(code, ln)
                bwr.write(bits, size)
                run = 0
            k += 1
        if last_nz < 63:
            code, ln = act.enc[0x00]  # EOB
            bwr.write(code, ln)

    bwr = _BitWriter()
    pred = [0] * len(planes)
    mcu_i = 0
    rst_i = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bwr.flush()
                bwr.out += bytes([0xFF, 0xD0 + (rst_i % 8)])
                rst_i += 1
                pred = [0] * len(planes)
            mcu_i += 1
            for ci, (sx, sy) in enumerate(samps):
                for by in range(sy):
                    for bx in range(sx):
                        emit_block(ci, my * sy + by, mx * sx + bx)
    bwr.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, qt in ((0, qy),) + (((1, qc),) if not grey else ()):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(x) for x in qt.reshape(64)[_ZIGZAG])
    ncomp = 1 if grey else 3
    sof = struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        sx, sy = samps[ci]
        sof += bytes([ci + 1, (sx << 4) | sy, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + sof
    hts = [(0x00, _DC_LUMA_BITS, _DC_LUMA_VALS), (0x10, _AC_LUMA_BITS, _AC_LUMA_VALS)]
    if not grey:
        hts += [(0x01, _DC_CHROMA_BITS, _DC_CHROMA_VALS), (0x11, _AC_CHROMA_BITS, _AC_CHROMA_VALS)]
    for cls_id, bits, vals in hts:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), cls_id)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + sos
    out += bwr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder ---------------------------------------------------------------


def decode_jpeg_baseline(raw: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> (h, w, 3) uint8 RGB (grey replicated to 3
    channels by the ``decode_image`` caller contract being per-format;
    here grey returns (h, w) uint8). Raises ValueError on malformed input
    and NotImplementedError on progressive/arithmetic streams."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], _HuffTable] = {}
    frame = None
    restart_interval = 0
    n = len(raw)
    while pos < n:
        if raw[pos] != 0xFF:
            raise ValueError("marker expected")
        marker = raw[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > n:
            raise ValueError("truncated segment")
        seglen = struct.unpack_from(">H", raw, pos)[0]
        seg = raw[pos + 2 : pos + seglen]
        pos_next = pos + seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.zeros(64, dtype=np.int64)
                tab[_ZIGZAG] = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8)
                qtabs[tq] = tab.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                htabs[(tc, th)] = _HuffTable(bits, vals)
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, samp, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline (SOF0) JPEG is supported")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scomp = []
            for ci in range(ns):
                cs, tds = seg[1 + 2 * ci], seg[2 + 2 * ci]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scomp.append((comp, tds >> 4, tds & 0xF))
            return _decode_scan(
                raw, pos_next, frame, scomp, qtabs, htabs, restart_interval
            )
        pos = pos_next
    raise ValueError("no scan data in JPEG")


def _decode_scan(raw, pos, frame, scomp, qtabs, htabs, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        raise ValueError("sampling factors outside {1,2} unsupported")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for c in frame["comps"]:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes[c["id"]] = np.zeros((ph, pw), dtype=np.uint8)

    br = _BitReader(raw, pos)
    pred = {c["id"]: 0 for c, _, _ in scomp}
    idct_t = _DCT_M.T
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.sync_restart()
                for cid in pred:
                    pred[cid] = 0
            for comp, td, ta in scomp:
                dct = htabs.get((0, td))
                act = htabs.get((1, ta))
                if dct is None or act is None:
                    raise ValueError("missing Huffman table")
                qt = qtabs.get(comp["tq"])
                if qt is None:
                    raise ValueError("missing quant table")
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        z = np.zeros(64, dtype=np.int64)
                        size = dct.decode(br)
                        diff = _extend(br.read(size), size)
                        pred[comp["id"]] += diff
                        z[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = act.decode(br)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            if k > 63:
                                raise ValueError("AC index overflow")
                            size = rs & 0xF
                            z[k] = _extend(br.read(size), size)
                            k += 1
                        if not z[1:].any():
                            # DC-only block: the reconstruction is the
                            # constant dc*q/8 — computed exactly (the
                            # matrix IDCT's irrational-basis rounding
                            # could flip the half-way pixel rounding)
                            v = z[0] * qt[0, 0] / 8.0
                            px = np.full(
                                (8, 8),
                                np.clip(np.floor(v + 128.5), 0, 255),
                                dtype=np.uint8,
                            )
                        else:
                            coef = np.zeros(64, dtype=np.float64)
                            coef[_ZIGZAG] = z * qt.reshape(64)[_ZIGZAG]
                            blk = idct_t @ coef.reshape(8, 8) @ _DCT_M
                            px = np.clip(np.floor(blk + 128.5), 0, 255).astype(np.uint8)
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_count += 1

    comps = frame["comps"]
    if len(comps) == 1:
        return planes[comps[0]["id"]][:h, :w]
    upsampled = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        upsampled.append(p[:h, :w])
    return _ycbcr_to_rgb(upsampled[0], upsampled[1], upsampled[2])


# --- analytic mosaic oracle -------------------------------------------------


def mosaic_expected_color(rgb: tuple[int, int, int], quality: int = 90) -> tuple[int, int, int]:
    """INDEPENDENT analytic prediction of decode(encode(block)) for an
    8x8-constant RGB block — scalar arithmetic only, no codec calls.

    For a constant block every AC coefficient is exactly 0 and the DC is
    8 * (v - 128), so the whole codec collapses to: YCbCr convert ->
    DC quantize/dequantize -> +128 round/clamp -> RGB convert. This is the
    driver gate's ground truth for the JPEG mosaic fixture."""
    import math

    def rnd(x: float) -> int:
        return int(math.floor(x + 0.5))

    r, g, b = rgb
    y = min(255, max(0, rnd(0.299 * r + 0.587 * g + 0.114 * b)))
    cb = min(255, max(0, rnd(-0.168736 * r - 0.331264 * g + 0.5 * b + 128.0)))
    cr = min(255, max(0, rnd(0.5 * r - 0.418688 * g - 0.081312 * b + 128.0)))

    def s_of(q: int) -> int:
        return 5000 // quality if quality < 50 else 200 - 2 * quality

    def qval(base: int) -> int:
        q = (base * s_of(quality) + 50) // 100
        return min(255, max(1, q))

    def dc_roundtrip(v: int, q00: int) -> int:
        dc = 8.0 * (v - 128.0)
        x = dc / q00
        qd = math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)
        rec = qd * q00 / 8.0
        return min(255, max(0, int(math.floor(rec + 128.5))))

    y2 = dc_roundtrip(y, qval(16))  # Q_LUMA[0,0]
    cb2 = dc_roundtrip(cb, qval(17))  # Q_CHROMA[0,0]
    cr2 = dc_roundtrip(cr, qval(17))
    cbf = cb2 - 128.0
    crf = cr2 - 128.0
    r2 = min(255, max(0, rnd(y2 + 1.402 * crf)))
    g2 = min(255, max(0, rnd(y2 - 0.344136 * cbf - 0.714136 * crf)))
    b2 = min(255, max(0, rnd(y2 + 1.772 * cbf)))
    return r2, g2, b2
