"""PNG codec tests (r5): byte-exact round trips through all five scanline
filters, palette/alpha/grey color types, CRC verification, malformed and
unsupported inputs, and the gate surface."""

import struct
import zlib

import numpy as np
import pytest

from ocr_ray.ops.png import decode_png, encode_png

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(t: bytes, d: bytes) -> bytes:
    return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)


def _hand_png(w, h, color, lines, extra=b""):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return _SIG + _chunk(b"IHDR", ihdr) + extra + _chunk(b"IDAT", zlib.compress(lines)) + _chunk(b"IEND", b"")


class TestRoundTrip:
    def test_rgb_byte_exact_all_filters(self):
        rng = np.random.RandomState(5)
        for shape in [(17, 23, 3), (8, 8, 3), (1, 1, 3), (33, 7, 3), (5, 64, 3)]:
            img = rng.randint(0, 256, shape, dtype=np.uint8)
            assert (decode_png(encode_png(img)) == img).all(), shape

    def test_grey_replicated(self):
        g = np.random.RandomState(1).randint(0, 256, (19, 13), dtype=np.uint8)
        assert (decode_png(encode_png(g)) == np.repeat(g[:, :, None], 3, axis=2)).all()

    def test_encoder_uses_every_filter(self):
        img = np.random.RandomState(2).randint(0, 256, (7, 9, 3), dtype=np.uint8)
        raw = encode_png(img)
        # find IDAT, inflate, read the filter byte of each scanline
        pos = len(_SIG)
        idat = b""
        while pos + 8 <= len(raw):
            length, ctype = struct.unpack_from(">I4s", raw, pos)
            if ctype == b"IDAT":
                idat += raw[pos + 8 : pos + 8 + length]
            pos += 12 + length
        plain = zlib.decompress(idat)
        stride = 9 * 3 + 1
        fts = [plain[y * stride] for y in range(7)]
        assert fts == [0, 1, 2, 3, 4, 0, 1]

    def test_multi_idat(self):
        img = np.random.RandomState(3).randint(0, 256, (4, 4, 3), dtype=np.uint8)
        raw = encode_png(img)
        # split the single IDAT into two chunks
        pos = len(_SIG)
        parts = []
        idat = b""
        while pos + 8 <= len(raw):
            length, ctype = struct.unpack_from(">I4s", raw, pos)
            data = raw[pos + 8 : pos + 8 + length]
            if ctype == b"IDAT":
                idat = data
            else:
                parts.append((ctype, data))
            pos += 12 + length
        mid = len(idat) // 2
        rebuilt = (
            _SIG
            + _chunk(b"IHDR", dict(parts)[b"IHDR"])
            + _chunk(b"IDAT", idat[:mid])
            + _chunk(b"IDAT", idat[mid:])
            + _chunk(b"IEND", b"")
        )
        assert (decode_png(rebuilt) == img).all()


class TestColorTypes:
    def test_palette(self):
        plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
        idx = np.array([[0, 1], [2, 0]], np.uint8)
        lines = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
        raw = _hand_png(2, 2, 3, lines, extra=_chunk(b"PLTE", plte))
        dec = decode_png(raw)
        assert dec[0, 0].tolist() == [255, 0, 0]
        assert dec[1, 0].tolist() == [0, 0, 255]

    def test_palette_index_out_of_range(self):
        plte = bytes([1, 2, 3])
        lines = b"\x00\x05"
        raw = _hand_png(1, 1, 3, lines, extra=_chunk(b"PLTE", plte))
        with pytest.raises(ValueError):
            decode_png(raw)

    def test_rgba_drops_alpha(self):
        px = np.dstack([np.full((2, 2), i * 60, np.uint8) for i in range(4)])
        lines = b"".join(b"\x00" + px[y].tobytes() for y in range(2))
        assert decode_png(_hand_png(2, 2, 6, lines))[0, 0].tolist() == [0, 60, 120]

    def test_grey_alpha(self):
        px = np.dstack([np.full((2, 2), 77, np.uint8), np.full((2, 2), 255, np.uint8)])
        lines = b"".join(b"\x00" + px[y].tobytes() for y in range(2))
        assert decode_png(_hand_png(2, 2, 4, lines))[0, 0].tolist() == [77, 77, 77]


class TestMalformed:
    def test_not_png(self):
        with pytest.raises(ValueError):
            decode_png(b"nope")

    def test_crc_mismatch(self):
        raw = bytearray(encode_png(np.zeros((4, 4, 3), np.uint8)))
        raw[40] ^= 0xFF
        with pytest.raises(ValueError):
            decode_png(bytes(raw))

    def test_interlace_rejected(self):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
        raw = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(b"")) + _chunk(b"IEND", b"")
        with pytest.raises(ValueError):
            decode_png(raw)

    def test_16bit_rejected(self):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
        raw = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(b"")) + _chunk(b"IEND", b"")
        with pytest.raises(ValueError):
            decode_png(raw)

    def test_size_mismatch(self):
        raw = _hand_png(4, 4, 2, b"\x00" + b"ab")
        with pytest.raises(ValueError):
            decode_png(raw)


class TestGateSurface:
    def test_stats_match_sidecar(self):
        from ocr_ray.ops.multimodal import ImageStats, synth_png_table

        images, truth = synth_png_table(30)
        got = ImageStats()(images)
        cols = truth.column_names
        a = sorted(zip(*[got.column(c).to_pylist() for c in cols]))
        b = sorted(zip(*[truth.column(c).to_pylist() for c in cols]))
        assert a == b

    def test_decode_image_sniffs_png(self):
        from ocr_ray.ops.multimodal import decode_image

        img = np.random.RandomState(7).randint(0, 256, (6, 5, 3), dtype=np.uint8)
        fmt, px = decode_image(encode_png(img))
        assert fmt == "png" and (px == img).all()
