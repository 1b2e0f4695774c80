"""Baseline-JPEG codec tests (r5): marker stream, Huffman round trip,
restart markers, grayscale, the analytic mosaic oracle, roundtrip error
bounds, and malformed-input totality."""

import numpy as np
import pytest

from ocr_ray.ops.jpeg import (
    decode_jpeg_baseline,
    encode_jpeg_baseline,
    mosaic_expected_color,
)


def _gradient_rgb(h=40, w=56):
    img = np.zeros((h, w, 3), np.uint8)
    for c in range(3):
        img[..., c] = (np.add.outer(np.arange(h) * 3, np.arange(w) * 2) + c * 30) % 256
    return img


class TestRoundTrip:
    def test_grey_gradient_tight(self):
        g = (np.add.outer(np.arange(32), np.arange(48)) * 2).astype(np.uint8)
        dec = decode_jpeg_baseline(encode_jpeg_baseline(g, 90))
        assert dec.shape == g.shape
        assert np.abs(dec.astype(int) - g.astype(int)).max() <= 2

    def test_rgb_gradient_bounded(self):
        img = _gradient_rgb()
        dec = decode_jpeg_baseline(encode_jpeg_baseline(img, 90))
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.mean() < 2.5  # chroma quantization noise

    def test_non_multiple_of_8_dims(self):
        img = _gradient_rgb(13, 19)
        dec = decode_jpeg_baseline(encode_jpeg_baseline(img, 90))
        assert dec.shape == (13, 19, 3)

    def test_quality_ladder_monotone(self):
        img = _gradient_rgb()
        errs = []
        for q in (30, 60, 90):
            dec = decode_jpeg_baseline(encode_jpeg_baseline(img, q))
            errs.append(np.abs(dec.astype(int) - img.astype(int)).mean())
        assert errs[0] >= errs[1] >= errs[2]

    def test_noise_survives_q95(self):
        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (24, 24, 3), dtype=np.uint8)
        dec = decode_jpeg_baseline(encode_jpeg_baseline(img, 95))
        assert dec.shape == img.shape

    def test_restart_markers_are_transparent(self):
        img = _gradient_rgb()
        plain = decode_jpeg_baseline(encode_jpeg_baseline(img, 90))
        rst = encode_jpeg_baseline(img, 90, restart_interval=3)
        assert b"\xff\xdd" in rst and b"\xff\xd0" in rst
        assert (decode_jpeg_baseline(rst) == plain).all()


class TestMosaicOracle:
    def test_decode_matches_analytic_prediction(self):
        """200 random block-constant mosaics: the real entropy-coded path
        must agree with the scalar analytic oracle EXACTLY, per block."""
        import random

        rng = random.Random(9)
        for trial in range(200):
            bw, bh = rng.randrange(1, 5), rng.randrange(1, 4)
            q = rng.choice([60, 75, 90])
            grid = [
                [(rng.randrange(256), rng.randrange(256), rng.randrange(256)) for _ in range(bw)]
                for _ in range(bh)
            ]
            px = np.zeros((bh * 8, bw * 8, 3), np.uint8)
            for i in range(bh):
                for j in range(bw):
                    px[i * 8 : (i + 1) * 8, j * 8 : (j + 1) * 8] = grid[i][j]
            dec = decode_jpeg_baseline(encode_jpeg_baseline(px, q))
            for i in range(bh):
                for j in range(bw):
                    blk = dec[i * 8 : (i + 1) * 8, j * 8 : (j + 1) * 8]
                    assert (blk == blk[0, 0]).all(), (trial, i, j)
                    assert tuple(int(v) for v in blk[0, 0]) == mosaic_expected_color(
                        grid[i][j], q
                    ), (trial, i, j, grid[i][j], q)

    def test_fixture_truth_is_codec_independent(self):
        # the sidecar builder must rely on mosaic_expected_color only
        import ast
        import inspect

        import ocr_ray.ops.multimodal as mm

        src = inspect.getsource(mm.synth_jpeg_table)
        tree = ast.parse(src)
        names = {n.id for n in ast.walk(tree) if isinstance(n, ast.Name)}
        assert "decode_jpeg_baseline" not in names
        assert "decode_image" not in names


class TestMalformed:
    def test_not_jpeg(self):
        with pytest.raises(ValueError):
            decode_jpeg_baseline(b"nope")

    def test_progressive_rejected(self):
        raw = bytearray(encode_jpeg_baseline(_gradient_rgb(16, 16), 80))
        i = raw.find(b"\xff\xc0")
        raw[i + 1] = 0xC2  # masquerade as progressive
        with pytest.raises(NotImplementedError):
            decode_jpeg_baseline(bytes(raw))

    def test_truncated_entropy_data_is_valueerror_or_short(self):
        raw = encode_jpeg_baseline(_gradient_rgb(16, 16), 80)
        # chopping inside the entropy segment must not hang or crash with
        # anything other than ValueError (zero-fill decode may also finish)
        try:
            decode_jpeg_baseline(raw[: len(raw) // 2])
        except ValueError:
            pass

    def test_missing_huffman_table(self):
        raw = bytearray(encode_jpeg_baseline(_gradient_rgb(16, 16), 80))
        i = raw.find(b"\xff\xc4")
        raw[i + 1] = 0xE8  # turn first DHT into APP8 (skipped)
        with pytest.raises(ValueError):
            decode_jpeg_baseline(bytes(raw))


class TestGateSurface:
    def test_image_stats_matches_truth_sidecar(self):
        from ocr_ray.ops.multimodal import ImageStats, synth_jpeg_table

        images, truth = synth_jpeg_table(40)
        got = ImageStats()(images)
        cols = truth.column_names
        a = sorted(zip(*[got.column(c).to_pylist() for c in cols]))
        b = sorted(zip(*[truth.column(c).to_pylist() for c in cols]))
        assert a == b

    def test_decode_image_sniffs_jpeg(self):
        from ocr_ray.ops.multimodal import decode_image

        img = _gradient_rgb(16, 16)
        fmt, px = decode_image(encode_jpeg_baseline(img, 90))
        assert fmt == "jpeg" and px.shape == (16, 16, 3)
        g = (np.add.outer(np.arange(16), np.arange(16)) * 4).astype(np.uint8)
        fmt, px = decode_image(encode_jpeg_baseline(g, 90))
        assert fmt == "jpeg" and px.shape == (16, 16, 3)  # grey replicated

class Test420:
    """r5: real 4:2:0 files (the ubiquitous wild shape) through the
    decoder's generic multi-sampling MCU loop + replication upsampling."""

    def test_roundtrip_bounded(self):
        img = _gradient_rgb()
        dec = decode_jpeg_baseline(encode_jpeg_baseline(img, 90, subsampling="420"))
        assert dec.shape == img.shape
        assert np.abs(dec.astype(int) - img.astype(int)).mean() < 4.0

    def test_constant_tile_matches_analytic(self):
        # chroma 2x2 box-average of a constant is the same constant, so
        # the 4:4:4 analytic oracle applies to constant-color 420 tiles
        for rgb in [(200, 30, 90), (5, 250, 120), (128, 128, 128)]:
            tile = np.zeros((16, 16, 3), np.uint8)
            tile[:] = rgb
            dec = decode_jpeg_baseline(
                encode_jpeg_baseline(tile, 90, subsampling="420")
            )
            assert (dec == dec[0, 0]).all()
            assert tuple(int(v) for v in dec[0, 0]) == mosaic_expected_color(rgb, 90)

    def test_odd_dims(self):
        img = _gradient_rgb(13, 19)
        dec = decode_jpeg_baseline(encode_jpeg_baseline(img, 90, subsampling="420"))
        assert dec.shape == (13, 19, 3)

    def test_sof_declares_22(self):
        raw = encode_jpeg_baseline(_gradient_rgb(16, 16), 80, subsampling="420")
        i = raw.find(b"\xff\xc0")
        assert raw[i + 11] == 0x22  # Y sampling factors (2,2)

    def test_restart_markers_in_420(self):
        img = _gradient_rgb(48, 48)
        plain = decode_jpeg_baseline(encode_jpeg_baseline(img, 90, subsampling="420"))
        rst = decode_jpeg_baseline(
            encode_jpeg_baseline(img, 90, subsampling="420", restart_interval=2)
        )
        assert (plain == rst).all()

