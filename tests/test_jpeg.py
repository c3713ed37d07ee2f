"""From-scratch baseline JPEG codec tests (kernels/jpeg.py).

No codec library exists in this container, so correctness is established
differentially (encode -> decode must reproduce pixels within quantization
error at high quality) plus structural checks of the decoder's refusal
paths. The reference delegates media handling entirely; this codec backs
the real-decode path of operators/multimodal.media_features.
"""

from __future__ import annotations

import numpy as np
import pytest

from pdf_parser_spark.kernels.jpeg import (
    JPEG_SOI, JPEGError, decode_jpeg, encode_jpeg,
)


def _rgb(h, w):
    # smooth wrap-free gradients: modulo wrap would create a sharp edge
    # whose DCT ringing dwarfs quantization error and voids the bounds
    yy, xx = np.indices((h, w)).astype(np.float64)
    r = 20 + 180 * yy / max(h - 1, 1)
    g = 60 + 140 * xx / max(w - 1, 1)
    b = 10 + 170 * (yy + xx) / max(h + w - 2, 1)
    return np.stack([r, g, b], axis=2).astype(np.uint8)


class TestRoundTrip:
    def test_grayscale(self):
        g = (np.add.outer(np.arange(24) * 7, np.arange(33) * 3) % 256).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(g, quality=95))
        assert out.shape == (24, 33, 1)
        assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 3

    @pytest.mark.parametrize("sub", [(1, 1), (2, 1), (2, 2)])
    def test_rgb_subsampling(self, sub):
        rgb = _rgb(37, 50)
        out = decode_jpeg(encode_jpeg(rgb, quality=95, subsample=sub))
        assert out.shape == rgb.shape
        # smooth gradients survive high-quality quantization + chroma
        # averaging within a small bound; a Huffman/zigzag/IDCT bug would
        # blow this up by orders of magnitude
        assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 6

    def test_restart_markers(self):
        rgb = _rgb(37, 50)
        enc = encode_jpeg(rgb, quality=92, subsample=(2, 2), restart_interval=2)
        assert b"\xff\xdd" in enc and b"\xff\xd0" in enc
        out = decode_jpeg(enc)
        assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 8

    def test_odd_dimensions_and_flat(self):
        flat = np.full((9, 13, 3), 77, np.uint8)
        out = decode_jpeg(encode_jpeg(flat, quality=90))
        assert out.shape == (9, 13, 3)
        assert np.abs(out.astype(int) - 77).max() <= 1

    def test_single_pixel(self):
        px = np.array([[[200, 10, 90]]], dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(px, quality=95))
        assert out.shape == (1, 1, 3)
        assert np.abs(out.astype(int) - px.astype(int)).max() <= 4

    def test_deterministic(self):
        rgb = _rgb(16, 16)
        assert encode_jpeg(rgb, 90) == encode_jpeg(rgb, 90)
        a = decode_jpeg(encode_jpeg(rgb, 90))
        b = decode_jpeg(encode_jpeg(rgb, 90))
        assert np.array_equal(a, b)

    def test_quality_monotone_size(self):
        rgb = _rgb(40, 40)
        sizes = [len(encode_jpeg(rgb, q)) for q in (30, 60, 90)]
        assert sizes[0] < sizes[1] < sizes[2]


class TestProgressive:
    """SOF2: spectral selection + successive approximation + EOB runs.

    The differential contract is exact: a progressive stream carries the
    SAME quantized coefficients as the baseline stream at the same
    quality, so both must decode to IDENTICAL pixels — any slip in the
    bit-plane/EOB-run/correction-bit machinery breaks equality."""

    def test_rgb_equals_baseline(self):
        from pdf_parser_spark.kernels.jpeg import encode_jpeg_progressive

        rgb = _rgb(37, 50)
        prog = decode_jpeg(encode_jpeg_progressive(rgb, 90))
        base = decode_jpeg(encode_jpeg(rgb, 90))
        assert np.array_equal(prog, base)

    def test_grayscale_equals_baseline(self):
        from pdf_parser_spark.kernels.jpeg import encode_jpeg_progressive

        g = (np.add.outer(np.arange(24) * 7, np.arange(33) * 3) % 256).astype(np.uint8)
        assert np.array_equal(
            decode_jpeg(encode_jpeg_progressive(g, 85)),
            decode_jpeg(encode_jpeg(g, 85)),
        )

    @pytest.mark.parametrize("quality", [30, 60, 92, 99])
    def test_noise_sweep_equals_baseline(self, quality):
        # random noise exercises every symbol path: ZRLs, EOB runs across
        # blocks, long correction-bit chains, refinement windows
        from pdf_parser_spark.kernels.jpeg import encode_jpeg_progressive

        r = np.random.RandomState(11 + quality)
        for shape in ((29, 43, 3), (8, 8, 3), (1, 9, 3), (16, 16)):
            img = r.randint(0, 256, shape).astype(np.uint8)
            assert np.array_equal(
                decode_jpeg(encode_jpeg_progressive(img, quality)),
                decode_jpeg(encode_jpeg(img, quality)),
            ), (quality, shape)

    def test_sparse_blocks_exercise_eob_runs(self):
        # mostly-flat image with a few hot pixels -> long EOB runs with
        # interleaved correction bits in the refinement scans
        from pdf_parser_spark.kernels.jpeg import encode_jpeg_progressive

        img = np.full((48, 64, 3), 128, np.uint8)
        img[5, 7] = [255, 0, 0]
        img[40, 60] = [0, 255, 255]
        img[23, 31] = [0, 0, 255]
        assert np.array_equal(
            decode_jpeg(encode_jpeg_progressive(img, 75)),
            decode_jpeg(encode_jpeg(img, 75)),
        )

    def test_progressive_is_progressive(self):
        from pdf_parser_spark.kernels.jpeg import encode_jpeg_progressive

        enc = encode_jpeg_progressive(_rgb(16, 16), 90)
        assert b"\xff\xc2" in enc          # SOF2 marker
        assert enc.count(b"\xff\xda") == 10  # the 10-scan script

    def test_truncated_progressive(self):
        from pdf_parser_spark.kernels.jpeg import encode_jpeg_progressive

        enc = encode_jpeg_progressive(_rgb(20, 20), 90)
        with pytest.raises(JPEGError):
            decode_jpeg(enc[: len(enc) // 3])


class TestRefusals:
    def test_not_a_jpeg(self):
        with pytest.raises(JPEGError):
            decode_jpeg(b"\x89PNG definitely not jpeg")

    def test_truncated_entropy_data(self):
        enc = encode_jpeg(_rgb(16, 16), 90)
        with pytest.raises(JPEGError):
            decode_jpeg(enc[: len(enc) // 2])

    def test_arithmetic_refused(self):
        enc = bytearray(encode_jpeg(_rgb(16, 16), 90))
        i = enc.find(b"\xff\xc0")
        enc[i + 1] = 0xC9  # rewrite SOF0 -> SOF9 (arithmetic sequential)
        with pytest.raises(JPEGError):
            decode_jpeg(bytes(enc))

    def test_junk_after_soi(self):
        with pytest.raises(JPEGError):
            decode_jpeg(JPEG_SOI + b"\xff\xe0" + b"not really a jpeg" * 3)

    def test_missing_huffman_table(self):
        enc = bytearray(encode_jpeg(_rgb(16, 16), 90))
        # blank out the first DHT marker so the scan lacks tables
        i = enc.find(b"\xff\xc4")
        enc[i + 1] = 0xEF  # turn it into an APPn (skipped)
        with pytest.raises(JPEGError):
            decode_jpeg(bytes(enc))


class TestMediaIntegration:
    def test_decode_image_dispatches_jpeg(self):
        from pdf_parser_spark.operators.multimodal import decode_image

        rgb = _rgb(12, 12)
        out = decode_image(encode_jpeg(rgb, 95))
        assert out.shape == rgb.shape

    def test_media_features_real_jpeg(self, spark):
        from pdf_parser_spark.operators.multimodal import (
            _fake_features, decode_image, media_features, pixel_features,
        )

        rgb = _rgb(14, 18)
        jpg = encode_jpeg(rgb, 92)
        corrupt = JPEG_SOI + b"\xff\xe0 broken"
        df = spark.createDataFrame(
            [("jpg", bytearray(jpg)), ("bad", bytearray(corrupt))],
            "url string, html binary",
        )
        rows = {r.url: r for r in media_features(df, real_decode=True).collect()}
        want = [pytest.approx(float(x), abs=1e-6)
                for x in pixel_features(decode_image(jpg), 16)]
        assert list(rows["jpg"].features) == want
        want_bad = [pytest.approx(float(x), abs=1e-6)
                    for x in _fake_features(corrupt, 16)]
        assert list(rows["bad"].features) == want_bad
