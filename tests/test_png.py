"""From-scratch PNG codec (kernels/png.py) + real-decode media features."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from pdf_parser_spark.kernels.png import (
    PNG_SIGNATURE, PNGError, decode_png, encode_png,
)


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randint(0, 256, shape).astype(np.uint8)


class TestRoundtrip:
    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
    def test_all_color_types_and_filters(self, channels, filter_type):
        arr = _rand((13, 7, channels), seed=channels * 10 + filter_type)
        png = encode_png(arr, filter_type=filter_type)
        out = decode_png(png)
        assert out.shape == arr.shape
        assert np.array_equal(out, arr)

    def test_grayscale_2d_input(self):
        arr = _rand((5, 9), seed=3)
        out = decode_png(encode_png(arr, filter_type=4))
        assert out.shape == (5, 9, 1)
        assert np.array_equal(out[:, :, 0], arr)

    def test_single_pixel(self):
        arr = np.array([[[200, 100, 50]]], dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(arr)), arr)


class TestPalette:
    def _palette_png(self, idx, table):
        def chunk(tag, body):
            return (struct.pack(">I", len(body)) + tag + body
                    + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

        h, w = idx.shape
        rows = b"".join(b"\x00" + bytes(idx[y]) for y in range(h))
        return (PNG_SIGNATURE
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
                + chunk(b"PLTE", table.tobytes())
                + chunk(b"IDAT", zlib.compress(rows))
                + chunk(b"IEND", b""))

    def test_palette_expands_to_rgb(self):
        table = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
        idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)
        out = decode_png(self._palette_png(idx, table))
        assert out.shape == (2, 2, 3)
        assert np.array_equal(out, table[idx])

    def test_palette_index_out_of_range(self):
        table = np.array([[1, 2, 3]], dtype=np.uint8)
        idx = np.array([[0, 5]], dtype=np.uint8)
        with pytest.raises(PNGError, match="index out of range"):
            decode_png(self._palette_png(idx, table))


class TestRejects:
    def test_bad_signature(self):
        with pytest.raises(PNGError, match="signature"):
            decode_png(b"\xff\xd8\xff not a png at all" * 3)

    def test_16_bit_rejected(self):
        png = bytearray(encode_png(_rand((4, 4, 3))))
        png[8 + 8 + 8] = 16  # bit-depth byte in IHDR
        with pytest.raises(PNGError, match="bit depth"):
            decode_png(bytes(png))

    def test_interlaced_rejected(self):
        png = bytearray(encode_png(_rand((4, 4, 3))))
        png[8 + 8 + 12] = 1  # interlace byte in IHDR
        with pytest.raises(PNGError, match="interlaced"):
            decode_png(bytes(png))

    def test_truncated_idat(self):
        png = encode_png(_rand((6, 6, 3)))
        with pytest.raises(PNGError):
            decode_png(png[: len(png) // 2])


class TestRealDecodePath:
    def test_decode_image_dispatches_png(self):
        from pdf_parser_spark.operators.multimodal import decode_image

        arr = _rand((8, 8, 3), seed=1)
        assert np.array_equal(decode_image(encode_png(arr)), arr)
        with pytest.raises(NotImplementedError):
            decode_image(b"\x00\x00\x00\x20ftypmp42 video not supported")

    def test_media_features_real_decode(self, spark):
        from pdf_parser_spark.operators.multimodal import (
            _fake_features, media_features, pixel_features,
        )

        arr = _rand((10, 6, 3), seed=2)
        png = encode_png(arr, filter_type=2)
        jpeg = b"\xff\xd8\xff fake jpeg payload"
        df = spark.createDataFrame(
            [("png", bytearray(png)), ("jpg", bytearray(jpeg))],
            "url string, html binary",
        )
        rows = {r.url: r for r in media_features(df, real_decode=True).collect()}
        want_png = [pytest.approx(float(x), abs=1e-6)
                    for x in pixel_features(arr, 16)]
        assert list(rows["png"].features) == want_png
        # unsupported codec falls back to the digest featurizer, no task error
        want_jpg = [pytest.approx(float(x), abs=1e-6)
                    for x in _fake_features(jpeg, 16)]
        assert list(rows["jpg"].features) == want_jpg


class TestPixelFeatures:
    def test_hand_computed_vector(self):
        from pdf_parser_spark.operators.multimodal import pixel_features

        # 2x2 gray image [[0,255],[255,0]]: h=2 w=2 c=1, mean=127.5/255=0.5,
        # std=127.5/255=0.5; dim=5 leaves no grid cells
        arr = np.array([[0, 255], [255, 0]], dtype=np.uint8)[:, :, None]
        out = pixel_features(arr, 5)
        assert out.tolist() == [2.0, 2.0, 1.0, 0.5, 0.5]

    def test_tiny_image_grid_has_no_nan(self):
        # r3 regression: h < grid rows made array_split emit empty blocks
        # whose mean is NaN (floor(NaN) raises in Python, nulls in Spark)
        from pdf_parser_spark.operators.multimodal import pixel_features

        arr = np.arange(40, dtype=np.uint8)[None, :, None]  # 1 x 40
        out = pixel_features(arr, 16)
        assert np.isfinite(out).all()


class TestImgFixture:
    def test_fixture_idempotent_and_goldens_match_kernel(self, tmp_path):
        import math

        import pyarrow.parquet as pq

        from pdf_parser_spark.operators.multimodal import (
            _fake_features, decode_image, pixel_features,
        )
        from pdf_parser_spark.sources.img_fixture import ensure_img_fixture

        p1 = ensure_img_fixture(str(tmp_path))
        p2 = ensure_img_fixture(str(tmp_path))
        assert p1 == p2
        media = pq.read_table(p1).to_pydict()
        goldens = pq.read_table(
            p1.replace("media.parquet", "media_goldens.parquet")
        ).to_pydict()
        assert media["url"] == goldens["url"] and len(media["url"]) == 32
        # every golden row re-derives from the kernel functions; PNG rows
        # must be REAL pixel features (differ from the digest fallback)
        n_real = 0
        for url, payload, want in zip(
            media["url"], media["payload"], goldens["features_i"]
        ):
            try:
                feats = pixel_features(decode_image(bytes(payload)), 16)
                n_real += 1
            except Exception:
                feats = _fake_features(bytes(payload), 16)
            got = ",".join(
                str(math.floor(float(f) * 1_000_000)) for f in feats
            )
            assert got == want, url
        # 5 PNGs + 4 JPEGs (incl. progressive) + 2 GIFs + 3 WebPs + the
        # animated VP8X WebP decode for real; the corrupt png/gif/webp
        # rows and the 6 header-only dimension-gate rows (bmp/ico/tiff/
        # vp8x-header-only) fall to digest features
        assert n_real == 15
