"""From-scratch GIF codec tests (kernels/gif.py).

GIF is lossless over palette images, so differential testing is exact:
decode(encode(frames)) == frames, including LZW code-width growth, 12-bit
dictionary resets, interlacing, transparency and disposal compositing.
Backs the real multi-frame sampling path of operators/multimodal.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pdf_parser_spark.kernels.gif import (
    GIFError, _lzw_decode, _lzw_encode, decode_gif, decode_gif_first_frame,
    encode_gif,
)


def _frames(n=5, h=16, w=16):
    out = []
    for k in range(n):
        a = np.full((h, w, 3), 20, np.uint8)
        a[k:k + 5, k:k + 5] = [200, 30, 90]
        out.append(a)
    return out


class TestLZW:
    @pytest.mark.parametrize("mcs", [2, 4, 8])
    def test_round_trip(self, mcs):
        raw = bytes((i * 7) % (1 << mcs) for i in range(5000))
        assert bytes(_lzw_decode(_lzw_encode(raw, mcs), mcs, len(raw))) == raw

    def test_dictionary_overflow_reset(self):
        # 60k random bytes force multiple 12-bit dictionary resets
        raw = np.random.RandomState(7).randint(0, 256, 60000).astype(np.uint8).tobytes()
        assert bytes(_lzw_decode(_lzw_encode(raw, 8), 8, len(raw))) == raw

    def test_truncated_stream(self):
        enc = _lzw_encode(b"abcabcabc", 8)
        with pytest.raises(GIFError):
            _lzw_decode(enc[:2], 8, 9)


class TestRoundTrip:
    def test_single_frame_lossless(self):
        img = np.zeros((19, 31, 3), np.uint8)
        img[..., 0] = np.arange(31)[None, :] * 8 % 250
        img[..., 1] = 100
        frames = decode_gif(encode_gif(img))
        assert len(frames) == 1
        assert np.array_equal(frames[0], img)

    def test_animation_lossless(self):
        f = _frames(6)
        dec = decode_gif(encode_gif(f, delay_cs=4))
        assert len(dec) == 6
        for a, b in zip(dec, f):
            assert np.array_equal(a, b)

    def test_two_color_image(self):
        img = np.zeros((8, 8, 3), np.uint8)
        img[::2] = 255
        assert np.array_equal(decode_gif_first_frame(encode_gif(img)), img)

    def test_single_pixel(self):
        img = np.array([[[9, 8, 7]]], dtype=np.uint8)
        assert np.array_equal(decode_gif_first_frame(encode_gif(img)), img)

    def test_deterministic(self):
        f = _frames(3)
        assert encode_gif(f) == encode_gif(f)


class TestSpecFeatures:
    def test_interlaced_frame(self):
        # hand-build an interlaced image descriptor: encode normally, then
        # re-encode the index rows in interlace pass order with flag 0x40
        img = np.stack([np.arange(8, dtype=np.uint8) * 30] * 8)[:, :, None]
        rgb = np.repeat(img, 3, axis=2)
        plain = encode_gif(rgb)
        frames = decode_gif(plain)
        assert np.array_equal(frames[0], rgb)
        # interlace row order for h=8: 0, 4, 2, 6, 1, 3, 5, 7
        order = [0, 4, 2, 6, 1, 3, 5, 7]
        colors = np.unique(rgb.reshape(-1, 3), axis=0)
        lut = {tuple(c): i for i, c in enumerate(colors)}
        idx = np.array([[lut[tuple(px)] for px in row] for row in rgb],
                       dtype=np.uint8)
        shuffled = idx[order]
        nbits = max(int(len(colors) - 1).bit_length(), 1)
        palette = np.zeros((1 << nbits, 3), np.uint8)
        palette[: len(colors)] = colors
        mcs = max(nbits, 2)
        out = bytearray(b"GIF89a")
        out += struct.pack("<HHBBB", 8, 8, 0x80 | (nbits - 1), 0, 0)
        out += palette.tobytes()
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 8, 8, 0x40)
        out += bytes([mcs])
        lzw = _lzw_encode(shuffled.tobytes(), mcs)
        for i in range(0, len(lzw), 255):
            out += bytes([len(lzw[i:i + 255])]) + lzw[i:i + 255]
        out += b"\x00\x3b"
        dec = decode_gif(bytes(out))
        assert np.array_equal(dec[0], rgb)

    def test_transparency_composites_over_previous(self):
        # frame 2 marks palette index of color A transparent: those pixels
        # must keep frame 1's pixels
        f1 = np.full((4, 4, 3), 10, np.uint8)
        f2 = np.full((4, 4, 3), 10, np.uint8)
        f2[0, 0] = [99, 98, 97]
        enc = bytearray(encode_gif([f1, f2]))
        # find the second GCE (0x21 0xF9) and set transparency on index of
        # color 10 (palette order: [10,10,10] < [99,98,97] -> index 0)
        gce = [i for i in range(len(enc) - 1)
               if enc[i] == 0x21 and enc[i + 1] == 0xF9]
        assert len(gce) == 2
        i = gce[1]
        enc[i + 3] |= 0x01  # transparency flag
        enc[i + 6] = 0      # transparent index = 0 (the background color)
        dec = decode_gif(bytes(enc))
        # all index-0 pixels of frame 2 were transparent -> frame 1 shows
        # through (identical here), the [99,98,97] pixel still lands
        assert np.array_equal(dec[1], f2)

    def test_palette_cap(self):
        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)
        if len(np.unique(img.reshape(-1, 3), axis=0)) > 256:
            with pytest.raises(GIFError, match="palette"):
                encode_gif(img)


class TestRefusals:
    def test_not_a_gif(self):
        with pytest.raises(GIFError):
            decode_gif(b"\x89PNG not a gif")

    def test_truncated(self):
        enc = encode_gif(_frames(2))
        with pytest.raises(GIFError):
            decode_gif(enc[:20])

    def test_no_image_data(self):
        with pytest.raises(GIFError):
            decode_gif(b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0, 0, 0) + b"\x3b")


class TestFrameSampleIntegration:
    def test_real_frames_vs_digest(self, spark):
        from pdf_parser_spark.operators.multimodal import (
            frame_feature_rows, frame_sample, pixel_features,
        )

        f = _frames(6)
        gif = encode_gif(f, delay_cs=5)
        df = spark.createDataFrame(
            [("anim", bytearray(gif)), ("junk", bytearray(b"not a gif"))],
            "url string, html binary",
        )
        rows = frame_sample(df, n_frames=4, dim=8, real_decode=True).collect()
        by_url: dict = {}
        for r in rows:
            by_url.setdefault(r.url, {})[r.frame_idx] = list(r.frame_features)
        # animated: frame i samples composited frame floor(i*6/4)
        for i in range(4):
            want = [pytest.approx(float(x), abs=1e-6)
                    for x in pixel_features(f[(i * 6) // 4], 8)]
            assert by_url["anim"][i] == want
        # non-GIF falls back to the digest features (shared helper agrees)
        want_junk = frame_feature_rows(b"not a gif", 4, 8, real_decode=True)
        for i in range(4):
            assert by_url["junk"][i] == [pytest.approx(x, abs=1e-6)
                                         for x in want_junk[i]]
