"""VP8L (lossless WebP) codec tests.

The GIF round-3 lesson (VERDICT r3 item 1): an encoder/decoder pair can
share a wrong convention and still round-trip, so losslessness alone is not
an anchor. Here the conventions are pinned to the spec three independent
ways:

1. `test_spec_anchor_*`: VP8L streams built BIT BY BIT in this file from
   the spec text (its own LSB-first writer, no codec imports in the
   builder) must decode to known pixels — pins bit order, header layout,
   simple-code layout, and the canonical code assignment.
2. `test_distance_map_spec_prefix`: the generated close-neighborhood table
   must reproduce the spec's published entries verbatim.
3. Property round-trips per decoder path (literal / cache / LZ77 /
   neighbor codes / palette+bundling / all 14 predictors / cross-color /
   subtract-green / stacked) — with the conventions anchored by 1 and 2,
   round-trip failures localize real bugs.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_spark.kernels.webp import (
    DISTANCE_MAP,
    WebPError,
    decode_vp8l,
    decode_webp,
    encode_vp8l,
    encode_webp_vp8l,
    webp_dimensions,
)


class _SpecBits:
    """Independent LSB-first bit builder (spec: 'bits are read starting
    from the least-significant bit of each byte')."""

    def __init__(self):
        self.bits: list = []

    def put(self, value: int, n: int) -> None:
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def put_code_msb_first(self, code: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


def _simple_code_1(bits: _SpecBits, symbol: int) -> None:
    """Spec 'simple code length code' with one symbol."""
    bits.put(1, 1)                       # simple
    bits.put(0, 1)                       # num_symbols - 1 = 0
    if symbol <= 1:
        bits.put(0, 1)                   # first symbol in 1 bit
        bits.put(symbol, 1)
    else:
        bits.put(1, 1)                   # first symbol in 8 bits
        bits.put(symbol, 8)


class TestSpecAnchor:
    def test_spec_anchor_single_pixel(self):
        # 1x1 image, ARGB=(255,1,2,3), no transforms, trivial prefix codes
        b = _SpecBits()
        b.put(0x2F, 8)                   # signature
        b.put(0, 14)                     # width - 1
        b.put(0, 14)                     # height - 1
        b.put(0, 1)                      # alpha hint
        b.put(0, 3)                      # version
        b.put(0, 1)                      # no transforms
        b.put(0, 1)                      # no color cache
        b.put(0, 1)                      # no meta prefix image
        _simple_code_1(b, 2)             # green = 2
        _simple_code_1(b, 1)             # red = 1
        _simple_code_1(b, 3)             # blue = 3
        _simple_code_1(b, 255)           # alpha = 255
        _simple_code_1(b, 0)             # distance (unused, must be valid)
        # payload: all five codes are single-symbol -> zero bits
        out = decode_vp8l(b.bytes())
        assert out.shape == (1, 1, 4)
        assert out[0, 0].tolist() == [1, 2, 3, 255]  # RGBA

    def test_spec_anchor_two_symbol_simple_code(self):
        # 2x1 image: greens 7 then 9 via a 2-symbol simple code; code 0 is
        # the FIRST listed symbol (one bit per pixel: 0 -> 7, 1 -> 9)
        b = _SpecBits()
        b.put(0x2F, 8)
        b.put(1, 14)                     # width - 1 = 1
        b.put(0, 14)
        b.put(0, 1)
        b.put(0, 3)
        b.put(0, 1)                      # no transforms
        b.put(0, 1)                      # no cache
        b.put(0, 1)                      # no meta
        b.put(1, 1)                      # green: simple
        b.put(1, 1)                      # two symbols
        b.put(1, 1)                      # first in 8 bits
        b.put(7, 8)                      # symbol[0] = 7
        b.put(9, 8)                      # symbol[1] = 9
        _simple_code_1(b, 20)            # red
        _simple_code_1(b, 30)            # blue
        _simple_code_1(b, 255)           # alpha
        _simple_code_1(b, 0)             # distance
        # pixel 0: green code 0 -> 7; pixel 1: green code 1 -> 9
        b.put(0, 1)
        b.put(1, 1)
        out = decode_vp8l(b.bytes())
        assert out[0, 0].tolist() == [20, 7, 30, 255]
        assert out[0, 1].tolist() == [20, 9, 30, 255]

    def test_spec_anchor_subtract_green(self):
        # 1x1, subtract-green transform: coded (r=10, g=100, b=200) must
        # reconstruct r=(10+100)&255=110, b=(200+100)&255=44
        b = _SpecBits()
        b.put(0x2F, 8)
        b.put(0, 14)
        b.put(0, 14)
        b.put(0, 1)
        b.put(0, 3)
        b.put(1, 1)                      # transform present
        b.put(2, 2)                      # SUBTRACT_GREEN
        b.put(0, 1)                      # no more transforms
        b.put(0, 1)                      # no cache
        b.put(0, 1)                      # no meta
        _simple_code_1(b, 100)           # green
        _simple_code_1(b, 10)            # red
        _simple_code_1(b, 200)           # blue
        _simple_code_1(b, 255)           # alpha
        _simple_code_1(b, 0)
        out = decode_vp8l(b.bytes())
        assert out[0, 0].tolist() == [110, 100, 44, 255]

    def test_spec_anchor_color_cache_order_and_hash(self):
        # 2x1 image, both pixels ARGB(255,5,17,33); pixel 1 is a color-cache
        # hit. Pins three conventions at once: color-cache-info comes BEFORE
        # the meta-prefix bit (a meta-first decoder would misread the cache
        # present-bit as meta and consume 3 precision bits), the cache hash
        # (0x1E35A7BD * argb) >> (32 - bits), and the normal-code
        # (code-length-code) machinery with canonical assignment.
        argb = (255 << 24) | (5 << 16) | (17 << 8) | 33
        cache_bits = 1
        idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)
        b = _SpecBits()
        b.put(0x2F, 8)
        b.put(1, 14)                     # width - 1 = 1
        b.put(0, 14)
        b.put(0, 1)
        b.put(0, 3)
        b.put(0, 1)                      # no transforms
        b.put(1, 1)                      # color cache present
        b.put(cache_bits, 4)
        b.put(0, 1)                      # no meta prefix image
        # green: NORMAL code over alphabet 256+24+2; symbols 17 and
        # 280+idx both get length 1 -> canonical codes 0 and 1
        b.put(0, 1)                      # not simple
        b.put(0, 4)                      # num_code_lengths = 4
        for l in (0, 0, 1, 1):           # order 17,18,0,1 -> lens 0,0,1,1
            b.put(l, 3)
        b.put(0, 1)                      # no max-symbol cap
        sym_cache = 280 + idx
        for s in range(282):             # cl syms 0/1 are 1-bit codes 0/1
            b.put_code_msb_first(1 if s in (17, sym_cache) else 0, 1)
        _simple_code_1(b, 5)             # red
        _simple_code_1(b, 33)            # blue
        _simple_code_1(b, 255)           # alpha
        _simple_code_1(b, 0)             # distance
        b.put_code_msb_first(0, 1)       # pixel 0: literal green 17
        b.put_code_msb_first(1, 1)       # pixel 1: cache hit
        out = decode_vp8l(b.bytes())
        assert out[0, 0].tolist() == [5, 17, 33, 255]
        assert out[0, 1].tolist() == [5, 17, 33, 255]

    def test_plane_code_distance_formula(self):
        # Spec/libwebp: dist = xoffset + yoffset * xsize where the pair
        # order is DISTANCE_MAP's and positive xoffset means columns to the
        # LEFT (kCodeToPlane xoffset = 8 - (code & 0xF)). Hand-computed
        # values for the first 8 codes at xsize=10:
        #   (0,1)->10 (1,0)->1 (1,1)->11 (-1,1)->9
        #   (0,2)->20 (2,0)->2 (1,2)->21 (-1,2)->19
        # The r4-advised failure mode was a sign flip (dy*xsize - dx) that
        # swapped paired codes 3/4 and 7/8 — this anchor kills it.
        from pdf_parser_spark.kernels.webp import _plane_code_to_distance
        got = [_plane_code_to_distance(10, c) for c in range(1, 9)]
        assert got == [10, 1, 11, 9, 20, 2, 21, 19]
        # clamp to >= 1: code 4 is (-1, 1), at xsize=1 the raw dist is 0
        assert _plane_code_to_distance(1, 4) == 1
        # codes > 120 encode dist - 120 directly
        assert _plane_code_to_distance(10, 121) == 1
        assert _plane_code_to_distance(10, 160) == 40

    def test_spec_anchor_lz77_plane_code(self):
        # 3x2 image; pixels 0..3 are literals distinguished by (red, blue),
        # pixels 4..5 are one LZ77 copy of length 2 with distance PLANE
        # CODE 3 = offset (1, 1) -> dist = 1*3 + 1 = 4, so p4 copies p0 and
        # p5 copies p1. A sign-flipped conversion (dist = 3 - 1 = 2) would
        # copy p2/p3 instead — different reds/blues.
        b = _SpecBits()
        b.put(0x2F, 8)
        b.put(2, 14)                     # width - 1 = 2
        b.put(1, 14)                     # height - 1 = 1
        b.put(0, 1)                      # alpha hint
        b.put(0, 3)                      # version
        b.put(0, 1)                      # no transforms
        b.put(0, 1)                      # no color cache
        b.put(0, 1)                      # no meta prefix image
        # green: NORMAL code; symbols 0 (literal) and 257 (length-2 copy)
        # both length 1 -> canonical codes 0 and 1 (same CL machinery as
        # the color-cache anchor above)
        b.put(0, 1)                      # not simple
        b.put(0, 4)                      # num_code_lengths = 4
        for l in (0, 0, 1, 1):           # CL order 17,18,0,1 -> lens
            b.put(l, 3)
        b.put(0, 1)                      # no max-symbol cap
        for s in range(280):             # alphabet 256 + 24 (no cache)
            b.put_code_msb_first(1 if s in (0, 257) else 0, 1)
        # red: simple 2-symbol {1, 2}
        b.put(1, 1); b.put(1, 1)         # simple, two symbols
        b.put(0, 1); b.put(1, 1)         # first symbol '1' in 1 bit
        b.put(2, 8)                      # second symbol
        # blue: simple 2-symbol {5, 6}
        b.put(1, 1); b.put(1, 1)
        b.put(1, 1); b.put(5, 8)         # first symbol '5' needs 8 bits
        b.put(6, 8)
        _simple_code_1(b, 255)           # alpha
        _simple_code_1(b, 2)             # distance: prefix symbol 2 -> 3
        # payload: 4 literals (green, red, blue bits), then the copy
        for rbit, bbit in ((0, 0), (1, 0), (0, 1), (1, 1)):
            b.put_code_msb_first(0, 1)   # green literal 0
            b.put_code_msb_first(rbit, 1)
            b.put_code_msb_first(bbit, 1)
        b.put_code_msb_first(1, 1)       # green symbol 257: length code 1
        # -> length 2, no extra bits; distance code is single-symbol (0
        # bits) -> prefix symbol 2 -> dist code 3 -> plane code 3
        out = decode_vp8l(b.bytes())
        assert out.shape == (2, 3, 4)
        assert out[0, 0].tolist() == [1, 0, 5, 255]
        assert out[0, 1].tolist() == [2, 0, 5, 255]
        assert out[0, 2].tolist() == [1, 0, 6, 255]
        assert out[1, 0].tolist() == [2, 0, 6, 255]
        assert out[1, 1].tolist() == [1, 0, 5, 255]   # copy of p0
        assert out[1, 2].tolist() == [2, 0, 5, 255]   # copy of p1

    def test_spec_anchor_predictor_tr_right_edge(self):
        # 2x2 image under the predictor transform, one 4x4 tile with mode 3
        # (TR). For the bottom-right pixel (rightmost column) the spec's TR
        # is top_row[x+1], which in the contiguous framebuffer is the
        # CURRENT row's first pixel — not the top pixel. Residuals are
        # chosen so the wrong fallback changes the decoded green (40 vs 80).
        b = _SpecBits()
        b.put(0x2F, 8)
        b.put(1, 14)                     # width - 1 = 1
        b.put(1, 14)                     # height - 1 = 1
        b.put(0, 1)
        b.put(0, 3)
        b.put(1, 1)                      # transform present
        b.put(0, 2)                      # PREDICTOR transform
        b.put(0, 3)                      # size_bits - 2 = 0 -> 4x4 tiles
        # 1x1 tile sub-image (entropy-coded: cache-info, codes, no meta)
        b.put(0, 1)                      # no color cache
        _simple_code_1(b, 3)             # tile green = predictor mode 3
        _simple_code_1(b, 0)             # red
        _simple_code_1(b, 0)             # blue
        _simple_code_1(b, 0)             # alpha
        _simple_code_1(b, 0)             # distance
        b.put(0, 1)                      # no more transforms
        b.put(0, 1)                      # no color cache (main image)
        b.put(0, 1)                      # no meta prefix image
        # residual codes: green {0,40}, red {0,7}, blue {0,9}, alpha {0}
        b.put(1, 1); b.put(1, 1); b.put(0, 1); b.put(0, 1); b.put(40, 8)
        b.put(1, 1); b.put(1, 1); b.put(0, 1); b.put(0, 1); b.put(7, 8)
        b.put(1, 1); b.put(1, 1); b.put(0, 1); b.put(0, 1); b.put(9, 8)
        _simple_code_1(b, 0)             # alpha
        _simple_code_1(b, 0)             # distance
        # residual payload (green, red, blue bits per pixel):
        # p00=(g0,r0,b0) p01=(0,0,0) p10=(40,0,0) p11=(40,7,9)
        for gbit, rbit, bbit in ((0, 0, 0), (0, 0, 0), (1, 0, 0), (1, 1, 1)):
            b.put_code_msb_first(gbit, 1)
            b.put_code_msb_first(rbit, 1)
            b.put_code_msb_first(bbit, 1)
        out = decode_vp8l(b.bytes())
        # (0,0): BLACK pred; (0,1): left; (1,0): top; (1,1): mode 3 TR ->
        # current row's first pixel (255,0,40,0) -> (255,7,80,9)
        assert out[0, 0].tolist() == [0, 0, 0, 255]
        assert out[0, 1].tolist() == [0, 0, 0, 255]
        assert out[1, 0].tolist() == [0, 40, 0, 255]
        assert out[1, 1].tolist() == [7, 80, 9, 255]

    def test_distance_map_spec_prefix(self):
        # first rows of the spec's published distance-mapping table
        spec = [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2),
                (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0),
                (1, 3), (-1, 3), (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2),
                (-3, 2), (0, 4), (4, 0), (1, 4), (-1, 4), (4, 1), (-4, 1),
                (3, 3), (-3, 3), (2, 4), (-2, 4), (4, 2), (-4, 2), (0, 5)]
        assert DISTANCE_MAP[: len(spec)] == spec
        assert len(DISTANCE_MAP) == 120
        assert len(set(DISTANCE_MAP)) == 120


def _rt(img: np.ndarray, **kw) -> None:
    data = encode_webp_vp8l(img, **kw)
    out = decode_webp(data)
    want = img if img.shape[2] == 4 else np.dstack(
        [img, np.full(img.shape[:2], 255, np.uint8)])
    assert np.array_equal(out, want), kw


_dims = st.integers(min_value=1, max_value=20)
_seed = st.integers(min_value=0, max_value=2 ** 31 - 1)


class TestRoundTrip:
    @settings(max_examples=10, deadline=None)
    @given(h=_dims, w=_dims, seed=_seed,
           cache_bits=st.sampled_from([0, 1, 4, 8]),
           lz77=st.booleans(), neighbor=st.booleans(),
           subg=st.booleans())
    def test_entropy_paths_lossless(self, h, w, seed, cache_bits, lz77,
                                    neighbor, subg):
        rng = np.random.RandomState(seed)
        # low-entropy value pool so LZ77/cache paths actually trigger
        img = rng.choice([0, 7, 64, 200, 255], size=(h, w, 4)).astype(np.uint8)
        _rt(img, cache_bits=cache_bits, use_lz77=lz77,
            use_neighbor_codes=neighbor, subtract_green=subg)

    @settings(max_examples=10, deadline=None)
    @given(h=_dims, w=_dims, seed=_seed,
           n_colors=st.sampled_from([1, 2, 3, 4, 5, 16, 17, 250]))
    def test_palette_bundling_lossless(self, h, w, seed, n_colors):
        rng = np.random.RandomState(seed)
        pal = rng.randint(0, 256, (n_colors, 4)).astype(np.uint8)
        img = pal[rng.randint(0, n_colors, (h, w))]
        _rt(img, palette=True)

    @settings(max_examples=8, deadline=None)
    @given(h=_dims, w=_dims, seed=_seed,
           mode=st.integers(min_value=0, max_value=13))
    def test_all_predictors_lossless(self, h, w, seed, mode):
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, (h, w, 4)).astype(np.uint8)
        _rt(img, predictor=mode)

    @settings(max_examples=8, deadline=None)
    @given(seed=_seed, g2r=st.integers(0, 255), g2b=st.integers(0, 255),
           r2b=st.integers(0, 255))
    def test_cross_color_lossless(self, seed, g2r, g2b, r2b):
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, (9, 13, 4)).astype(np.uint8)
        _rt(img, color_transform=(g2r, g2b, r2b))

    def test_stacked_transforms(self):
        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, (15, 11, 4)).astype(np.uint8)
        _rt(img, subtract_green=True, predictor=11, cache_bits=6,
            use_lz77=True, use_neighbor_codes=True)
        _rt(img, color_transform=(12, 240, 77), predictor=13)

    def test_rgb_input_gains_opaque_alpha(self):
        img = np.arange(60, dtype=np.uint8).reshape(4, 5, 3)
        out = decode_webp(encode_webp_vp8l(img))
        assert np.array_equal(out[..., :3], img)
        assert (out[..., 3] == 255).all()

    def test_dimensions_probe(self):
        img = np.zeros((3, 200, 4), np.uint8)
        assert webp_dimensions(encode_webp_vp8l(img)) == (200, 3)


class TestErrors:
    def test_not_riff(self):
        with pytest.raises(WebPError):
            decode_webp(b"JUNKJUNKJUNKJUNK")

    def test_riff_without_vp8l(self):
        data = b"RIFF" + (12).to_bytes(4, "little") + b"WEBP" \
            + b"VP8 " + (0).to_bytes(4, "little")
        with pytest.raises(WebPError):
            decode_webp(data)

    def test_truncated_stream(self):
        good = encode_webp_vp8l(np.zeros((6, 6, 4), np.uint8),
                                subtract_green=True)
        with pytest.raises(WebPError):
            decode_webp(good[: len(good) - 2])

    def test_bad_signature(self):
        with pytest.raises(WebPError):
            decode_vp8l(b"\x00\x01\x02\x03")

    def test_oversubscribed_prefix_code_rejected(self):
        # normal code whose lengths violate kraft: lengths [1, 1, 1]
        b = _SpecBits()
        b.put(0x2F, 8)
        b.put(0, 14)
        b.put(0, 14)
        b.put(0, 1)
        b.put(0, 3)
        b.put(0, 1)      # no transforms
        b.put(0, 1)      # no cache
        b.put(0, 1)      # no meta
        b.put(0, 1)      # green: normal code
        # code-length code: symbol 1 -> len 1 and symbol 0 -> len 1
        # (order is 17,18,0,1,...): transmit 4 entries: 17:0 18:0 0:1 1:1
        b.put(0, 4)      # num_code_lengths - 4 = 0 -> 4 entries
        for l in (0, 0, 1, 1):
            b.put(l, 3)
        b.put(0, 1)      # no max-symbol cap
        # lengths for green symbols 0..2 = 1,1,1 then a huge zero-repeat
        # would follow; the kraft check must fire before that matters
        for _ in range(3):
            b.put_code_msb_first(1, 1)   # cl symbol 1 => length 1
        # pad remaining alphabet with zeros (cl symbol 0, code 0)
        for _ in range(277):
            b.put_code_msb_first(0, 1)
        with pytest.raises(WebPError):
            decode_vp8l(b.bytes())

    def test_decode_image_routes_webp(self):
        from pdf_parser_spark.operators.multimodal import decode_image

        img = np.full((5, 4, 4), 9, np.uint8)
        out = decode_image(encode_webp_vp8l(img))
        assert np.array_equal(out, img)

    def test_lossy_vp8_raises_not_vp8l(self):
        data = b"RIFF" + (16).to_bytes(4, "little") + b"WEBP" \
            + b"VP8 " + (4).to_bytes(4, "little") + b"\x00\x00\x00\x00"
        with pytest.raises(WebPError, match="lossy"):
            decode_webp(data)


# ---------------------------------------------------------------------------
# animated / extended (VP8X + ANIM + ANMF) container — round 5
# ---------------------------------------------------------------------------

def _chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return fourcc + len(body).to_bytes(4, "little") + body + pad


def _webp_file(*chunks: bytes) -> bytes:
    body = b"WEBP" + b"".join(chunks)
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def _vp8x(w: int, h: int, flags: int = 0x02) -> bytes:
    return _chunk(b"VP8X", bytes((flags, 0, 0, 0))
                  + (w - 1).to_bytes(3, "little")
                  + (h - 1).to_bytes(3, "little"))


def _anim(bg_bgra: int = 0, loops: int = 0) -> bytes:
    return _chunk(b"ANIM", bg_bgra.to_bytes(4, "little")
                  + loops.to_bytes(2, "little"))


def _anmf(x: int, y: int, img, dur: int = 40, no_blend: bool = True,
          dispose_bg: bool = False, fourcc: bytes = b"VP8L") -> bytes:
    from pdf_parser_spark.kernels.webp import encode_vp8l

    h, w = img.shape[:2]
    stream = encode_vp8l(img) if fourcc == b"VP8L" else b"\x00lossy"
    hdr = ((x // 2).to_bytes(3, "little") + (y // 2).to_bytes(3, "little")
           + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little")
           + dur.to_bytes(3, "little")
           + bytes(((0x02 if no_blend else 0) | (0x01 if dispose_bg else 0),)))
    return _chunk(b"ANMF", hdr + _chunk(fourcc, stream))


def _solid(h, w, rgba):
    return np.tile(np.array(rgba, np.uint8), (h, w, 1))


class TestAnimatedWebP:
    """Container conventions anchored by files assembled field-by-field
    IN THIS FILE (chunk sizes, 2-pixel frame offsets, minus-one canvas
    fields, B/D flag bits, ANIM BGRA background) — only the embedded
    VP8L pixel streams come from the kernel encoder, whose pixel
    conventions the spec anchors above already pin."""

    def test_parse_container_fields(self):
        from pdf_parser_spark.kernels.webp import parse_webp_container

        f1 = _solid(6, 8, (1, 2, 3, 255))
        data = _webp_file(_vp8x(8, 6), _anim(bg_bgra=0xFF112233, loops=3),
                          _anmf(0, 0, f1, dur=120),
                          _anmf(2, 2, _solid(2, 4, (9, 9, 9, 255)), dur=80))
        info = parse_webp_container(data)
        assert (info["kind"], info["canvas_w"], info["canvas_h"]) == \
            ("extended", 8, 6)
        assert info["flags"]["animation"] and not info["flags"]["alpha"]
        assert (info["background_bgra"], info["loop_count"]) == (0xFF112233, 3)
        assert [(f["x"], f["y"], f["w"], f["h"], f["duration_ms"])
                for f in info["frames"]] == [(0, 0, 8, 6, 120), (2, 2, 4, 2, 80)]

    def test_two_full_frames_overwrite(self):
        from pdf_parser_spark.kernels.webp import decode_webp_frames

        f1 = _solid(4, 6, (10, 20, 30, 255))
        f2 = _solid(4, 6, (40, 50, 60, 255))
        frames = decode_webp_frames(_webp_file(
            _vp8x(6, 4), _anim(), _anmf(0, 0, f1), _anmf(0, 0, f2)))
        assert len(frames) == 2
        assert np.array_equal(frames[0], f1)
        assert np.array_equal(frames[1], f2)

    def test_patch_frame_at_offset(self):
        from pdf_parser_spark.kernels.webp import decode_webp, decode_webp_frames

        base = _solid(6, 8, (100, 110, 120, 255))
        patch = _solid(2, 4, (7, 8, 9, 255))
        data = _webp_file(_vp8x(8, 6), _anim(),
                          _anmf(0, 0, base), _anmf(2, 2, patch))
        frames = decode_webp_frames(data)
        want = base.copy()
        want[2:4, 2:6] = patch
        assert np.array_equal(frames[1], want)
        # decode_webp on an animated file = first composited frame
        assert np.array_equal(decode_webp(data), base)

    def test_dispose_to_background(self):
        from pdf_parser_spark.kernels.webp import decode_webp_frames

        # bg BGRA 0xFF552211 -> RGBA (0x22, 0x55, 0x11, 0xFF)... BGRA
        # little-endian field order: B=0x11 G=0x22 R=0x55 A=0xFF
        bg = 0xFF552211
        f1 = _solid(4, 4, (1, 1, 1, 255))
        patch = _solid(2, 2, (9, 9, 9, 255))
        frames = decode_webp_frames(_webp_file(
            _vp8x(4, 4), _anim(bg_bgra=bg),
            _anmf(0, 0, f1, dispose_bg=True), _anmf(0, 0, patch)))
        want = np.tile(np.array((0x55, 0x22, 0x11, 0xFF), np.uint8), (4, 4, 1))
        want[0:2, 0:2] = patch
        assert np.array_equal(frames[1], want)

    def test_alpha_blend_exact(self):
        from pdf_parser_spark.kernels.webp import decode_webp_frames

        # alpha 51 over opaque: out = 0.2*src + 0.8*dst, exact integers
        dst = _solid(2, 2, (200, 100, 50, 255))
        src = _solid(2, 2, (10, 60, 110, 51))
        frames = decode_webp_frames(_webp_file(
            _vp8x(2, 2), _anim(),
            _anmf(0, 0, dst), _anmf(0, 0, src, no_blend=False)))
        assert frames[1][0, 0].tolist() == [162, 92, 62, 255]

    def test_lossy_frame_raises_typed(self):
        from pdf_parser_spark.kernels.webp import WebPError, decode_webp_frames

        f1 = _solid(2, 2, (1, 2, 3, 255))
        data = _webp_file(_vp8x(2, 2), _anim(),
                          _anmf(0, 0, f1, fourcc=b"VP8 "))
        with pytest.raises(WebPError):
            decode_webp_frames(data)

    def test_frame_exceeding_canvas_raises(self):
        from pdf_parser_spark.kernels.webp import WebPError, decode_webp_frames

        with pytest.raises(WebPError):
            decode_webp_frames(_webp_file(
                _vp8x(4, 4), _anim(),
                _anmf(2, 2, _solid(4, 4, (1, 1, 1, 255)))))

    def test_vp8x_header_only_raises_typed(self):
        from pdf_parser_spark.kernels.webp import WebPError, decode_webp_frames

        with pytest.raises(WebPError):
            decode_webp_frames(_webp_file(_vp8x(400, 260)))
