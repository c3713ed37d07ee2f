"""Property-based invariants for the from-scratch codecs.

Each codec has a hard invariant that holds for EVERY input, so hypothesis
shrinks any violation to a minimal reproducer:
- PNG and GIF are lossless: decode(encode(x)) == x.
- JPEG: the progressive stream must decode to exactly the baseline
  stream's pixels at the same quality (same coefficients, different
  transmission order).
- MP4: build -> parse round-trips every metadata field.
Examples are capped small — the deterministic test files carry the broad
sweeps; these runs shrink corner cases (1-pixel dims, few colors, odd
block remainders).
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

_dims = st.integers(min_value=1, max_value=24)


@settings(max_examples=12, deadline=None)
@given(h=_dims, w=_dims, c=st.sampled_from([1, 2, 3, 4]),
       ftype=st.integers(min_value=0, max_value=4),
       seed=st.integers(min_value=0, max_value=2 ** 31 - 1))
def test_png_lossless(h, w, c, ftype, seed):
    from pdf_parser_spark.kernels.png import decode_png, encode_png

    arr = np.random.RandomState(seed).randint(0, 256, (h, w, c)).astype(np.uint8)
    assert np.array_equal(decode_png(encode_png(arr, filter_type=ftype)), arr)


@settings(max_examples=12, deadline=None)
@given(h=_dims, w=_dims, n_frames=st.integers(min_value=1, max_value=4),
       n_colors=st.integers(min_value=2, max_value=17),
       seed=st.integers(min_value=0, max_value=2 ** 31 - 1))
def test_gif_lossless(h, w, n_frames, n_colors, seed):
    from pdf_parser_spark.kernels.gif import decode_gif, encode_gif

    rng = np.random.RandomState(seed)
    palette = rng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
    frames = [palette[rng.randint(0, n_colors, (h, w))] for _ in range(n_frames)]
    dec = decode_gif(encode_gif(frames))
    assert len(dec) == n_frames
    for a, b in zip(dec, frames):
        assert np.array_equal(a, b)


@settings(max_examples=10, deadline=None)
@given(h=_dims, w=_dims, gray=st.booleans(),
       quality=st.integers(min_value=20, max_value=98),
       seed=st.integers(min_value=0, max_value=2 ** 31 - 1))
def test_jpeg_progressive_equals_baseline(h, w, gray, quality, seed):
    from pdf_parser_spark.kernels.jpeg import (
        decode_jpeg, encode_jpeg, encode_jpeg_progressive,
    )

    shape = (h, w) if gray else (h, w, 3)
    img = np.random.RandomState(seed).randint(0, 256, shape).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(img, quality)),
        decode_jpeg(encode_jpeg(img, quality)),
    )


@settings(max_examples=12, deadline=None)
@given(timescale=st.integers(min_value=1, max_value=10 ** 6),
       duration=st.integers(min_value=0, max_value=10 ** 8),
       tracks=st.lists(
           st.tuples(st.sampled_from([b"vide", b"soun", b"text"]),
                     st.integers(min_value=0, max_value=4096),
                     st.integers(min_value=0, max_value=4096)),
           min_size=1, max_size=4))
def test_mp4_metadata_round_trip(timescale, duration, tracks):
    from pdf_parser_spark.kernels.mp4 import build_mp4, parse_mp4

    m = parse_mp4(build_mp4(timescale=timescale, duration=duration,
                            tracks=tuple(tracks)))
    assert m["timescale"] == timescale
    assert m["duration_ms"] == int(round(duration * 1000.0 / timescale))
    assert m["n_tracks"] == len(tracks)
    assert m["has_video"] == any(t[0] == b"vide" for t in tracks)
    assert m["has_audio"] == any(t[0] == b"soun" for t in tracks)
    vids = [t for t in tracks if t[0] == b"vide"]
    if vids:
        assert (m["width"], m["height"]) == (vids[0][1], vids[0][2])


@settings(max_examples=12, deadline=None)
@given(h=_dims, w=_dims,
       n_colors=st.integers(min_value=1, max_value=40),
       mode=st.sampled_from(["literal", "palette", "stack"]),
       seed=st.integers(min_value=0, max_value=2 ** 31 - 1))
def test_webp_vp8l_lossless(h, w, n_colors, mode, seed):
    from pdf_parser_spark.kernels.webp import decode_webp, encode_webp_vp8l

    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (n_colors, 4)).astype(np.uint8)
    img = pal[rng.randint(0, n_colors, (h, w))]
    kw = {}
    if mode == "palette":
        kw = {"palette": True}
    elif mode == "stack":
        kw = {"subtract_green": True, "predictor": seed % 14,
              "cache_bits": 4, "use_lz77": True, "use_neighbor_codes": True}
    assert np.array_equal(decode_webp(encode_webp_vp8l(img, **kw)), img)


@settings(max_examples=40, deadline=None)
@given(data=st.binary(max_size=600),
       prefix=st.sampled_from([b"", b"\xff\xd8\xff", b"II*\x00", b"MM\x00*",
                               b"ID3", b"\xff\xfb",
                               b"\x00\x00\x00\x18ftypavif",
                               b"\x00\x00\x00\x01ftypheic",
                               b"fLaC\x00\x00\x00\x22", b"OggS\x00\x04"]))
def test_header_parsers_never_crash_on_junk(data, prefix):
    # robustness contract for every header-walk parser added in round 5:
    # arbitrary bytes (with and without plausible magics) either parse or
    # fail TYPED (MP3Error / None) — never an uncontrolled exception,
    # which would become a task failure at scale
    from pdf_parser_spark.kernels.mp3 import MP3Error, parse_mp3
    from pdf_parser_spark.operators.multimodal import (
        heif_sniff_dimensions, jpeg_sniff_dimensions, tiff_sniff_dimensions,
    )

    blob = prefix + data
    try:
        m = parse_mp3(blob)
        assert m["sample_rate"] in (8000, 11025, 12000, 16000, 22050,
                                    24000, 32000, 44100, 48000)
    except MP3Error:
        pass
    for fn in (jpeg_sniff_dimensions, tiff_sniff_dimensions,
               heif_sniff_dimensions):
        wh = fn(blob)
        assert wh is None or (len(wh) == 2
                              and all(v is None or 0 <= v <= 0xFFFFFFFF
                                      for v in wh))
    from pdf_parser_spark.operators.multimodal import (
        parse_flac_streaminfo, parse_ogg_id,
    )

    for fn in (parse_flac_streaminfo, parse_ogg_id):
        try:
            m = fn(blob)
            assert m["channels"] is None or 0 <= m["channels"] <= 256
        except ValueError:
            pass
