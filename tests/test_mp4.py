"""From-scratch ISO-BMFF (MP4) container parser tests (kernels/mp4.py).

The builder emits spec-shaped boxes; the parser walks them generically
(any order/nesting/largesize), so build -> parse is a real differential:
every metadata field must round-trip exactly.
"""

from __future__ import annotations

import struct

import pytest

from pdf_parser_spark.kernels.mp4 import MP4Error, build_mp4, parse_mp4


class TestRoundTrip:
    def test_video_plus_audio(self):
        d = build_mp4(brand=b"isom", timescale=1000, duration=5000,
                      tracks=((b"vide", 640, 360), (b"soun", 0, 0)))
        m = parse_mp4(d)
        assert m == {"brand": "isom", "timescale": 1000, "duration_ms": 5000,
                     "n_tracks": 2, "width": 640, "height": 360,
                     "has_video": True, "has_audio": True}

    def test_audio_only(self):
        m = parse_mp4(build_mp4(brand=b"mp42", timescale=44100,
                                duration=441000, tracks=((b"soun", 0, 0),)))
        assert m["duration_ms"] == 10000 and not m["has_video"]
        assert m["width"] == 0 and m["n_tracks"] == 1

    def test_first_video_track_wins(self):
        d = build_mp4(tracks=((b"soun", 0, 0), (b"vide", 1280, 720),
                              (b"vide", 320, 240)))
        m = parse_mp4(d)
        assert (m["width"], m["height"]) == (1280, 720)
        assert m["n_tracks"] == 3

    def test_duration_rounding(self):
        m = parse_mp4(build_mp4(timescale=90000, duration=2700001,
                                tracks=((b"vide", 2, 2),)))
        assert m["duration_ms"] == 30000  # round(30000.011)

    def test_largesize_box(self):
        # rewrite moov to use a 64-bit largesize header: size=1 + 8 extra
        d = build_mp4()
        moov_size = struct.unpack(">I", d[20:24])[0]
        body = d[28:20 + moov_size]
        large = struct.pack(">I", 1) + b"moov" + struct.pack(">Q", moov_size + 8) + body
        d2 = d[:20] + large + d[20 + moov_size:]
        assert parse_mp4(d2)["timescale"] == parse_mp4(d)["timescale"]


class TestRefusals:
    def test_not_mp4(self):
        with pytest.raises(MP4Error):
            parse_mp4(b"not an iso-bmff container at all")

    def test_truncated_moov(self):
        with pytest.raises(MP4Error):
            parse_mp4(build_mp4()[:40])

    def test_zero_timescale(self):
        d = bytearray(build_mp4(timescale=1))
        d[48:52] = b"\x00\x00\x00\x00"  # mvhd timescale -> 0
        with pytest.raises(MP4Error):
            parse_mp4(bytes(d))

    def test_box_overrun(self):
        d = bytearray(build_mp4())
        d[20:24] = struct.pack(">I", 10 ** 6)  # moov claims a huge size
        with pytest.raises(MP4Error):
            parse_mp4(bytes(d))


class TestSparkOperator:
    def test_mixed_batch_isolation(self, spark):
        from pdf_parser_spark.operators.multimodal import media_mp4_metadata

        good = build_mp4(tracks=((b"vide", 640, 360),))
        df = spark.createDataFrame(
            [("good", bytearray(good)), ("bad", bytearray(good[:40])),
             ("junk", b"xx"), ("null", None)],
            "url string, html binary",
        )
        rows = {r.url: r for r in media_mp4_metadata(df).collect()}
        assert rows["good"].media_kind == "mp4" and rows["good"].width == 640
        assert rows["bad"].media_kind == "mp4-corrupt"
        assert rows["bad"].duration_ms is None
        assert rows["junk"].media_kind == "unknown"
        assert rows["null"].media_kind == "unknown"
