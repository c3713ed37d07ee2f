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


def _b(fourcc: bytes, *parts: bytes) -> bytes:
    """Test-local box writer: explicit length prefix, no kernel imports."""
    body = b"".join(parts)
    return (len(body) + 8).to_bytes(4, "big") + fourcc + body


class TestIndependentSpecAnchor:
    """ISO/IEC 14496-12 streams assembled field-by-field IN THIS FILE
    (not via the kernel's builder), so the parser's layout conventions are
    anchored to the published spec rather than to a sibling function —
    the GIF round-3 lesson. Deliberately exercises what `build_mp4` never
    emits: version-1 mvhd/tkhd (64-bit times), unknown boxes interleaved
    at every level, hdlr-before-mdhd child order, and mdat-before-moov
    file layout."""

    def test_version1_boxes_and_unknown_box_skip(self):
        # mvhd v1: ver(1)+flags(3)+creation(8)+mod(8)+timescale(4)+
        # duration(8)+rate(4)+volume(2)+res(2)+res(8)+matrix(36)+
        # predefined(24)+next_track_id(4)
        mvhd = _b(b"mvhd", bytes([1]), b"\x00" * 3,
                  (0).to_bytes(8, "big"), (0).to_bytes(8, "big"),
                  (90000).to_bytes(4, "big"), (450000).to_bytes(8, "big"),
                  (0x00010000).to_bytes(4, "big"), b"\x01\x00", b"\x00" * 2,
                  b"\x00" * 8, b"\x00" * 36, b"\x00" * 24,
                  (2).to_bytes(4, "big"))
        # tkhd v1: ver(1)+flags(3)+creation(8)+mod(8)+track_id(4)+res(4)+
        # duration(8)+res(8)+layer(2)+alt(2)+volume(2)+res(2)+matrix(36)+
        # width(4, 16.16)+height(4, 16.16)
        tkhd = _b(b"tkhd", bytes([1]), b"\x00\x00\x07",
                  (0).to_bytes(8, "big"), (0).to_bytes(8, "big"),
                  (1).to_bytes(4, "big"), b"\x00" * 4,
                  (450000).to_bytes(8, "big"), b"\x00" * 8,
                  b"\x00" * 2, b"\x00" * 2, b"\x00" * 2, b"\x00" * 2,
                  b"\x00" * 36,
                  (1920 << 16).to_bytes(4, "big"),
                  (1080 << 16).to_bytes(4, "big"))
        # hdlr BEFORE mdhd (spec allows any child order):
        # ver/flags(4)+pre_defined(4)+handler(4)+reserved(12)+name
        hdlr = _b(b"hdlr", b"\x00" * 4, b"\x00" * 4, b"vide",
                  b"\x00" * 12, b"x\x00")
        mdhd = _b(b"mdhd", bytes([0]), b"\x00" * 3, b"\x00" * 4,
                  b"\x00" * 4, (90000).to_bytes(4, "big"),
                  (450000).to_bytes(4, "big"), b"\x55\xc4", b"\x00" * 2)
        mdia = _b(b"mdia", hdlr, _b(b"skip", b"\xde\xad"), mdhd)
        trak = _b(b"trak", _b(b"udta"), tkhd, mdia)
        moov = _b(b"moov", _b(b"free", b"junk"), mvhd, trak)
        ftyp = _b(b"ftyp", b"iso5", b"\x00" * 4, b"iso5mp41")
        data = ftyp + _b(b"free") + moov + _b(b"mdat", b"\x00" * 3)
        m = parse_mp4(data)
        assert m == {"brand": "iso5", "timescale": 90000,
                     "duration_ms": 5000, "n_tracks": 1,
                     "width": 1920, "height": 1080,
                     "has_video": True, "has_audio": False}

    def test_mdat_before_moov_sample_walk(self):
        # real progressive-download files put mdat first; stco offsets are
        # absolute so the walk must not assume moov precedes the data.
        from pdf_parser_spark.kernels.mp4 import extract_video_samples

        samples = [b"AA", b"BBB", b"C"]
        ftyp = _b(b"ftyp", b"isom", b"\x00" * 4, b"mp41")
        assert len(ftyp) == 20
        mdat = _b(b"mdat", b"".join(samples))
        # chunk 1 = samples 0-1 at offset 28, chunk 2 = sample 2 at 33
        stsd = _b(b"stsd", b"\x00" * 4, (1).to_bytes(4, "big"),
                  _b(b"jpeg", b"\x00" * 8))
        stsz = _b(b"stsz", b"\x00" * 4, (0).to_bytes(4, "big"),
                  (3).to_bytes(4, "big"),
                  b"".join(len(s).to_bytes(4, "big") for s in samples))
        stco = _b(b"stco", b"\x00" * 4, (2).to_bytes(4, "big"),
                  (28).to_bytes(4, "big"), (33).to_bytes(4, "big"))
        stsc = _b(b"stsc", b"\x00" * 4, (2).to_bytes(4, "big"),
                  (1).to_bytes(4, "big") + (2).to_bytes(4, "big")
                  + (1).to_bytes(4, "big"),
                  (2).to_bytes(4, "big") + (1).to_bytes(4, "big")
                  + (1).to_bytes(4, "big"))
        stbl = _b(b"stbl", stsd, stsz, stco, stsc)
        hdlr = _b(b"hdlr", b"\x00" * 4, b"\x00" * 4, b"vide",
                  b"\x00" * 12, b"\x00")
        mdia = _b(b"mdia", hdlr, _b(b"minf", stbl))
        mvhd = _b(b"mvhd", bytes([0]), b"\x00" * 3, b"\x00" * 4,
                  b"\x00" * 4, (1000).to_bytes(4, "big"),
                  (300).to_bytes(4, "big"), b"\x00" * 80)
        moov = _b(b"moov", mvhd, _b(b"trak", mdia))
        fmt, got = extract_video_samples(ftyp + mdat + moov)
        assert fmt == "jpeg" and got == samples

    def test_co64_chunk_offsets(self):
        # co64 (ISO/IEC 14496-12 §8.7.5) replaces stco with 64-bit chunk
        # offsets; ffmpeg emits it for >4 GB files and faststart edge
        # cases. Table shape is identical, entries are 8 bytes. The r4
        # advisor flagged that co64 silently landed on the digest fallback.
        from pdf_parser_spark.kernels.mp4 import extract_video_samples

        samples = [b"AA", b"BBB", b"C"]
        ftyp = _b(b"ftyp", b"isom", b"\x00" * 4, b"mp41")
        mdat = _b(b"mdat", b"".join(samples))
        stsd = _b(b"stsd", b"\x00" * 4, (1).to_bytes(4, "big"),
                  _b(b"jpeg", b"\x00" * 8))
        stsz = _b(b"stsz", b"\x00" * 4, (0).to_bytes(4, "big"),
                  (3).to_bytes(4, "big"),
                  b"".join(len(s).to_bytes(4, "big") for s in samples))
        co64 = _b(b"co64", b"\x00" * 4, (2).to_bytes(4, "big"),
                  (28).to_bytes(8, "big"), (33).to_bytes(8, "big"))
        stsc = _b(b"stsc", b"\x00" * 4, (2).to_bytes(4, "big"),
                  (1).to_bytes(4, "big") + (2).to_bytes(4, "big")
                  + (1).to_bytes(4, "big"),
                  (2).to_bytes(4, "big") + (1).to_bytes(4, "big")
                  + (1).to_bytes(4, "big"))
        stbl = _b(b"stbl", stsd, stsz, co64, stsc)
        hdlr = _b(b"hdlr", b"\x00" * 4, b"\x00" * 4, b"vide",
                  b"\x00" * 12, b"\x00")
        mdia = _b(b"mdia", hdlr, _b(b"minf", stbl))
        mvhd = _b(b"mvhd", bytes([0]), b"\x00" * 3, b"\x00" * 4,
                  b"\x00" * 4, (1000).to_bytes(4, "big"),
                  (300).to_bytes(4, "big"), b"\x00" * 80)
        moov = _b(b"moov", mvhd, _b(b"trak", mdia))
        fmt, got = extract_video_samples(ftyp + mdat + moov)
        assert fmt == "jpeg" and got == samples

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
