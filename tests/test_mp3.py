"""MPEG-audio (MP3) metadata parser tests.

Anchoring strategy (the GIF round-3 lesson): the fixture builder in
sources/mp3_fixture.py assembles frames field-by-field with ITS OWN
transcription of the public bitrate/samplerate tables, so kernel/fixture
agreement on every field is a real differential anchor; expected values
below are hand-computed from ISO/IEC 11172-3 §2.4.1.3, not printed back
from the parser.
"""

from __future__ import annotations

import pytest

from pdf_parser_spark.kernels.mp3 import (
    MP3Error, build_mp3_frame, parse_mp3,
)
from pdf_parser_spark.sources.mp3_fixture import _frame as fixture_frame
from pdf_parser_spark.sources.mp3_fixture import _rows as fixture_rows


# hand-computed: frame lengths 144*kbps*1000/rate (L2/L3 MPEG1),
# 72*kbps*1000/rate (L3 MPEG2); durations bytes*8/bitrate or
# frames*spf/rate
def _exp(**kw):
    base = dict(title=None, artist=None)
    base.update(kw)
    return base


EXPECTED = {
    "a-cbr-mpeg1-48k": _exp(mpeg_version="1", layer=3, bitrate_kbps=192,
                            sample_rate=48000, channels=2, vbr=False,
                            frame_count=None, duration_ms=600),
    "b-id3-mpeg1-32k": _exp(mpeg_version="1", layer=3, bitrate_kbps=160,
                            sample_rate=32000, channels=2, vbr=False,
                            frame_count=None, duration_ms=360,
                            title="Deterministic Title",
                            artist="Fixture Artist"),
    "c-xing-vbr": _exp(mpeg_version="1", layer=3, bitrate_kbps=128,
                       sample_rate=44100, channels=2, vbr=True,
                       frame_count=30, duration_ms=784),
    "d-mpeg2-mono": _exp(mpeg_version="2", layer=3, bitrate_kbps=96,
                         sample_rate=24000, channels=1, vbr=False,
                         frame_count=None, duration_ms=480),
    "e-id3v1-tail": _exp(mpeg_version="1", layer=3, bitrate_kbps=192,
                         sample_rate=48000, channels=2, vbr=False,
                         frame_count=None, duration_ms=360),
    "f-layer2": _exp(mpeg_version="1", layer=2, bitrate_kbps=192,
                     sample_rate=48000, channels=2, vbr=False,
                     frame_count=None, duration_ms=192),
    "i-vbri": _exp(mpeg_version="1", layer=3, bitrate_kbps=160,
                   sample_rate=44100, channels=2, vbr=True,
                   frame_count=12, duration_ms=313),
    "j-info-cbr": _exp(mpeg_version="1", layer=3, bitrate_kbps=192,
                       sample_rate=48000, channels=2, vbr=False,
                       frame_count=10, duration_ms=240),
    "k-id3v24-utf8": _exp(mpeg_version="1", layer=3, bitrate_kbps=192,
                          sample_rate=48000, channels=2, vbr=False,
                          frame_count=None, duration_ms=144,
                          title="Café Sessions", artist="Überband"),
}


class TestFixtureParity:
    def test_every_fixture_row(self):
        seen = set()
        for name, data in fixture_rows():
            if name in ("g-not-mp3", "h-id3-only"):
                with pytest.raises(MP3Error):
                    parse_mp3(data)
                continue
            assert parse_mp3(data) == EXPECTED[name], name
            seen.add(name)
        assert seen == set(EXPECTED)

    def test_independent_builders_agree(self):
        # kernel builder vs fixture builder: byte-identical frames for
        # shared (version, layer, bitrate, rate, mode) combos — two
        # independent transcriptions of the spec tables
        for vb, layer, kbps, rate, mode in [
            (3, 3, 192, 48000, 0), (3, 3, 160, 32000, 0),
            (3, 2, 192, 48000, 0), (2, 3, 96, 24000, 3),
        ]:
            a = build_mp3_frame(vb, layer, kbps, rate, mode, fill=0x11)
            b = fixture_frame(vb, layer, kbps, rate, mode, 0x11)
            assert a == b, (vb, layer, kbps, rate)


class TestHeaderWalk:
    def test_junk_prefix_needs_consistent_next_header(self):
        # a lone plausible header inside junk must NOT be accepted when
        # the implied next-frame position holds garbage
        frame = build_mp3_frame(3, 3, 192, 48000)
        junk = b"\x00\xff\xfb\x90\x44" + b"\x00" * 800  # fake header
        m = parse_mp3(junk + frame * 3)
        assert (m["bitrate_kbps"], m["sample_rate"]) == (192, 48000)

    def test_id3_with_footer_flag(self):
        frame = build_mp3_frame(3, 3, 192, 48000)
        id3 = b"ID3" + bytes((4, 0, 0x10)) + bytes((0, 0, 0, 20)) + b"\x00" * 30
        m = parse_mp3(id3 + frame * 2)
        assert m["bitrate_kbps"] == 192
        # duration over exactly 2 frames: 2*576 bytes at 192 kbps = 48 ms
        assert m["duration_ms"] == 48

    def test_layer1_frame_length(self):
        # MPEG1 Layer I: (12*bitrate/rate + pad)*4; 448 kbps @ 32 kHz
        # -> 672 bytes; duration 3 frames * 384 spf / 32000 = 36 ms
        f = build_mp3_frame(3, 1, 448, 32000)
        assert len(f) == 672
        m = parse_mp3(f * 3)
        assert (m["layer"], m["duration_ms"]) == (1, 36)

    def test_mpeg25_low_rate(self):
        # MPEG2.5 (version bits 0) L3 8 kbps @ 8 kHz: 576/8*8000/8000=72
        f = build_mp3_frame(0, 3, 8, 8000, mode=3)
        assert len(f) == 72
        m = parse_mp3(f * 4)
        assert (m["mpeg_version"], m["sample_rate"], m["channels"]) == \
            ("2.5", 8000, 1)
        assert m["duration_ms"] == round(4 * 576 / 8000 * 1000)

    def test_padding_bit_lengthens_frame(self):
        padded = build_mp3_frame(3, 3, 128, 44100, padding=1)
        bare = build_mp3_frame(3, 3, 128, 44100, padding=0)
        assert len(padded) == len(bare) + 1
        # a stream alternating padded/unpadded frames still walks
        m = parse_mp3(padded + bare + padded + bare)
        assert m["bitrate_kbps"] == 128

    def test_truncated_xing_ignored(self):
        frame = build_mp3_frame(3, 3, 128, 44100)
        blob = frame[:36] + b"Xing" + b"\x00\x00\x00"  # cut mid-flags
        m = parse_mp3(blob)
        assert m["frame_count"] is None and m["vbr"] is False

    def test_id3_text_frame_edges(self):
        from pdf_parser_spark.kernels.mp3 import parse_id3v2_text_frames

        def tag(ver, frames, pad=8):
            content = frames + b"\x00" * pad
            sz = len(content)
            ss = bytes(((sz >> 21) & 0x7F, (sz >> 14) & 0x7F,
                        (sz >> 7) & 0x7F, sz & 0x7F))
            return b"ID3" + bytes((ver, 0, 0)) + ss + content

        # TXXX (description/value pair) must be skipped, not misread
        txxx = b"TXXX" + (8).to_bytes(4, "big") + b"\x00\x00" \
            + b"\x00desc\x00ok"
        tit2 = b"TIT2" + (3).to_bytes(4, "big") + b"\x00\x00" + b"\x00ab"
        assert parse_id3v2_text_frames(tag(3, txxx + tit2)) == \
            {"TIT2": "ab"}
        # utf-16 with BOM (encoding byte 1)
        body = b"\x01" + "Sønder".encode("utf-16")
        t16 = b"TIT2" + len(body).to_bytes(4, "big") + b"\x00\x00" + body
        assert parse_id3v2_text_frames(tag(3, t16)) == {"TIT2": "Sønder"}
        # a frame whose declared size overruns the tag: stop cleanly
        bad = b"TPE1" + (600).to_bytes(4, "big") + b"\x00\x00" + b"\x00x"
        assert parse_id3v2_text_frames(tag(3, tit2 + bad)) == {"TIT2": "ab"}
        # no tag at all
        assert parse_id3v2_text_frames(b"\xff\xfbxxxx") == {}

    def test_free_and_bad_bitrates_rejected(self):
        with pytest.raises(MP3Error):
            parse_mp3(b"\xff\xfb\x00\x00" + b"\x00" * 100)  # free format
        with pytest.raises(MP3Error):
            parse_mp3(b"\xff\xfb\xf0\x00" + b"\x00" * 100)  # forbidden
        with pytest.raises(MP3Error):
            parse_mp3(b"")
        with pytest.raises(MP3Error):
            parse_mp3(b"\xff\xea\x90\x00" + b"\x00" * 100)  # reserved ver


class TestSparkOperator:
    def test_mixed_batch_isolation(self, spark):
        from pdf_parser_spark.operators.multimodal import media_mp3_metadata

        frame = build_mp3_frame(3, 3, 192, 48000)
        rows = [
            ("ok", bytearray(frame * 5)),
            ("junk", bytearray(b"definitely not audio")),
            ("null", None),
        ]
        df = spark.createDataFrame(rows, "url string, payload binary")
        got = {r.url: r for r in
               media_mp3_metadata(df, bin_col="payload").collect()}
        assert got["ok"].media_kind == "mp3"
        assert got["ok"].duration_ms == 120  # 5*576 bytes @ 192 kbps
        assert got["junk"].media_kind == "unknown"
        assert got["junk"].bitrate_kbps is None
        assert got["null"].media_kind == "unknown"
