"""EXIF walker tests (kernels/exif.py).

Anchoring strategy (the GIF round-3 lesson, three-way): byte-built spec
anchors constructed IN THIS FILE straight from the TIFF 6.0 / EXIF 2.32
published layout — independent of both the kernel and the fixture builder
— plus kernel-vs-fixture parity with hand-written expected values, plus a
hypothesis typed-failure gate (every byte string parses or raises
ExifError; nothing else may escape, or a crafted payload would kill a
Spark task instead of landing on the NULL row).
"""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_spark.kernels.exif import ExifError, parse_exif
from pdf_parser_spark.sources.exif_fixture import _rows as fixture_rows


def _e(e: str, tag: int, typ: int, cnt: int, field: bytes) -> bytes:
    assert len(field) == 4
    return struct.pack(e + "HHI", tag, typ, cnt) + field


def _hdr(e: str, ifd0: int = 8) -> bytes:
    order = b"II" if e == "<" else b"MM"
    return order + struct.pack(e + "H", 42) + struct.pack(e + "I", ifd0)


def _ifd(e: str, entries: list, nxt: int = 0) -> bytes:
    return (struct.pack(e + "H", len(entries)) + b"".join(entries)
            + struct.pack(e + "I", nxt))


class TestSpecAnchors:
    def test_minimal_ii_inline_short(self):
        blob = _hdr("<") + _ifd("<", [
            _e("<", 0x0112, 3, 1, struct.pack("<H", 5) + b"\x00\x00"),
        ])
        m = parse_exif(blob)
        assert m["orientation"] == 5
        assert m["endian"] == "II" and m["n_ifd0_entries"] == 1

    def test_mm_offset_ascii(self):
        # header(8) + 1-entry IFD(18) = 26 -> value area at 26
        val = b"CamCo\x00"
        blob = _hdr(">") + _ifd(">", [
            _e(">", 0x010F, 2, len(val), struct.pack(">I", 26)),
        ]) + val
        m = parse_exif(blob)
        assert m["make"] == "CamCo" and m["endian"] == "MM"

    def test_inline_ascii_exactly_four_bytes(self):
        blob = _hdr("<") + _ifd("<", [_e("<", 0x0131, 2, 4, b"abc\x00")])
        assert parse_exif(blob)["software"] == "abc"

    def test_exif_subifd_via_pointer(self):
        # IFD0: pointer only (header 8 + ifd 18 = 26 -> sub-IFD at 26)
        sub = _ifd("<", [
            _e("<", 0xA002, 3, 1, struct.pack("<H", 320) + b"\x00\x00"),
            _e("<", 0xA003, 4, 1, struct.pack("<I", 70000)),
        ])
        blob = _hdr("<") + _ifd("<", [
            _e("<", 0x8769, 4, 1, struct.pack("<I", 26)),
        ]) + sub
        m = parse_exif(blob)
        assert m["pixel_x"] == 320 and m["pixel_y"] == 70000

    def test_jpeg_marker_walk_skips_com_and_app0(self):
        tiff = _hdr("<") + _ifd("<", [
            _e("<", 0x0112, 3, 1, struct.pack("<H", 3) + b"\x00\x00"),
        ])
        com = b"\xff\xfe" + struct.pack(">H", 9) + b"comment"
        app0 = b"\xff\xe0" + struct.pack(">H", 7) + b"JUNK\x00"
        payload = b"Exif\x00\x00" + tiff
        app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
        m = parse_exif(b"\xff\xd8" + com + app0 + app1 + b"\xff\xd9")
        assert m["orientation"] == 3

    def test_wrong_typed_tags_skipped_not_poisoned(self):
        # Orientation declared ASCII, Make declared SHORT: both must land
        # as None (typed columns), parse still succeeds
        blob = _hdr("<") + _ifd("<", [
            _e("<", 0x010F, 3, 1, struct.pack("<H", 7) + b"\x00\x00"),
            _e("<", 0x0112, 2, 2, b"6\x00\x00\x00"),
        ])
        m = parse_exif(blob)
        assert m["make"] is None and m["orientation"] is None
        assert m["n_ifd0_entries"] == 2

    def test_unknown_type_entry_skipped(self):
        blob = _hdr("<") + _ifd("<", [
            _e("<", 0x9999, 13, 1, b"\xde\xad\xbe\xef"),
            _e("<", 0x0112, 3, 1, struct.pack("<H", 8) + b"\x00\x00"),
        ])
        m = parse_exif(blob)
        assert m["orientation"] == 8 and m["n_ifd0_entries"] == 2

    def test_fill_bytes_and_rst_before_app1(self):
        # §B.1.1.2: 0xFF fill bytes may precede a marker; RST/TEM are
        # standalone (no length field) — the walk must step over both
        tiff = _hdr("<") + _ifd("<", [
            _e("<", 0x0112, 3, 1, struct.pack("<H", 7) + b"\x00\x00"),
        ])
        payload = b"Exif\x00\x00" + tiff
        app1 = b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
        data = (b"\xff\xd8" + b"\xff\xff\xff\xff" + b"\xff\xd0"
                + app1 + b"\xff\xd9")
        assert parse_exif(data)["orientation"] == 7

    def test_non_eight_ifd0_offset(self):
        # first IFD does not have to sit right after the header
        blob = _hdr("<", ifd0=12) + b"\x00" * 4 + _ifd("<", [
            _e("<", 0x0112, 3, 1, struct.pack("<H", 2) + b"\x00\x00"),
        ])
        assert parse_exif(blob)["orientation"] == 2


class TestTypedFailures:
    BAD = [
        b"",
        b"plain text",
        b"II*\x00",                       # header cut at 4 bytes
        b"II+\x00" + b"\x00" * 8,         # bad magic (43)
        b"\xff\xd8\xff\xd9",              # JPEG, no APP1
        b"\xff\xd8\xff\xe1\x00\x04\x00\x00",  # APP1 without Exif id
        # IFD offset beyond payload
        b"II" + struct.pack("<H", 42) + struct.pack("<I", 9999),
        # declared 3 entries, bytes for none
        b"II" + struct.pack("<H", 42) + struct.pack("<I", 8)
        + struct.pack("<H", 3),
    ]

    @pytest.mark.parametrize("data", BAD)
    def test_raises_exif_error(self, data):
        with pytest.raises(ExifError):
            parse_exif(data)

    def test_value_offset_out_of_bounds(self):
        blob = _hdr("<") + _ifd("<", [
            _e("<", 0x010F, 2, 64, struct.pack("<I", 4000)),
        ])
        with pytest.raises(ExifError):
            parse_exif(blob)

    def test_jpeg_segment_overrun(self):
        with pytest.raises(ExifError):
            parse_exif(b"\xff\xd8\xff\xe1\xff\xff junk")


EXPECTED = {
    # hand-written from the fixture module's documented field values
    "a-fixture-ii.jpg": dict(endian="II", make="FixtureCam",
                             model="Alpha One", orientation=1,
                             software="v1", datetime="2024:01:02 03:04:05",
                             datetime_original="2023:12:31 23:59:58",
                             pixel_x=1024, pixel_y=768, n_ifd0_entries=6),
    "b-mirror-mm.jpg": dict(endian="MM", make="Mirror Works",
                            model="Z-9000", orientation=6, software=None,
                            datetime="2025:06:07 08:09:10",
                            datetime_original="2025:06:07 08:09:09",
                            pixel_x=4032, pixel_y=3024, n_ifd0_entries=6),
    "c-scan-ii.tif": dict(endian="II", make="ScanStation", model="T-42",
                          orientation=8, software="scan2",
                          datetime="2022:11:12 13:14:15",
                          datetime_original="2022:11:12 13:14:14",
                          pixel_x=640, pixel_y=480, n_ifd0_entries=6),
}
BAD_FIXTURES = {"d-noexif.jpg", "e-trunc.jpg", "f-not-media"}


class TestFixtureParity:
    def test_every_fixture_row(self):
        seen = set()
        for name, data in fixture_rows():
            seen.add(name)
            if name in BAD_FIXTURES:
                with pytest.raises(ExifError):
                    parse_exif(data)
                continue
            got = parse_exif(data)
            for k, v in EXPECTED[name].items():
                assert got[k] == v, (name, k, got[k], v)
        assert seen == set(EXPECTED) | BAD_FIXTURES


class TestTypedFailureOnly:
    @settings(max_examples=120, deadline=None)
    @given(data=st.binary(max_size=256))
    def test_random_bytes(self, data):
        try:
            m = parse_exif(data)
            assert isinstance(m, dict)
        except ExifError:
            pass

    @settings(max_examples=120, deadline=None)
    @given(st.data())
    def test_mutated_fixture_bytes(self, data):
        rows = [r for r in fixture_rows() if r[0] not in BAD_FIXTURES]
        _, blob = rows[data.draw(st.integers(0, len(rows) - 1))]
        blob = bytearray(blob)
        for _ in range(data.draw(st.integers(1, 6))):
            i = data.draw(st.integers(0, len(blob) - 1))
            blob[i] = data.draw(st.integers(0, 255))
        try:
            m = parse_exif(bytes(blob))
            assert isinstance(m, dict)
        except ExifError:
            pass
