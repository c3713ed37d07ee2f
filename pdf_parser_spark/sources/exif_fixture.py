"""Deterministic EXIF fixture — INDEPENDENT of kernels/exif.py.

Assembles TIFF/EXIF structures field-by-field from the public layout
(TIFF 6.0 §2, EXIF 2.32 §4.6) with its own two-pass offset computation,
so kernel/fixture agreement is a real differential anchor, not a shared
convention (the GIF round-3 lesson).

Canonical layout (the DuckDB oracle depends on these, the Python kernel
does not):
- EXIF JPEGs carry APP1 as the FIRST segment (offset 2), except
  ``b-mirror-mm`` which carries a JFIF APP0 of exactly 18 bytes first
  (APP1 at 20).  TIFF body therefore starts at byte 12 (or 30 for b).
- The TIFF header is 8 bytes; IFD0 always at TIFF offset 8.
- Every IFD is ``count(2) + 12*count + next(4)``; out-of-line values
  follow the IFD immediately, in entry order; the Exif sub-IFD (if any)
  follows IFD0's value area, its own values after it.
- ASCII values carry exactly one trailing NUL.

Rows:
- a-fixture-ii.jpg : II; Make/Model/Orientation=1/Software(inline,3B)/
                     DateTime + Exif IFD (DateTimeOriginal,
                     PixelX SHORT 1024, PixelY LONG 768)
- b-mirror-mm.jpg  : MM; JFIF APP0 before APP1; Orientation=6; no
                     Software (NULL path); an unknown-type (13) entry
                     that walkers must skip; PixelX/Y LONG 4032/3024
- c-scan-ii.tif    : bare TIFF container (no JPEG wrapper), full set
- d-noexif.jpg     : JPEG with only APP0 -> typed NULL row
- e-trunc.jpg      : APP1 claims Exif but the TIFF header is cut off
- f-not-media      : not a container at all
"""

from __future__ import annotations

import os
import struct
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["ensure_exif_fixture"]

_ASCII, _SHORT, _LONG = 2, 3, 4
_SIZES = {_ASCII: 1, _SHORT: 2, _LONG: 4}
_EXIF_PTR = 0x8769


def _pack_ifd(endian: str, ifd_off: int, entries: list) -> bytes:
    """Two-pass IFD assembly. entries = [(tag, typ, bytes-or-int)].
    Values are encoded per type; > 4 bytes spill to the area right after
    the IFD (entry order). Returns ifd+values blob (next-IFD ptr = 0)."""
    e = endian
    n = len(entries)
    val_off = ifd_off + 2 + 12 * n + 4
    body, spill = b"", b""
    for tag, typ, val in sorted(entries):
        if typ == _ASCII:
            raw = val.encode("ascii") + b"\x00"
            count = len(raw)
        elif typ == _SHORT:
            raw = struct.pack(e + "H", val)
            count = 1
        elif typ == _LONG:
            raw = struct.pack(e + "I", val)
            count = 1
        else:  # unknown-type probe entry: 4 opaque bytes, count 1
            raw, count = val, 1
        if len(raw) <= 4:
            field = raw + b"\x00" * (4 - len(raw))
        else:
            field = struct.pack(e + "I", val_off + len(spill))
            spill += raw
        body += struct.pack(e + "HHI", tag, typ, count) + field
    return struct.pack(e + "H", n) + body + struct.pack(e + "I", 0) + spill


def _tiff(endian: str, ifd0: list, exif: list | None) -> bytes:
    """TIFF header + IFD0 (+ Exif sub-IFD). endian: '<' or '>'."""
    order = b"II" if endian == "<" else b"MM"
    head = order + struct.pack(endian + "H", 42) + struct.pack(endian + "I", 8)
    if exif is not None:
        # pass 1: size IFD0 with a placeholder pointer to find where the
        # sub-IFD lands; pass 2: rebuild with the real pointer
        probe = ifd0 + [(_EXIF_PTR, _LONG, 0)]
        exif_off = 8 + len(_pack_ifd(endian, 8, probe))
        ifd0 = ifd0 + [(_EXIF_PTR, _LONG, exif_off)]
    blob = head + _pack_ifd(endian, 8, ifd0)
    if exif is not None:
        blob += _pack_ifd(endian, len(blob), exif)
    return blob


def _app1(tiff: bytes) -> bytes:
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


_JFIF_APP0 = (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
              + bytes((1, 2, 0)) + struct.pack(">HH", 72, 72) + bytes((0, 0)))
assert len(_JFIF_APP0) == 18

_SOI, _EOI = b"\xff\xd8", b"\xff\xd9"


def _rows() -> list:
    a = _tiff("<", [
        (0x010F, _ASCII, "FixtureCam"),
        (0x0110, _ASCII, "Alpha One"),
        (0x0112, _SHORT, 1),
        (0x0131, _ASCII, "v1"),
        (0x0132, _ASCII, "2024:01:02 03:04:05"),
    ], [
        (0x9003, _ASCII, "2023:12:31 23:59:58"),
        (0xA002, _SHORT, 1024),
        (0xA003, _LONG, 768),
    ])
    b = _tiff(">", [
        (0x010F, _ASCII, "Mirror Works"),
        (0x0110, _ASCII, "Z-9000"),
        (0x0112, _SHORT, 6),
        (0x0132, _ASCII, "2025:06:07 08:09:10"),
        (0x9999, 13, b"\xde\xad\xbe\xef"),  # unknown type: must be skipped
    ], [
        (0x9003, _ASCII, "2025:06:07 08:09:09"),
        (0xA002, _LONG, 4032),
        (0xA003, _LONG, 3024),
    ])
    c = _tiff("<", [
        (0x010F, _ASCII, "ScanStation"),
        (0x0110, _ASCII, "T-42"),
        (0x0112, _SHORT, 8),
        (0x0131, _ASCII, "scan2"),
        (0x0132, _ASCII, "2022:11:12 13:14:15"),
    ], [
        (0x9003, _ASCII, "2022:11:12 13:14:14"),
        (0xA002, _SHORT, 640),
        (0xA003, _SHORT, 480),
    ])
    return [
        ("a-fixture-ii.jpg", _SOI + _app1(a) + _EOI),
        ("b-mirror-mm.jpg", _SOI + _JFIF_APP0 + _app1(b) + _EOI),
        ("c-scan-ii.tif", c),
        ("d-noexif.jpg", _SOI + _JFIF_APP0 + _EOI),
        ("e-trunc.jpg", _SOI + _app1(b"II*\x00\x08") + _EOI),
        ("f-not-media", b"plain text, no media container here"),
    ]


def ensure_exif_fixture(corpus_dir: str) -> str:
    out_dir = os.path.join(corpus_dir, "exif")
    path = os.path.join(out_dir, "media.parquet")
    if os.path.exists(path):
        return path
    rows = [(f"https://fixtures.test/exif/{name}", data)
            for name, data in _rows()]
    os.makedirs(out_dir, exist_ok=True)
    tbl = pa.Table.from_pydict(
        {"url": [r[0] for r in rows], "payload": [r[1] for r in rows]},
        schema=pa.schema([("url", pa.string()), ("payload", pa.binary())]),
    )
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
    os.close(fd)
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path
