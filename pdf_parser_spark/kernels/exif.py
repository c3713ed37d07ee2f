"""EXIF metadata walker — JPEG APP1 and bare-TIFF containers, pure Python.

Generic, spec-driven walk (EXIF 2.32 / TIFF 6.0 public layout): find the
TIFF structure (either the file itself, or inside the first JPEG APP1
segment whose payload starts with ``Exif\\0\\0``), then decode IFD0's
entries endian-aware — Make / Model / Orientation / Software / DateTime —
and follow the Exif-IFD pointer (tag 0x8769) for DateTimeOriginal /
PixelXDimension / PixelYDimension.  Values may be inline (size*count <= 4)
or offset-addressed; both forms are handled for every decoded type.

Failure contract (same as kernels/mp3.py): any malformed structure raises
:class:`ExifError` (a ``ValueError``) — callers map it to a typed NULL row;
a crafted payload must never surface as anything but ``ExifError`` (pinned
by the hypothesis gate in tests/test_exif.py).

Reference parity: the reference app extracts no media metadata at all (its
scope is PDF text, ``src/pdf_parser/extractors/text_extractor.py``); this
kernel is part of the beyond-reference multimodal surface (SURVEY.md §2
coverage map, media rows).  The fixture in sources/exif_fixture.py is an
INDEPENDENT field-by-field assembler (the GIF round-3 lesson): kernel and
fixture agreeing is a differential anchor, not a shared convention.
"""

from __future__ import annotations

import struct

__all__ = ["ExifError", "parse_exif", "EXIF_FIELDS"]


class ExifError(ValueError):
    """Raised for any payload this walker cannot parse as EXIF."""


# output field order (mirrored by the operator schema and the oracle)
EXIF_FIELDS = [
    "endian", "make", "model", "orientation", "software", "datetime",
    "datetime_original", "pixel_x", "pixel_y", "n_ifd0_entries",
]

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}

# IFD0 tags -> output field (ASCII unless noted)
_IFD0_TAGS = {
    0x010F: "make",
    0x0110: "model",
    0x0112: "orientation",  # SHORT
    0x0131: "software",
    0x0132: "datetime",
}
_EXIF_IFD_POINTER = 0x8769
_EXIF_TAGS = {
    0x9003: "datetime_original",
    0xA002: "pixel_x",  # SHORT or LONG
    0xA003: "pixel_y",
}

# a crafted file can store any tag with any type; values only land in the
# output when the decoded Python type matches the declared column (else a
# string in an int column would poison the Arrow batch — the gate is
# per-row, never per-task)
_STR_FIELDS = {"make", "model", "software", "datetime", "datetime_original"}
_INT_FIELDS = {"orientation", "pixel_x", "pixel_y"}


def _assign(out: dict, field: str, val) -> None:
    if field in _STR_FIELDS and isinstance(val, str):
        out[field] = val
    elif field in _INT_FIELDS and isinstance(val, int):
        out[field] = val


def _find_tiff(data: bytes) -> int:
    """Return the byte offset of the TIFF header, or raise ExifError."""
    if len(data) >= 8 and data[:4] in (b"II*\x00", b"MM\x00*"):
        return 0
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ExifError("neither TIFF nor JPEG")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ExifError("JPEG marker desync")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS: no APP1 before image data
            break
        seglen = struct.unpack_from(">H", data, pos + 2)[0]
        if seglen < 2 or pos + 2 + seglen > len(data):
            raise ExifError("JPEG segment overruns payload")
        if marker == 0xE1 and data[pos + 4: pos + 10] == b"Exif\x00\x00":
            return pos + 10
        pos += 2 + seglen
    raise ExifError("no APP1 Exif segment")


def _read_value(data, tiff, entry_off, fmt_u16, fmt_u32):
    """Decode one 12-byte IFD entry -> (tag, python value or None)."""
    tag = struct.unpack_from(fmt_u16, data, entry_off)[0]
    typ = struct.unpack_from(fmt_u16, data, entry_off + 2)[0]
    count = struct.unpack_from(fmt_u32, data, entry_off + 4)[0]
    size = _TYPE_SIZES.get(typ)
    if size is None:
        return tag, None  # unknown type: skip the entry, don't fail
    total = size * count
    if total <= 4:
        voff = entry_off + 8
    else:
        voff = tiff + struct.unpack_from(fmt_u32, data, entry_off + 8)[0]
    if voff + total > len(data):
        raise ExifError("IFD value overruns payload")
    if typ == 2:  # ASCII, NUL-terminated
        raw = data[voff: voff + count]
        return tag, raw.split(b"\x00", 1)[0].decode("ascii", "replace")
    if typ == 3:
        return tag, struct.unpack_from(fmt_u16, data, voff)[0]
    if typ == 4:
        return tag, struct.unpack_from(fmt_u32, data, voff)[0]
    return tag, None  # RATIONAL etc.: not in this kernel's field set


def _walk_ifd(data, tiff, ifd_off, fmt_u16, fmt_u32):
    """Yield (tag, value) for each entry of the IFD at tiff+ifd_off."""
    base = tiff + ifd_off
    if base + 2 > len(data):
        raise ExifError("IFD offset overruns payload")
    n = struct.unpack_from(fmt_u16, data, base)[0]
    if base + 2 + 12 * n > len(data):
        raise ExifError("IFD entries overrun payload")
    for i in range(n):
        yield _read_value(data, tiff, base + 2 + 12 * i, fmt_u16, fmt_u32)


def parse_exif(data: bytes) -> dict:
    """Parse EXIF out of a JPEG or bare TIFF; raise ExifError otherwise."""
    tiff = _find_tiff(data)
    if tiff + 8 > len(data):
        raise ExifError("TIFF header truncated")
    order = data[tiff: tiff + 2]
    if order == b"II":
        fmt_u16, fmt_u32 = "<H", "<I"
    elif order == b"MM":
        fmt_u16, fmt_u32 = ">H", ">I"
    else:
        raise ExifError("bad TIFF byte order")
    if struct.unpack_from(fmt_u16, data, tiff + 2)[0] != 42:
        raise ExifError("bad TIFF magic")
    ifd0 = struct.unpack_from(fmt_u32, data, tiff + 4)[0]

    out = {f: None for f in EXIF_FIELDS}
    out["endian"] = order.decode("ascii")
    exif_ptr = None
    n0 = 0
    for tag, val in _walk_ifd(data, tiff, ifd0, fmt_u16, fmt_u32):
        n0 += 1
        if tag == _EXIF_IFD_POINTER and isinstance(val, int):
            exif_ptr = val
        elif tag in _IFD0_TAGS and val is not None:
            _assign(out, _IFD0_TAGS[tag], val)
    out["n_ifd0_entries"] = n0
    if exif_ptr is not None:
        for tag, val in _walk_ifd(data, tiff, exif_ptr, fmt_u16, fmt_u32):
            if tag in _EXIF_TAGS and val is not None:
                _assign(out, _EXIF_TAGS[tag], val)
    return out
