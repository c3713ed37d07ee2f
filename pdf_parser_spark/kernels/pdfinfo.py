"""PDF document-information metadata walker, pure Python.

Extracts the document-information dictionary (PDF 32000-1:2008 §14.3.3)
plus structural facts without decoding any content stream: header version,
trailer walk to ``/Info`` and ``/Root``, ``/Title /Author /Producer
/CreationDate`` literal and hex strings (with escape handling), page count
via Root -> Pages -> ``/Count``, and an ``/Encrypt`` presence flag.

Object resolution is deliberately simple and robust for web-crawled PDFs:
indirect objects are located by scanning for ``N 0 obj`` tokens rather
than trusting the xref table (truncated/garbage xref offsets are common in
the wild; the reference app's pypdf does the same in its repair path).
Failure contract (same as kernels/mp3.py and kernels/exif.py): any
payload this walker cannot treat as a PDF raises :class:`PdfInfoError`;
callers map it to a typed NULL row — never a task failure.

Reference parity: the reference app extracts page TEXT only
(``src/pdf_parser/extractors/text_extractor.py``) and never reads the
Info dictionary; this kernel extends the engine's coverage of the
reference's own input domain. The fixture in sources/pdfinfo_fixture.py
is an INDEPENDENT serializer (the GIF round-3 lesson).
"""

from __future__ import annotations

import re

__all__ = ["PdfInfoError", "parse_pdf_info", "PDFINFO_FIELDS"]


class PdfInfoError(ValueError):
    """Raised for any payload this walker cannot parse as a PDF."""


PDFINFO_FIELDS = [
    "pdf_version", "title", "author", "producer", "creation_date",
    "n_pages", "encrypted", "has_info",
]

_HEADER_RE = re.compile(rb"^%PDF-(\d\.\d)")
_OBJ_RE = rb"(?:^|[\r\n])%d 0 obj\b"
_REF_RE = rb"/%s\s+(\d+)\s+0\s+R"
_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t", ord("b"): b"\b",
    ord("f"): b"\f", ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _find_obj(data: bytes, num: int) -> int:
    """Byte offset just past 'N 0 obj', or raise."""
    m = re.search(_OBJ_RE % num, data)
    if not m:
        raise PdfInfoError(f"object {num} not found")
    return m.end()


def _dict_span(data: bytes, start: int) -> bytes:
    """The bytes of the << ... >> dictionary beginning at/after start
    (nesting-aware), bounded to the same object."""
    i = data.find(b"<<", start)
    if i < 0 or i - start > 256:
        raise PdfInfoError("object has no dictionary")
    depth, j = 0, i
    while j < len(data) - 1:
        if data[j: j + 2] == b"<<":
            depth += 1
            j += 2
        elif data[j: j + 2] == b">>":
            depth -= 1
            j += 2
            if depth == 0:
                return data[i:j]
        else:
            j += 1
    raise PdfInfoError("unterminated dictionary")


def _pdf_string(d: bytes, key: bytes) -> str | None:
    """Decode the literal ( ... ) or hex < ... > string after /key."""
    m = re.search(rb"/" + key + rb"\s*", d)
    if not m:
        return None
    i = m.end()
    if i >= len(d):
        return None
    if d[i: i + 1] == b"(":
        out, j, depth = bytearray(), i + 1, 1
        while j < len(d):
            c = d[j]
            if c == 0x5C and j + 1 < len(d):  # backslash escape
                nxt = d[j + 1]
                if nxt in _ESCAPES:
                    out += _ESCAPES[nxt]
                    j += 2
                elif 0x30 <= nxt <= 0x37:  # octal, 1-3 digits
                    k = j + 1
                    oct_digits = b""
                    while k < len(d) and len(oct_digits) < 3 \
                            and 0x30 <= d[k] <= 0x37:
                        oct_digits += d[k: k + 1]
                        k += 1
                    out.append(int(oct_digits, 8) & 0xFF)
                    j = k
                else:
                    out.append(nxt)
                    j += 2
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    return out.decode("latin-1")
            out.append(c)
            j += 1
        raise PdfInfoError(f"unterminated string for /{key.decode()}")
    if d[i: i + 1] == b"<":
        j = d.find(b">", i)
        if j < 0:
            raise PdfInfoError(f"unterminated hex string for /{key.decode()}")
        hx = re.sub(rb"\s", b"", d[i + 1: j])
        if len(hx) % 2:  # odd count: implicit trailing 0 per spec
            hx += b"0"
        try:
            return bytes.fromhex(hx.decode("ascii")).decode("latin-1")
        except ValueError as exc:
            raise PdfInfoError("bad hex string") from exc
    return None


def _ref(d: bytes, key: bytes) -> int | None:
    m = re.search(_REF_RE % key, d)
    # 18-digit cap: a crafted object number / count must stay inside
    # int64 (the EXIF fuzz lesson: never overflow the Arrow column)
    if m is None or len(m.group(1)) > 18:
        return None
    return int(m.group(1))


def _int_value(d: bytes, key: bytes) -> int | None:
    m = re.search(rb"/" + key + rb"\s+(\d+)", d)
    if m is None or len(m.group(1)) > 18:
        return None
    return int(m.group(1))


def parse_pdf_info(data: bytes) -> dict:
    """Parse document metadata out of a PDF; raise PdfInfoError otherwise."""
    m = _HEADER_RE.match(data)
    if not m:
        raise PdfInfoError("no %PDF header")
    out = {f: None for f in PDFINFO_FIELDS}
    out["pdf_version"] = m.group(1).decode("ascii")

    t = data.rfind(b"trailer")
    if t < 0:
        raise PdfInfoError("no trailer")
    trailer = _dict_span(data, t)
    out["encrypted"] = b"/Encrypt" in trailer

    root = _ref(trailer, b"Root")
    if root is None:
        raise PdfInfoError("trailer has no /Root")
    catalog = _dict_span(data, _find_obj(data, root))
    pages_ref = _ref(catalog, b"Pages")
    if pages_ref is not None:
        pages = _dict_span(data, _find_obj(data, pages_ref))
        out["n_pages"] = _int_value(pages, b"Count")

    info_ref = _ref(trailer, b"Info")
    out["has_info"] = info_ref is not None
    if info_ref is not None:
        info = _dict_span(data, _find_obj(data, info_ref))
        out["title"] = _pdf_string(info, b"Title")
        out["author"] = _pdf_string(info, b"Author")
        out["producer"] = _pdf_string(info, b"Producer")
        out["creation_date"] = _pdf_string(info, b"CreationDate")
    return out
