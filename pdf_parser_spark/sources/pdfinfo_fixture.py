"""Deterministic PDF-metadata fixture — INDEPENDENT of kernels/pdfinfo.py
and of kernels/pdfgen.py (the corpus serializer).

Assembles PDFs object-by-object with its own serializer and a real xref
table, so kernel/fixture agreement is a differential anchor, not a shared
convention (the GIF round-3 lesson).

Canonical layout (the DuckDB oracle's hex patterns depend on these; the
Python kernel does not):
- object numbering: Info = 1 (when present), Catalog = 2, Pages = 3,
  pages from 4; the /Encrypt dummy is 9
- exactly one space between a dictionary key and its value
- Info strings are ASCII; literal strings escape ONLY inner parens with
  backslash (no octal/\\n/\\\\ in oracle-visible values); hex strings are
  uppercase, even length, no whitespace
- trailer dictionaries are flat (no nested << >>)

Rows:
- a-plain.pdf    : v1.4, 2 pages, full Info (Title/Author/Producer/
                   CreationDate)
- b-escapes.pdf  : v1.7, 3 pages, Title with escaped parens, no Author
- c-noinfo.pdf   : v1.5, 1 page, no /Info in the trailer
- d-hextitle.pdf : v1.6, 1 page, Title as an uppercase hex string,
                   Author literal
- e-encrypted.pdf: v1.4, 1 page, /Encrypt 9 0 R + Info Title
- f-not-pdf      : junk bytes
- g-trunc.pdf    : header only, no trailer
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["ensure_pdfinfo_fixture"]


def _serialize(version: bytes, objs: list, trailer_extra: bytes) -> bytes:
    out = b"%PDF-" + version + b"\n"
    offsets = {}
    for num, body in objs:
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num + body + b"\nendobj\n"
    xref_off = len(out)
    top = max(offsets) + 1
    out += b"xref\n0 %d\n" % top
    out += b"0000000000 65535 f \n"
    for n in range(1, top):
        if n in offsets:
            out += b"%010d 00000 n \n" % offsets[n]
        else:
            out += b"0000000000 65535 f \n"
    out += (b"trailer\n<< /Size %d /Root 2 0 R" % top) + trailer_extra \
        + b" >>\nstartxref\n%d\n%%%%EOF\n" % xref_off
    return out


def _build(version: bytes, info_body: bytes | None, n_pages: int,
           encrypted: bool = False) -> bytes:
    objs = []
    trailer_extra = b""
    if info_body is not None:
        objs.append((1, info_body))
        trailer_extra += b" /Info 1 0 R"
    objs.append((2, b"<< /Type /Catalog /Pages 3 0 R >>"))
    kids = b" ".join(b"%d 0 R" % (4 + i) for i in range(n_pages))
    objs.append((3, b"<< /Type /Pages /Kids [" + kids
                 + b"] /Count %d >>" % n_pages))
    for i in range(n_pages):
        objs.append((4 + i, b"<< /Type /Page /Parent 3 0 R"
                     b" /MediaBox [0 0 612 792] >>"))
    if encrypted:
        objs.append((9, b"<< /Filter /Standard /V 1 /R 2 >>"))
        trailer_extra += b" /Encrypt 9 0 R"
    return _serialize(version, objs, trailer_extra)


def _rows() -> list:
    a = _build(b"1.4", (
        b"<< /Title (Quarterly Report) /Author (A. Writer)"
        b" /Producer (FixturePress 1.0)"
        b" /CreationDate (D:20240102030405Z) >>"), 2)
    b = _build(b"1.7", (
        b"<< /Title (Claims \\(2024\\) \\(draft\\))"
        b" /Producer (FixturePress 1.0) >>"), 3)
    c = _build(b"1.5", None, 1)
    d = _build(b"1.6", (
        b"<< /Title <" + b"Quarterly Report".hex().upper().encode()
        + b"> /Author (Hex Sender) >>"), 1)
    e = _build(b"1.4", b"<< /Title (Locked Doc) >>", 1, encrypted=True)
    return [
        ("a-plain.pdf", a),
        ("b-escapes.pdf", b),
        ("c-noinfo.pdf", c),
        ("d-hextitle.pdf", d),
        ("e-encrypted.pdf", e),
        ("f-not-pdf", b"GIF89a this is not a pdf at all"),
        ("g-trunc.pdf", b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n1 0 obj\n<< >>"),
    ]


def ensure_pdfinfo_fixture(corpus_dir: str) -> str:
    out_dir = os.path.join(corpus_dir, "pdfinfo")
    path = os.path.join(out_dir, "media.parquet")
    if os.path.exists(path):
        return path
    rows = [(f"https://fixtures.test/pdfinfo/{name}", data)
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
