"""Deterministic PDF writer for corpus synthesis (pure Python, Spark-free).

Produces small-but-real PDFs exercising the same feature set as the
reference's golden fixture (/root/reference/pdf_for_tests.pdf: PDF 1.7,
classic xref table, FlateDecode content streams, multi-page, fonts with
ToUnicode CMaps): used by corpus.py to synthesize the Common-Crawl-style
input table. Never copied from anywhere — hand-rolled from the public spec.

Two font modes:
  * "simple": single-byte WinAnsi-ish font with /FirstChar + /Widths
  * "cid":    /Type0 Identity-H font, 2-byte codes, ToUnicode bfchar CMap + /W

Every byte is a pure function of the inputs (no clocks, no randomness here;
callers inject seeded randomness for content variety).
"""

from __future__ import annotations

import zlib
from typing import Dict, List, Optional, Sequence, Tuple

__all__ = ["build_pdf", "MINIMAL_PDF"]

_CHAR_WIDTH = 500   # all glyphs 500/1000 em wide (deterministic layout)
_FONT_SIZE = 11
_LEADING = 14
_LEFT = 72
_TOP = 760
_PAGE_W, _PAGE_H = 612, 792


def _esc_literal(s: bytes) -> bytes:
    return s.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


class _CidFont:
    """Assigns 2-byte codes per unique character; renders the CMap + /W."""

    def __init__(self) -> None:
        self.codes: Dict[str, int] = {}

    def encode(self, text: str) -> bytes:
        out = bytearray()
        for ch in text:
            code = self.codes.setdefault(ch, len(self.codes) + 1)
            out += code.to_bytes(2, "big")
        return bytes(out)

    def tounicode_cmap(self) -> bytes:
        lines = [
            b"/CIDInit /ProcSet findresource begin",
            b"12 dict begin begincmap",
            b"/CMapName /Adobe-Identity-UCS def /CMapType 2 def",
            b"1 begincodespacerange <0000> <FFFF> endcodespacerange",
        ]
        items = sorted(self.codes.items(), key=lambda kv: kv[1])
        for start in range(0, len(items), 100):
            chunk = items[start : start + 100]
            lines.append(b"%d beginbfchar" % len(chunk))
            for ch, code in chunk:
                dst = ch.encode("utf-16-be").hex().encode("ascii")
                lines.append(b"<%04x> <%s>" % (code, dst))
            lines.append(b"endbfchar")
        lines += [b"endcmap end end"]
        return b"\n".join(lines)

    def w_array(self) -> bytes:
        if not self.codes:
            return b"[]"
        max_code = max(self.codes.values())
        return b"[1 %d %d]" % (max_code, _CHAR_WIDTH)


def _content_for_page(
    lines: Sequence[str], cid: Optional[_CidFont], kern_every: int
) -> bytes:
    """One BT..ET block; first line positioned with Td, then T* per line.

    Every `kern_every`-th show op is emitted as a TJ array with a small
    (-20/1000 em, ~0.22pt at 11pt: below the 3pt word gap) kern split, to
    exercise TJ number handling without changing the expected text.
    """
    ops: List[bytes] = [
        b"BT",
        b"/F1 %d Tf" % _FONT_SIZE,
        b"%d TL" % _LEADING,
        b"%d %d Td" % (_LEFT, _TOP),
    ]
    for i, line in enumerate(lines):
        if i > 0:
            ops.append(b"T*")
        if cid is not None:
            payload = cid.encode(line)
            hexed = payload.hex().encode("ascii")
            if kern_every and i % kern_every == 1 and len(payload) > 8:
                cut = (len(payload) // 4) * 2  # stay on a 2-byte code boundary
                ops.append(
                    b"[<%s> -20 <%s>] TJ"
                    % (payload[:cut].hex().encode("ascii"), payload[cut:].hex().encode("ascii"))
                )
            else:
                ops.append(b"<%s> Tj" % hexed)
        else:
            payload = line.encode("latin-1", errors="replace")
            if kern_every and i % kern_every == 1 and len(payload) > 4:
                cut = len(payload) // 2
                ops.append(
                    b"[(%s) -20 (%s)] TJ"
                    % (_esc_literal(payload[:cut]), _esc_literal(payload[cut:]))
                )
            else:
                ops.append(b"(%s) Tj" % _esc_literal(payload))
    ops.append(b"ET")
    return b"\n".join(ops)


def build_pdf(
    pages: Sequence[Sequence[str]],
    font_mode: str = "cid",
    compress: bool = True,
    pad_bytes: int = 0,
    pad_seed: int = 0,
    kern_every: int = 3,
    corrupt_page: Optional[int] = None,
) -> bytes:
    """Serialize a multi-page PDF. pages = list of pages, each a list of lines.

    pad_bytes: append an incompressible dummy stream object of roughly this
    size (seeded xorshift bytes) to synthesize mega-documents for skew tests.
    corrupt_page: if set, that page's content stream bytes are corrupted after
    compression (exercises page-level error recovery).
    """
    cid = _CidFont() if font_mode == "cid" else None
    objs: List[bytes] = []  # 1-indexed object bodies

    def add(body: bytes) -> int:
        objs.append(body)
        return len(objs)

    n_pages = len(pages)
    # fixed layout: 1=Catalog, 2=Pages, then per page (Page, Contents), font...
    catalog_num = add(b"<< /Type /Catalog /Pages 2 0 R >>")
    pages_num = add(b"PLACEHOLDER-PAGES")
    page_nums: List[int] = []
    content_nums: List[int] = []
    for pi, page_lines in enumerate(pages):
        raw = _content_for_page(page_lines, cid, kern_every)
        if compress:
            enc = zlib.compress(raw)
            if corrupt_page == pi:
                enc = enc[: max(2, len(enc) // 2)] + b"\x00\x00garbage"
            body = b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream" % (len(enc), enc)
        else:
            if corrupt_page == pi:
                raw = raw[: len(raw) // 2] + b"\xff\xfe<<]]"
            body = b"<< /Length %d >>\nstream\n%s\nendstream" % (len(raw), raw)
        c_num = add(body)
        content_nums.append(c_num)
        p_num = add(b"PLACEHOLDER-PAGE")
        page_nums.append(p_num)

    if cid is not None:
        cmap = cid.tounicode_cmap()
        cmap_enc = zlib.compress(cmap)
        cmap_num = add(
            b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
            % (len(cmap_enc), cmap_enc)
        )
        desc_num = add(
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /SynthSans"
            b" /CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) /Supplement 0 >>"
            b" /DW %d /W %s >>" % (_CHAR_WIDTH, cid.w_array())
        )
        font_num = add(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /SynthSans /Encoding /Identity-H"
            b" /DescendantFonts [%d 0 R] /ToUnicode %d 0 R >>" % (desc_num, cmap_num)
        )
    else:
        widths = b"[" + b" ".join(b"%d" % _CHAR_WIDTH for _ in range(32, 256)) + b"]"
        font_num = add(
            b"<< /Type /Font /Subtype /TrueType /BaseFont /SynthSerif"
            b" /FirstChar 32 /LastChar 255 /Widths %s /Encoding /WinAnsiEncoding >>" % widths
        )

    if pad_bytes > 0:
        blob = bytearray()
        x = (pad_seed * 2654435761 + 1) & 0xFFFFFFFF
        while len(blob) < pad_bytes:
            x ^= (x << 13) & 0xFFFFFFFF
            x ^= x >> 17
            x ^= (x << 5) & 0xFFFFFFFF
            blob += x.to_bytes(4, "big")
        add(b"<< /Length %d >>\nstream\n%s\nendstream" % (len(blob), bytes(blob)))

    # patch placeholders
    kids = b" ".join(b"%d 0 R" % n for n in page_nums)
    objs[pages_num - 1] = (
        b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, n_pages)
    )
    for p_num, c_num in zip(page_nums, content_nums):
        objs[p_num - 1] = (
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d]"
            b" /Resources << /Font << /F1 %d 0 R >> >> /Contents %d 0 R >>"
            % (_PAGE_W, _PAGE_H, font_num, c_num)
        )

    out = bytearray(b"%PDF-1.7\n%\xe2\xe3\xcf\xd3\n")
    offsets: List[int] = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i
        out += body
        out += b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, catalog_num, xref_at)
    )
    return bytes(out)


# Hand-written single-page PDF in the spirit of the reference's minimal
# conftest fixture (/root/reference/tests/conftest.py:52-123): uncompressed
# content stream, simple font, no ToUnicode — exercises the plain path.
MINIMAL_PDF = build_pdf(
    [["Customer Name: John Doe"]], font_mode="simple", compress=False, kern_every=0
)
