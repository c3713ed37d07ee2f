"""Stream-filter decoders (PDF 1.7 §7.4): ASCII85, RunLength, LZW — beyond
the FlateDecode/ASCIIHex the fixture corpus uses, these make the lexer hold
up on real-world Common-Crawl PDFs."""

from __future__ import annotations

import base64
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_spark.kernels.pdftext import (
    PDFProcessingError, StreamObj, _ascii85_decode, _lzw_decode,
    _runlength_decode, decode_stream,
)


def _rl_encode(data: bytes) -> bytes:
    """Independent RunLength encoder (literal runs only + repeats)."""
    out = bytearray()
    i = 0
    while i < len(data):
        # find repeat run
        j = i
        while j < len(data) - 1 and data[j] == data[j + 1] and j - i < 126:
            j += 1
        if j > i:  # run of length j-i+1 >= 2
            out += bytes([257 - (j - i + 1), data[i]])
            i = j + 1
        else:
            k = min(i + 128, len(data))
            # stop literal before a run starts
            m = i
            while m < k - 1 and not (m + 1 < len(data) and data[m] == data[m + 1]):
                m += 1
            lit = data[i : m + 1]
            out += bytes([len(lit) - 1]) + lit
            i = m + 1
    out.append(128)
    return bytes(out)


def _lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """Independent LZW encoder (PDF/TIFF variant) for roundtrip testing."""
    CLEAR, EOD = 256, 257
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out_bits = []

    def emit(code, w):
        out_bits.append((code, w))

    emit(CLEAR, width)
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
        else:
            emit(table[w], width)
            table[wc] = next_code
            next_code += 1
            if next_code + (1 if early_change else 0) > (1 << width) and width < 12:
                width += 1
            w = bytes([ch])
    if w:
        emit(table[w], width)
    emit(EOD, width)
    acc = nbits = 0
    out = bytearray()
    for code, cw in out_bits:
        acc = (acc << cw) | code
        nbits += cw
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


class TestAscii85:
    def test_known_vector(self):
        # 'Man ' -> 9jqo^ is the canonical example ('sure' -> F*2M7)
        assert _ascii85_decode(b"9jqo^~>") == b"Man "
        assert _ascii85_decode(b"<~9jqo^F*2M7~>") == b"Man sure"

    def test_z_shorthand(self):
        assert _ascii85_decode(b"z~>") == b"\x00\x00\x00\x00"

    def test_partial_group(self):
        # encoding of b'hi' is BQ&- minus padding -> 'BQ%' decodes 2 bytes
        enc = base64.a85encode(b"hi")
        assert _ascii85_decode(enc + b"~>") == b"hi"

    @settings(max_examples=50, deadline=None)
    @given(data=st.binary(max_size=200))
    def test_roundtrip_stdlib(self, data):
        assert _ascii85_decode(base64.a85encode(data) + b"~>") == data

    def test_invalid_char_raises(self):
        with pytest.raises(PDFProcessingError):
            _ascii85_decode(b"\x7f\x7f\x7f\x7f\x7f")

    def test_group_overflow_raises_typed_error(self):
        # b'uuuuu' encodes 85^5-ish > 2^32-1: must stay inside the module's
        # typed-error contract, not escape as OverflowError
        with pytest.raises(PDFProcessingError, match="overflow"):
            _ascii85_decode(b"uuuuu~>")
        with pytest.raises(PDFProcessingError, match="overflow"):
            _ascii85_decode(b"uuuu~>")  # partial-group path


class TestRunLength:
    @settings(max_examples=50, deadline=None)
    @given(data=st.binary(max_size=300))
    def test_roundtrip(self, data):
        assert _runlength_decode(_rl_encode(data)) == data

    def test_repeat_run(self):
        assert _runlength_decode(bytes([257 - 5, 65, 128])) == b"AAAAA"

    def test_literal(self):
        assert _runlength_decode(bytes([2]) + b"abc" + bytes([128])) == b"abc"


class TestLZW:
    @settings(max_examples=40, deadline=None)
    @given(data=st.binary(max_size=400))
    def test_roundtrip(self, data):
        assert _lzw_decode(_lzw_encode(data)) == data

    def test_roundtrip_no_early_change(self):
        data = b"abcabcabcabc" * 20
        assert _lzw_decode(_lzw_encode(data, 0), early_change=0) == data

    def test_repetitive_input_grows_codes(self):
        data = bytes(random.Random(3).randrange(4) for _ in range(5000))
        assert _lzw_decode(_lzw_encode(data)) == data

    def test_invalid_code_raises(self):
        with pytest.raises(PDFProcessingError):
            # 9-bit codes [Clear=256, 300]: 300 is far beyond the table;
            # 18 bits of payload left-aligned into 3 bytes
            bits = ((256 << 9) | 300) << 6
            _lzw_decode(bits.to_bytes(3, "big"))


class TestFilterChain:
    def test_chained_a85_then_flate(self):
        import zlib

        payload = b"BT (chained filters) Tj ET" * 4
        raw = base64.a85encode(zlib.compress(payload)) + b"~>"
        s = StreamObj({"Filter": ["ASCII85Decode", "FlateDecode"]}, raw)
        assert decode_stream(s) == payload

    def test_runlength_in_chain(self):
        payload = b"AAAABBBCCD" * 10
        s = StreamObj({"Filter": "RunLengthDecode"}, _rl_encode(payload))
        assert decode_stream(s) == payload

    def test_lzw_named_filter(self):
        payload = b"stream payload with repeats repeats repeats"
        s = StreamObj({"Filter": "LZWDecode"}, _lzw_encode(payload))
        assert decode_stream(s) == payload


def _mini_pdf_with_differences(content: bytes, differences: bytes) -> bytes:
    """Hand-built single-page PDF with a /Differences-encoded simple font
    and no ToUnicode CMap (the pre-Unicode-era encoding path)."""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
        b"STREAM",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /FirstChar 32 /LastChar 255 /Encoding << /Type /Encoding"
        b" /Differences [ " + differences + b" ] >> >>",
    ]
    out = bytearray(b"%PDF-1.7\n")
    offsets = []
    for n, body in enumerate(objs, 1):
        offsets.append(len(out))
        if body == b"STREAM":
            out += b"%d 0 obj\n<< /Length %d >>\nstream\n" % (n, len(content))
            out += content + b"\nendstream\nendobj\n"
        else:
            out += b"%d 0 obj\n" % n + body + b"\nendobj\n"
    xref = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
        len(objs) + 1, xref)
    return bytes(out)


class TestDifferencesEncoding:
    def test_differences_override_decoding(self):
        from pdf_parser_spark.kernels.pdftext import extract_text

        pdf = _mini_pdf_with_differences(
            b"BT /F1 11 Tf 72 760 Td (caf\x82 na\x83ve) Tj ET",
            b"130 /eacute 131 /idieresis",
        )
        assert extract_text(pdf) == "café naïve"

    def test_uniXXXX_names(self):
        from pdf_parser_spark.kernels.pdftext import extract_text

        pdf = _mini_pdf_with_differences(
            b"BT /F1 11 Tf 72 760 Td (x\x82y) Tj ET",
            b"130 /uni0141",  # LATIN CAPITAL LETTER L WITH STROKE
        )
        assert extract_text(pdf) == "xŁy"

    def test_glyphname_mapping_rules(self):
        from pdf_parser_spark.kernels.pdftext import _glyphname_to_uni

        assert _glyphname_to_uni("eacute") == "é"
        assert _glyphname_to_uni("uni00E9") == "é"
        assert _glyphname_to_uni("u00E9") == "é"
        assert _glyphname_to_uni("uni00480065") == "He"
        assert _glyphname_to_uni("a") == "a"
        assert _glyphname_to_uni("notaglyphname") == ""


class TestFormXObjectAndEncryption:
    def _pdf_with_form(self) -> bytes:
        page_content = b"BT /F1 11 Tf 72 760 Td (on the page) Tj ET /X1 Do"
        form_content = b"BT /F1 11 Tf 0 0 Td (inside the form) Tj ET"
        objs = [
            b"<< /Type /Catalog /Pages 2 0 R >>",
            b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] /Contents 4 0 R"
            b" /Resources << /Font << /F1 5 0 R >> /XObject << /X1 6 0 R >> >> >>",
            (b"STREAM", page_content, b""),
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
            b" /FirstChar 32 /LastChar 255 >>",
            (b"STREAM", form_content,
             b"/Type /XObject /Subtype /Form /Matrix [1 0 0 1 72 700] "),
        ]
        out = bytearray(b"%PDF-1.7\n")
        offsets = []
        for n, body in enumerate(objs, 1):
            offsets.append(len(out))
            if isinstance(body, tuple):
                _, content, extra = body
                out += b"%d 0 obj\n<< %s/Length %d >>\nstream\n" % (n, extra, len(content))
                out += content + b"\nendstream\nendobj\n"
            else:
                out += b"%d 0 obj\n" % n + body + b"\nendobj\n"
        xref = len(out)
        out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
        for off in offsets:
            out += b"%010d 00000 n \n" % off
        out += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
            len(objs) + 1, xref)
        return bytes(out)

    def test_form_xobject_text_extracted(self):
        from pdf_parser_spark.kernels.pdftext import extract_text

        text = extract_text(self._pdf_with_form())
        assert "on the page" in text
        assert "inside the form" in text
        # the form matrix places its text at y=700, below the page line
        assert text.index("on the page") < text.index("inside the form")

    def test_cyclic_form_terminates(self):
        # a form that Do's itself must hit the depth limit, not recurse forever
        from pdf_parser_spark.kernels.pdftext import extract_text

        pdf = self._pdf_with_form().replace(
            b"BT /F1 11 Tf 0 0 Td (inside the form) Tj ET",
            b"BT /F1 11 Tf 0 0 Td (inside the fo) Tj ET /X1 Do    ",
        )
        assert "inside the fo" in extract_text(pdf)

    def test_encrypted_pdf_clear_error(self):
        from pdf_parser_spark.kernels.pdfgen import build_pdf
        from pdf_parser_spark.kernels.pdftext import (
            PDFProcessingError, extract_text,
        )

        pdf = build_pdf([["secret"]], font_mode="simple")
        enc = pdf.replace(b"/Root", b"/Encrypt 9 0 R /Root")
        with pytest.raises(PDFProcessingError, match="encrypted"):
            extract_text(enc)
