"""PDF document-information walker tests (kernels/pdfinfo.py).

Anchoring strategy (three-way, the GIF round-3 lesson): byte-built spec
anchors constructed IN THIS FILE straight from PDF 32000-1:2008 §7.3.4
(string syntax) and §14.3.3 (document information dictionary) —
independent of both the kernel and sources/pdfinfo_fixture.py — plus
kernel-vs-fixture parity with hand-written expected values, plus a
hypothesis typed-failure gate.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_spark.kernels.pdfinfo import PdfInfoError, parse_pdf_info
from pdf_parser_spark.sources.pdfinfo_fixture import _rows as fixture_rows


def _pdf(version: bytes, body: bytes, trailer: bytes) -> bytes:
    return (b"%PDF-" + version + b"\n" + body
            + b"trailer\n" + trailer + b"\nstartxref\n0\n%%EOF\n")


_MIN_BODY = (b"2 0 obj\n<< /Type /Catalog /Pages 3 0 R >>\nendobj\n"
             b"3 0 obj\n<< /Type /Pages /Kids [] /Count 0 >>\nendobj\n")


def _with_info(info: bytes) -> bytes:
    return _pdf(b"1.7", b"1 0 obj\n" + info + b"\nendobj\n" + _MIN_BODY,
                b"<< /Size 4 /Root 2 0 R /Info 1 0 R >>")


class TestSpecAnchors:
    def test_minimal(self):
        m = parse_pdf_info(_pdf(b"1.3", _MIN_BODY,
                                b"<< /Size 4 /Root 2 0 R >>"))
        assert m["pdf_version"] == "1.3"
        assert m["n_pages"] == 0 and m["has_info"] is False
        assert m["encrypted"] is False and m["title"] is None

    def test_nested_parens_without_escapes(self):
        # §7.3.4.2: balanced parens are legal unescaped inside a literal
        m = parse_pdf_info(_with_info(b"<< /Title (a (nested) title) >>"))
        assert m["title"] == "a (nested) title"

    def test_octal_and_named_escapes(self):
        m = parse_pdf_info(
            _with_info(rb"<< /Title (tab\there\n\051\100) >>"))
        assert m["title"] == "tab\there\n)@"

    def test_hex_string_odd_length_pads_zero(self):
        # §7.3.4.3: odd hex count implies a trailing 0 digit
        m = parse_pdf_info(_with_info(b"<< /Title <41424> >>"))
        assert m["title"] == "AB@"

    def test_hex_string_whitespace_ignored(self):
        m = parse_pdf_info(_with_info(b"<< /Title <41 42\n43> >>"))
        assert m["title"] == "ABC"

    def test_count_followed_via_refs(self):
        body = (b"2 0 obj\n<< /Type /Catalog /Pages 7 0 R >>\nendobj\n"
                b"7 0 obj\n<< /Type /Pages /Kids [] /Count 42 >>\nendobj\n")
        m = parse_pdf_info(_pdf(b"1.6", body,
                                b"<< /Size 8 /Root 2 0 R >>"))
        assert m["n_pages"] == 42

    def test_multi_digit_info_ref(self):
        body = (b"12 0 obj\n<< /Title (Deep Ref) >>\nendobj\n"
                + _MIN_BODY)
        m = parse_pdf_info(_pdf(
            b"1.7", body, b"<< /Size 13 /Root 2 0 R /Info 12 0 R >>"))
        assert m["title"] == "Deep Ref" and m["has_info"] is True

    def test_encrypt_flag(self):
        m = parse_pdf_info(_pdf(
            b"1.4", _MIN_BODY,
            b"<< /Size 4 /Root 2 0 R /Encrypt 9 0 R >>"))
        assert m["encrypted"] is True

    def test_huge_count_capped_to_null(self):
        body = (b"2 0 obj\n<< /Type /Catalog /Pages 3 0 R >>\nendobj\n"
                b"3 0 obj\n<< /Count " + b"9" * 25 + b" >>\nendobj\n")
        m = parse_pdf_info(_pdf(b"1.5", body,
                                b"<< /Size 4 /Root 2 0 R >>"))
        assert m["n_pages"] is None

    def test_latin1_bytes_survive(self):
        m = parse_pdf_info(_with_info(b"<< /Author (J\xfcrgen) >>"))
        assert m["author"] == "Jürgen"


class TestTypedFailures:
    BAD = [
        b"",
        b"not a pdf",
        b"%PDF-1.4\nno trailer here",
        # trailer without /Root
        b"%PDF-1.4\ntrailer\n<< /Size 1 >>\n%%EOF",
        # /Root points at a missing object
        b"%PDF-1.4\ntrailer\n<< /Root 5 0 R >>\n%%EOF",
        # trailer keyword but no dictionary
        b"%PDF-1.4\ntrailer\njunk",
        # unterminated trailer dictionary
        b"%PDF-1.4\ntrailer\n<< /Root 2 0 R ",
    ]

    @pytest.mark.parametrize("data", BAD)
    def test_raises(self, data):
        with pytest.raises(PdfInfoError):
            parse_pdf_info(data)

    def test_unterminated_literal_string(self):
        with pytest.raises(PdfInfoError):
            parse_pdf_info(_with_info(b"<< /Title (never closed >>"))

    def test_unterminated_hex_string(self):
        with pytest.raises(PdfInfoError):
            parse_pdf_info(_with_info(b"<< /Title <4142 >>"[:-3]))


EXPECTED = {
    "a-plain.pdf": dict(pdf_version="1.4", title="Quarterly Report",
                        author="A. Writer", producer="FixturePress 1.0",
                        creation_date="D:20240102030405Z", n_pages=2,
                        encrypted=False, has_info=True),
    "b-escapes.pdf": dict(pdf_version="1.7",
                          title="Claims (2024) (draft)", author=None,
                          producer="FixturePress 1.0", creation_date=None,
                          n_pages=3, encrypted=False, has_info=True),
    "c-noinfo.pdf": dict(pdf_version="1.5", title=None, author=None,
                         producer=None, creation_date=None, n_pages=1,
                         encrypted=False, has_info=False),
    "d-hextitle.pdf": dict(pdf_version="1.6", title="Quarterly Report",
                           author="Hex Sender", producer=None,
                           creation_date=None, n_pages=1,
                           encrypted=False, has_info=True),
    "e-encrypted.pdf": dict(pdf_version="1.4", title="Locked Doc",
                            author=None, producer=None,
                            creation_date=None, n_pages=1,
                            encrypted=True, has_info=True),
}
BAD_FIXTURES = {"f-not-pdf", "g-trunc.pdf"}


class TestFixtureParity:
    def test_every_fixture_row(self):
        seen = set()
        for name, data in fixture_rows():
            seen.add(name)
            if name in BAD_FIXTURES:
                with pytest.raises(PdfInfoError):
                    parse_pdf_info(data)
                continue
            got = parse_pdf_info(data)
            for k, v in EXPECTED[name].items():
                assert got[k] == v, (name, k, got[k], v)
        assert seen == set(EXPECTED) | BAD_FIXTURES


class TestTypedFailureOnly:
    @settings(max_examples=120, deadline=None)
    @given(data=st.binary(max_size=300))
    def test_random_bytes(self, data):
        try:
            m = parse_pdf_info(data)
            assert isinstance(m, dict)
        except PdfInfoError:
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
            m = parse_pdf_info(bytes(blob))
            assert isinstance(m, dict)
        except PdfInfoError:
            pass
