"""PDF text kernel tests (intent of /root/reference/tests/test_extractors.py
text-extraction half, plus golden-corpus anchors the reference pins via its
fixture PDFs and extractions.db)."""

import hashlib

import pytest

from pdf_parser_spark.kernels.fields import canonical_json, extract_fields
from pdf_parser_spark.kernels.pdfgen import MINIMAL_PDF, build_pdf
from pdf_parser_spark.kernels.pdftext import (
    PDFProcessingError, extract_pages, extract_text,
)

REFERENCE_FIXTURE = "/root/reference/pdf_for_tests.pdf"

PAGES = [
    ["INSURANCE CLAIM FORM", "Customer Name: Jan Kowalski",
     "Policy Number: POL-789456123"],
    ["Claim Amount: $3,450.00", "Status: Under Review",
     "Address: 31-066 Kraków, Poland"],
]
EXPECTED = "\n".join("\n".join(p) for p in PAGES)


class TestRoundTrip:
    @pytest.mark.parametrize("mode", ["cid", "simple"])
    @pytest.mark.parametrize("compress", [True, False])
    def test_modes(self, mode, compress):
        pdf = build_pdf(PAGES, font_mode=mode, compress=compress)
        assert extract_text(pdf) == EXPECTED

    def test_pages_joined_with_newline(self):
        pdf = build_pdf(PAGES)
        assert extract_text(pdf).count("\n") == 5  # 6 lines across 2 pages

    def test_minimal_uncompressed_pdf(self):
        # spirit of /root/reference/tests/conftest.py:52-123
        assert extract_text(MINIMAL_PDF) == "Customer Name: John Doe"

    def test_kerned_tj_does_not_split_words(self):
        pdf = build_pdf(PAGES, kern_every=1)
        assert extract_text(pdf) == EXPECTED

    def test_unicode_via_cmap(self):
        pdf = build_pdf([["Zażółć gęślą jaźń — José García"]], font_mode="cid")
        assert extract_text(pdf) == "Zażółć gęślą jaźń — José García"

    def test_mega_padding_does_not_change_text(self):
        pdf = build_pdf(PAGES, pad_bytes=500_000, pad_seed=3)
        assert len(pdf) > 500_000
        assert extract_text(pdf) == EXPECTED


class TestErrorSemantics:
    def test_corrupt_page_is_skipped(self):
        # page-level recovery: text_extractor.py:50-56 semantics
        pdf = build_pdf(PAGES, corrupt_page=0)
        assert extract_text(pdf) == "\n".join(PAGES[1])

    def test_all_pages_corrupt_raises(self):
        pdf = build_pdf([PAGES[0]], corrupt_page=0)
        with pytest.raises(PDFProcessingError, match="Failed to extract text from any page"):
            extract_text(pdf)

    def test_no_pages_raises(self):
        pdf = build_pdf([])
        with pytest.raises(PDFProcessingError, match="PDF contains no pages"):
            extract_text(pdf)

    def test_garbage_raises_reading_error(self):
        with pytest.raises(PDFProcessingError):
            extract_text(b"%PDF-1.4 garbage with no objects at all")

    def test_not_pdf_raises(self):
        with pytest.raises(PDFProcessingError):
            extract_text(b"hello world")

    def test_empty_page_skipped_in_join(self):
        pdf = build_pdf([PAGES[0], [], PAGES[1]])
        assert extract_text(pdf) == EXPECTED


class TestReferenceGolden:
    """Byte-identity anchors against the reference's own fixture corpus."""

    @pytest.fixture(scope="class")
    def fixture_bytes(self):
        with open(REFERENCE_FIXTURE, "rb") as f:
            return f.read()

    def test_hash_anchor(self, fixture_bytes):
        # pdf_processor.py:65 -> extractions.db file_hash column
        assert hashlib.sha256(fixture_bytes).hexdigest()[:6] == "12ebd4"

    def test_five_pages(self, fixture_bytes):
        assert len(extract_pages(fixture_bytes)) == 5

    def test_classic_golden_record(self, fixture_bytes):
        # must reproduce extractions.db rows 1-4 byte-for-byte
        text = extract_text(fixture_bytes)
        got = canonical_json(extract_fields(text))
        assert got == (
            '{"customer_name": "Jan Kowalski", '
            '"policy_number": "POL-789456123", '
            '"claim_amount": "3,450.00"}'
        )

    def test_key_lines_present(self, fixture_bytes):
        text = extract_text(fixture_bytes)
        for line in [
            "INSURANCE CLAIM FORM",
            "Customer Name: Jan Kowalski",
            "Policy Number: POL-789456123",
            "Claim Amount: $3,450.00",
            "Address: ul. Krakowska 15/3, 31-066 Kraków, Poland",
            "Agent Name: Anna Nowak",
        ]:
            assert line in text, line
