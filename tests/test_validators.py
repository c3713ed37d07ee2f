"""Validation-layer tests (intent of /root/reference/tests/test_validators.py)."""

from pdf_parser_spark.config import MAX_FILE_SIZE, MIN_FILE_SIZE
from pdf_parser_spark.kernels.validate import (
    validate_extension, validate_magic, validate_pdf_document, validate_size,
)

VALID_HEAD = b"%PDF-1.4\n" + b"x" * 200


class TestSize:
    def test_valid_size_passes(self):
        assert validate_size(VALID_HEAD, "a.pdf") is None

    def test_exactly_min_passes(self):
        assert validate_size(b"x" * MIN_FILE_SIZE, "a.pdf") is None

    def test_exactly_max_passes(self):
        assert validate_size(b"%PDF" + b"x" * (MAX_FILE_SIZE - 4), "a.pdf") is None

    def test_over_max_fails_with_message(self):
        err = validate_size(b"x" * (MAX_FILE_SIZE + 1), "big.pdf")
        assert err is not None and "too large" in err and "50MB" in err

    def test_under_min_fails_with_message(self):
        err = validate_size(b"x" * (MIN_FILE_SIZE - 1), "small.pdf")
        assert err is not None and "too small or corrupted" in err


class TestMagic:
    def test_valid_magic(self):
        assert validate_magic(b"%PDF-1.7 etc", "a.pdf") is None

    def test_bad_magic(self):
        err = validate_magic(b"This is not a PDF file" + b"x" * 100, "a.pdf")
        assert err is not None and "is not a valid PDF file" in err

    def test_truncated_magic(self):
        assert validate_magic(b"%PD", "a.pdf") is not None
        assert validate_magic(b"", "a.pdf") is not None
        assert validate_magic(b"PDF-1.4", "a.pdf") is not None

    def test_magic_must_be_at_start(self):
        assert validate_magic(b" %PDF-1.4", "a.pdf") is not None


class TestExtension:
    def test_lowercase(self):
        assert validate_extension("doc.pdf") is None

    def test_case_insensitive(self):
        assert validate_extension("DOC.PDF") is None
        assert validate_extension("Doc.Pdf") is None

    def test_wrong_extension(self):
        err = validate_extension("doc.txt")
        assert err is not None and "Invalid file extension" in err and ".txt" in err

    def test_no_extension(self):
        assert validate_extension("document") is not None


class TestChain:
    def test_order_size_before_magic(self):
        # an over-size file with bad magic must report the size error first
        err = validate_pdf_document(b"x" * (MAX_FILE_SIZE + 1), "a.pdf")
        assert err is not None and "too large" in err

    def test_magic_before_extension(self):
        err = validate_pdf_document(b"not pdf" + b"x" * 200, "a.txt")
        assert err is not None and "not a valid PDF" in err

    def test_all_pass(self):
        assert validate_pdf_document(VALID_HEAD, "a.pdf") is None
