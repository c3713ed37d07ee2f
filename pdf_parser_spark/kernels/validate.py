"""Document validation predicates (pure Python, Spark-free).

Mirrors /root/reference/src/pdf_parser/validators/validators.py:24-96 —
size band, %PDF magic, .pdf extension — but returns an error string instead
of raising, because in the distributed engine a bad row is routed to the
error side of the output rather than aborting the batch
(/root/reference/src/pdf_parser/processors/batch_processor.py:84-88).
"""

from __future__ import annotations

from typing import Optional

from ..config import MAX_FILE_SIZE, MIN_FILE_SIZE

__all__ = [
    "validate_size", "validate_magic", "validate_extension",
    "validate_pdf_document", "is_pdf_bytes", "is_pdf_url", "is_html_bytes",
]


def validate_size(doc_bytes: bytes, name: str) -> Optional[str]:
    if len(doc_bytes) > MAX_FILE_SIZE:
        return f"File {name} is too large. Maximum size: {MAX_FILE_SIZE // (1024 * 1024)}MB"
    if len(doc_bytes) < MIN_FILE_SIZE:
        return f"File {name} is too small or corrupted"
    return None


def validate_magic(doc_bytes: bytes, name: str) -> Optional[str]:
    if not doc_bytes.startswith(b"%PDF"):
        return f"File {name} is not a valid PDF file"
    return None


def validate_extension(name: str) -> Optional[str]:
    if not name.lower().endswith(".pdf"):
        suffix = name[name.rfind(".") :] if "." in name.rsplit("/", 1)[-1] else ""
        return f"Invalid file extension. Expected .pdf, got: {suffix}"
    return None


def validate_pdf_document(doc_bytes: bytes, name: str) -> Optional[str]:
    """Full validation chain in reference order: size -> magic -> extension."""
    return (
        validate_size(doc_bytes, name)
        or validate_magic(doc_bytes, name)
        or validate_extension(name)
    )


def is_pdf_bytes(doc_bytes: bytes) -> bool:
    return doc_bytes.startswith(b"%PDF")


def is_pdf_url(url: str) -> bool:
    return url.lower().endswith(".pdf")


def is_html_bytes(doc_bytes: bytes) -> bool:
    head = doc_bytes[:256].lstrip().lower()
    return head.startswith(b"<!doctype html") or head.startswith(b"<html") or b"<html" in head
