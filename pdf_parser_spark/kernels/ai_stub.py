"""Deterministic AI-mode surface (pure Python, Spark-free).

The reference's AI extractor (/root/reference/src/pdf_parser/extractors/
ai_extractor.py) calls OpenAI; its own test suite replaces the network call
with a canned response (/root/reference/tests/conftest.py:161-172). We keep
the same *surface* — prompt assembly with truncation, label post-processing,
JSON sniff-and-parse — as pure deterministic functions, with a pluggable
`model` callable whose default is a canned-stub, exactly as the tests treat it.
"""

from __future__ import annotations

import json
import re
from typing import Callable, Dict, List, Sequence

from .fields import DataExtractionError

__all__ = [
    "build_extraction_prompt", "build_discovery_prompt", "filter_labels",
    "parse_extraction_result", "stub_model", "discover_labels", "ai_extract",
]

DISCOVERY_TRUNCATION = 3_000   # ai_extractor.py:117
EXTRACTION_TRUNCATION = 20_000  # ai_extractor.py:197
MAX_LABELS = 15                 # ai_extractor.py:93

_JSON_SNIFF = re.compile(r"\{.*\}", re.S)  # ai_extractor.py:215


def build_discovery_prompt(text: str, max_labels: int = MAX_LABELS) -> str:
    return (
        "Return comma-separated labels (no values) that look like form-field names "
        f"in the document below (≤{max_labels}).\n\n{text[:DISCOVERY_TRUNCATION]}"
    )


def build_extraction_prompt(fields: Sequence[str], text: str) -> str:
    return (
        f"Extract: {', '.join(fields)}\n\n"
        'Return ONLY compact JSON {"Field":"Value"}. '
        "If a field is missing, set null.\n\n" + text[:EXTRACTION_TRUNCATION]
    )


def filter_labels(raw_response: str, max_labels: int = MAX_LABELS) -> List[str]:
    """Split on commas, trim, keep 2 < len < 40, cap at max_labels (order kept)."""
    if not raw_response:
        return []
    labels = [
        label.strip()
        for label in raw_response.split(",")
        if 2 < len(label.strip()) < 40
    ]
    return labels[:max_labels]


def parse_extraction_result(raw_response: str) -> Dict[str, str]:
    """Sniff the first {...} blob out of free text and parse it as a dict."""
    m = _JSON_SNIFF.search(raw_response)
    if not m:
        raise DataExtractionError("AI did not return valid JSON")
    try:
        result = json.loads(m.group(0))
    except json.JSONDecodeError as e:
        raise DataExtractionError(f"JSON parsing error from AI response: {e}")
    if not isinstance(result, dict):
        raise DataExtractionError("AI returned invalid data format")
    return result


def stub_model(prompt: str) -> str:
    """Deterministic stand-in for the chat model (mirrors the reference mocks)."""
    if prompt.startswith("Return comma-separated labels"):
        return "Customer Name, Policy Number, Claim Amount"
    return '{"customer_name": "John Doe", "policy_number": "POL-123"}'


def discover_labels(
    text: str,
    model: Callable[[str], str] = stub_model,
    max_labels: int = MAX_LABELS,
) -> List[str]:
    if not text or not text.strip():
        raise DataExtractionError("No text content to analyze")
    raw = model(build_discovery_prompt(text, max_labels))
    return filter_labels(raw, max_labels)


def ai_extract(
    text: str,
    fields: Sequence[str],
    model: Callable[[str], str] = stub_model,
) -> Dict[str, str]:
    if not text or not text.strip():
        raise DataExtractionError("No text content to process")
    if not fields:
        raise DataExtractionError("No fields specified for extraction")
    raw = model(build_extraction_prompt(fields, text))
    return parse_extraction_result(raw)
