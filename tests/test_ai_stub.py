"""AI-mode surface tests (intent of the AI half of
/root/reference/tests/test_extractors.py, with the model stubbed exactly as
the reference's own conftest mocks it)."""

import pytest

from pdf_parser_spark.kernels.ai_stub import (
    DISCOVERY_TRUNCATION, EXTRACTION_TRUNCATION,
    ai_extract, build_discovery_prompt, build_extraction_prompt,
    discover_labels, filter_labels, parse_extraction_result,
)
from pdf_parser_spark.kernels.fields import DataExtractionError


class TestLabelFiltering:
    def test_band_filter(self):
        # keep only 2 < len < 40 (test_extractors.py:327-341 intent)
        raw = "A, AB, Valid Label Name, Another Valid Label, " + "x" * 50
        assert filter_labels(raw) == ["Valid Label Name", "Another Valid Label"]

    def test_top_15_cap(self):
        raw = ", ".join(f"Label {i:02d}" for i in range(30))
        out = filter_labels(raw)
        assert len(out) == 15 and out[0] == "Label 00"

    def test_empty_response(self):
        assert filter_labels("") == []

    def test_order_preserved(self):
        assert filter_labels("Zebra Field, Alpha Field") == ["Zebra Field", "Alpha Field"]


class TestPrompts:
    def test_discovery_truncation(self):
        p = build_discovery_prompt("x" * 10_000)
        assert p.endswith("x" * 100)
        assert len(p) < DISCOVERY_TRUNCATION + 200

    def test_extraction_truncation(self):
        p = build_extraction_prompt(["a", "b"], "y" * 50_000)
        assert p.startswith("Extract: a, b\n\n")
        assert len(p) < EXTRACTION_TRUNCATION + 200

    def test_fields_joined(self):
        assert "Extract: one, two, three" in build_extraction_prompt(
            ["one", "two", "three"], "t"
        )


class TestJsonSniffing:
    def test_json_in_prose(self):
        out = parse_extraction_result('Sure! Here it is: {"a": "1"} hope that helps')
        assert out == {"a": "1"}

    def test_multiline_json(self):
        assert parse_extraction_result('{\n "a": "1"\n}') == {"a": "1"}

    def test_no_json_raises(self):
        with pytest.raises(DataExtractionError, match="did not return valid JSON"):
            parse_extraction_result("no braces here")

    def test_malformed_json_raises(self):
        with pytest.raises(DataExtractionError, match="JSON parsing error"):
            parse_extraction_result('{"a": }')

    def test_bare_array_raises(self):
        # no {...} blob at all -> "did not return valid JSON"
        with pytest.raises(DataExtractionError, match="did not return valid JSON"):
            parse_extraction_result("[1, 2, 3]")

    def test_greedy_sniff_spans_first_to_last_brace(self):
        # re.search(r"{.*}", re.S) is greedy: two blobs -> one invalid span
        with pytest.raises(DataExtractionError, match="JSON parsing error"):
            parse_extraction_result('{"a": "1"} noise {"b": }')


class TestEndToEnd:
    def test_discover_with_stub(self):
        labels = discover_labels("Some document text")
        assert labels == ["Customer Name", "Policy Number", "Claim Amount"]

    def test_extract_with_stub(self):
        out = ai_extract("Some document text", ["customer_name"])
        assert out == {"customer_name": "John Doe", "policy_number": "POL-123"}

    def test_empty_text_raises(self):
        with pytest.raises(DataExtractionError, match="No text content"):
            ai_extract("   ", ["f"])

    def test_no_fields_raises(self):
        with pytest.raises(DataExtractionError, match="No fields specified"):
            ai_extract("text", [])
