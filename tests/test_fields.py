"""Field-extraction kernel tests (intent of the classic-extractor half of
/root/reference/tests/test_extractors.py and the serialization tests of
/root/reference/tests/test_database.py)."""

import pytest

from pdf_parser_spark.kernels.fields import (
    DataExtractionError, canonical_json, compile_config, extract_fields,
    extract_fields_with_spans,
)


class TestClassicSemantics:
    def test_golden_four_line_text(self, sample_text):
        assert extract_fields(sample_text) == {
            "customer_name": "John Smith",
            "policy_number": "POL-123456",
            "claim_amount": "1,500.00",  # $ excluded by the capture group
        }

    def test_first_match_wins(self):
        text = "Customer Name: First Person\nCustomer Name: Second Person"
        assert extract_fields(text)["customer_name"] == "First Person"

    def test_multi_pattern_fallback(self):
        cfg = compile_config({
            "f": {"display": "F", "patterns": [r"NOPE(\d+)", r"Value[:\s]*(\d+)"]},
        })
        assert extract_fields("Value: 42", compiled=cfg) == {"f": "42"}

    def test_unknown_field_skipped_not_error(self, sample_text):
        assert extract_fields(sample_text, fields=["unknown_field"]) == {}

    def test_unmatched_fields_omitted(self):
        out = extract_fields("Policy Number: POL-1")
        assert out == {"policy_number": "POL-1"}
        assert "customer_name" not in out

    def test_empty_text_raises(self):
        with pytest.raises(DataExtractionError, match="No text content to process"):
            extract_fields("")

    def test_whitespace_text_raises(self):
        with pytest.raises(DataExtractionError, match="No text content to process"):
            extract_fields("   \n\t   ")

    def test_case_insensitive(self):
        assert extract_fields("CUSTOMER NAME: Ada Lovelace")["customer_name"] == "Ada Lovelace"

    def test_value_stripped(self):
        assert extract_fields("Policy Number:   POL-9  ")["policy_number"] == "POL-9"

    def test_unicode_name_class(self):
        # À-ž covers Polish/Czech/Spanish letters
        out = extract_fields("Customer Name: Łukasz Wiśniewski")
        assert out["customer_name"] == "Łukasz Wiśniewski"

    def test_bad_pattern_raises_at_compile(self):
        with pytest.raises(DataExtractionError, match="Regex compilation error"):
            compile_config({"f": {"display": "F", "patterns": ["[unclosed"]}})

    def test_insertion_order_preserved(self, sample_text):
        assert list(extract_fields(sample_text).keys()) == [
            "customer_name", "policy_number", "claim_amount",
        ]


class TestSpans:
    def test_span_offsets_point_at_values(self, sample_text):
        out, spans = extract_fields_with_spans(sample_text)
        for field, start, end in spans:
            assert sample_text[start:end].strip() == out[field]

    def test_span_fields_match_keys(self, sample_text):
        out, spans = extract_fields_with_spans(sample_text)
        assert [s[0] for s in spans] == list(out.keys())


class TestCanonicalJson:
    def test_ensure_ascii_false(self):
        # test_database.py:241-263 intent: raw UTF-8, no \uXXXX escapes
        s = canonical_json({"name": "José García", "place": "café"})
        assert s == '{"name": "José García", "place": "café"}'
        assert "\\u" not in s

    def test_nested_payload(self):
        s = canonical_json({"a": [1, None, True], "b": {"c": "àáâãäåæçèéêë"}})
        assert s == '{"a": [1, null, true], "b": {"c": "àáâãäåæçèéêë"}}'

    def test_insertion_order(self):
        assert canonical_json({"z": 1, "a": 2}) == '{"z": 1, "a": 2}'
