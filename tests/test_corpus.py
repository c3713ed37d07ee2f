"""Corpus generator tests: determinism, shape, golden self-consistency."""

from pdf_parser_spark.corpus import generate_rows
from pdf_parser_spark.kernels.fields import canonical_json, extract_fields
from pdf_parser_spark.kernels.htmlmain import html_to_text
from pdf_parser_spark.kernels.pdftext import extract_text


class TestDeterminism:
    def test_same_seed_same_bytes(self):
        a = generate_rows(0.001)
        b = generate_rows(0.001)
        assert len(a) == len(b)
        for ra, rb in zip(a, b):
            assert ra["url"] == rb["url"]
            assert ra["html"] == rb["html"]
            assert ra["text"] == rb["text"]

    def test_different_seed_different_content(self):
        a = generate_rows(0.001, seed=42)
        b = generate_rows(0.001, seed=43)
        assert any(ra["html"] != rb["html"] for ra, rb in zip(a, b))


class TestShape:
    def test_input_hint_columns(self):
        row = generate_rows(0.001)[0]
        assert set(row) >= {"url", "warc_ts", "html", "text", "lang"}

    def test_row_mix(self):
        rows = generate_rows(0.001)
        urls = [r["url"] for r in rows]
        assert any(u.endswith(".pdf") for u in urls)
        assert any(u.endswith(".html") for u in urls)
        assert any(u.endswith(".txt") for u in urls)   # wrong-extension rows
        assert any("/feed/" in u for u in urls)        # pre-extracted text rows
        assert any(len(r["html"]) < 100 and r["url"].endswith(".pdf") for r in rows)


class TestGoldenSelfConsistency:
    def test_kernels_reproduce_all_goldens(self):
        for r in generate_rows(0.001):
            gt = r["_golden_text"]
            if gt is None:
                continue
            if r["url"].endswith(".pdf"):
                got = extract_text(r["html"])
            elif r["html"]:
                got = html_to_text(r["html"])
            else:
                got = r["text"]
            assert got == gt, r["url"]
            if r["_golden_fields_json"]:
                assert canonical_json(extract_fields(got)) == r["_golden_fields_json"]
