"""Sources: binaryFile normalization (S1/S2) and the from-scratch WARC reader.

Reference intent: byte ingestion from upload handles
(/root/reference/src/app.py:165,218) — here re-expressed as file sources
feeding the same canonical pages schema.
"""

from __future__ import annotations

import gzip
import os
import zlib
from datetime import datetime

import pytest

from pdf_parser_spark.kernels.pdfgen import build_pdf
from pdf_parser_spark.sources.warc import parse_warc_bytes


def _warc_record(rtype: str, uri: str, date: str, payload: bytes,
                 http: bool = False) -> bytes:
    if http:
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + payload
        )
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


# >= 100 bytes so it clears the reference's F2 min-size validator
HTML_DOC = (
    b"<!DOCTYPE html><html><head><title>t</title></head><body>"
    b"<article><p>Hello crawl, this paragraph is the main content of the "
    b"page and long enough to score as body text.</p></article>"
    b"<footer><a href='/t'>Terms</a></footer></body></html>"
)


def _sample_warc() -> bytes:
    pdf = build_pdf([["Customer Name: Jan Kowalski"]], font_mode="simple")
    return b"".join([
        _warc_record("warcinfo", "urn:warcinfo", "2024-01-01T00:00:00Z",
                     b"software: test\r\n"),
        _warc_record("response", "https://example.org/a.html",
                     "2024-01-02T03:04:05Z", HTML_DOC, http=True),
        _warc_record("request", "https://example.org/a.html",
                     "2024-01-02T03:04:05Z", b"GET /a.html HTTP/1.1\r\n"),
        _warc_record("resource", "https://example.org/b.pdf",
                     "2024-01-03T00:00:00Z", pdf),
    ])


class TestParseWarcBytes:
    def test_extracts_only_document_records(self):
        recs = parse_warc_bytes(_sample_warc())
        assert [u for u, _, _ in recs] == [
            "https://example.org/a.html", "https://example.org/b.pdf"
        ]

    def test_http_envelope_stripped(self):
        recs = parse_warc_bytes(_sample_warc())
        assert recs[0][2] == HTML_DOC

    def test_pdf_payload_byte_identical(self):
        pdf = build_pdf([["Customer Name: Jan Kowalski"]], font_mode="simple")
        recs = parse_warc_bytes(_sample_warc())
        assert recs[1][2] == pdf

    def test_warc_date_parsed(self):
        recs = parse_warc_bytes(_sample_warc())
        assert recs[0][1] == datetime(2024, 1, 2, 3, 4, 5)

    def test_gzip_member_per_record(self):
        # Common Crawl layout: one gzip member per record, concatenated
        pdf = build_pdf([["x"]], font_mode="simple")
        raw = [
            _warc_record("response", "https://example.org/a.html",
                         "2024-01-02T03:04:05Z", HTML_DOC, http=True),
            _warc_record("resource", "https://example.org/b.pdf",
                         "2024-01-03T00:00:00Z", pdf),
        ]
        gz = b"".join(gzip.compress(r) for r in raw)
        recs = parse_warc_bytes(gz)
        assert len(recs) == 2 and recs[0][2] == HTML_DOC and recs[1][2] == pdf

    def test_truncated_tail_record_dropped(self):
        data = _sample_warc()
        recs_full = parse_warc_bytes(data)
        recs_cut = parse_warc_bytes(data[:-30])  # cuts into the last payload
        assert len(recs_cut) == len(recs_full) - 1

    def test_garbage_between_records_skipped(self):
        data = b"junkjunk" + _sample_warc()
        assert len(parse_warc_bytes(data)) == 2

    def test_malformed_content_length_skips_record(self):
        bad = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Target-URI: https://x/\r\nContent-Length: nope\r\n\r\n"
        )
        data = bad + _sample_warc()
        assert len(parse_warc_bytes(data)) == 2


class TestSparkSources:
    def test_read_warc_to_pages_schema(self, spark, tmp_path):
        from pdf_parser_spark.sources import read_warc

        (tmp_path / "crawl-00.warc").write_bytes(_sample_warc())
        (tmp_path / "crawl-01.warc.gz").write_bytes(
            gzip.compress(_warc_record(
                "response", "https://example.org/c.html",
                "2024-01-04T00:00:00Z", HTML_DOC, http=True))
        )
        df = read_warc(spark, str(tmp_path))
        rows = {r.url: r for r in df.collect()}
        assert set(rows) == {
            "https://example.org/a.html", "https://example.org/b.pdf",
            "https://example.org/c.html",
        }
        assert df.columns == ["url", "warc_ts", "html", "text", "lang"]
        assert bytes(rows["https://example.org/a.html"].html) == HTML_DOC

    def test_warc_rows_flow_through_extraction(self, spark, tmp_path):
        from pdf_parser_spark.pipeline import extract_pipeline
        from pdf_parser_spark.sources import read_warc

        (tmp_path / "c.warc").write_bytes(_sample_warc())
        out = extract_pipeline(read_warc(spark, str(tmp_path)))
        by_url = {r.url: r for r in out.collect()}
        pdf_row = by_url["https://example.org/b.pdf"]
        assert pdf_row.status == "ok"
        assert pdf_row.text == "Customer Name: Jan Kowalski"
        html_row = by_url["https://example.org/a.html"]
        assert html_row.status == "ok" and "Hello crawl" in html_row.text

    def test_binaryfile_source(self, spark, tmp_path):
        from pdf_parser_spark.sources import read_binary_files

        pdf = build_pdf([["Policy Number: POL-1"]], font_mode="simple")
        (tmp_path / "one.pdf").write_bytes(pdf)
        (tmp_path / "sub").mkdir()
        (tmp_path / "sub" / "two.html").write_bytes(HTML_DOC)
        df = read_binary_files(spark, str(tmp_path))
        assert df.columns == ["url", "warc_ts", "html", "text", "lang"]
        rows = {os.path.basename(r.url): r for r in df.collect()}
        assert set(rows) == {"one.pdf", "two.html"}
        assert bytes(rows["one.pdf"].html) == pdf

    def test_binaryfile_glob_filter(self, spark, tmp_path):
        from pdf_parser_spark.sources import read_binary_files

        (tmp_path / "a.pdf").write_bytes(b"%PDF-1.7 x" * 20)
        (tmp_path / "b.txt").write_bytes(b"not read")
        df = read_binary_files(spark, str(tmp_path), glob="*.pdf")
        assert [os.path.basename(r.url) for r in df.collect()] == ["a.pdf"]


class TestSinks:
    def test_json_export_matches_reference_rendering(self, spark):
        import json as _json

        from pdf_parser_spark.sinks import json_export

        fields = {"customer_name": "Żaneta Kowalska", "claim_amount": "3,450.00"}
        compact = _json.dumps(fields, ensure_ascii=False)
        df = spark.createDataFrame([("u1", compact), ("u2", None)],
                                   "url string, fields_json string")
        rows = {r.url: r.export_json for r in json_export(df).collect()}
        assert rows["u1"] == _json.dumps(fields, ensure_ascii=False, indent=2)
        assert "Żaneta" in rows["u1"]  # ensure_ascii=False preserved raw
        assert rows["u2"] is None

    def test_create_output_table_idempotent(self, spark, tmp_path):
        from pdf_parser_spark.sinks import create_output_table

        loc = str(tmp_path / "out_tbl")
        create_output_table(spark, "t_out_test", loc)
        create_output_table(spark, "t_out_test", loc)  # IF NOT EXISTS
        cols = [f.name for f in spark.table("t_out_test").schema.fields]
        assert cols[:3] == ["url", "warc_ts", "file_hash"]
        spark.sql("DROP TABLE t_out_test")


class TestWarcDataSource:
    def test_format_warc_equals_mapinpandas_reader(self, spark, tmp_path):
        from pdf_parser_spark.corpus import ensure_corpus
        from pdf_parser_spark.sources.warc import read_warc
        from pdf_parser_spark.sources.warc_datasource import register_warc_source
        from pdf_parser_spark.sources.warc_fixture import ensure_warc_fixture

        wdir = ensure_warc_fixture(ensure_corpus(0.001))
        register_warc_source(spark)
        via_ds = {
            (r.url, r.warc_ts, bytes(r.html))
            for r in spark.read.format("warc").load(wdir).collect()
        }
        via_mp = {
            (r.url, r.warc_ts, bytes(r.html))
            for r in read_warc(spark, wdir).collect()
        }
        assert via_ds == via_mp and len(via_ds) > 0

    def test_one_partition_per_archive(self, spark):
        from pdf_parser_spark.corpus import ensure_corpus
        from pdf_parser_spark.sources.warc_datasource import register_warc_source
        from pdf_parser_spark.sources.warc_fixture import ensure_warc_fixture

        wdir = ensure_warc_fixture(ensure_corpus(0.001))
        register_warc_source(spark)
        df = spark.read.format("warc").load(wdir)
        assert df.rdd.getNumPartitions() == 1  # fixture has one archive
