"""Deterministic WARC fixture derived from the generated corpus.

Writes the first `n` (url-sorted) non-empty documents of a corpus's pages
table as a gzipped WARC archive, so the from-scratch WARC reader
(sources/warc.py) can be driver-verified end-to-end: read_warc(fixture)
must reproduce exactly the url/timestamp/payload triples the parquet scan
yields — the oracle compares against the pages table itself. Idempotent
(marker file) and derived purely from the already-deterministic corpus, so
no new randomness enters the test surface.
"""

from __future__ import annotations

import gzip
import os
import tempfile

import pyarrow.parquet as pq

__all__ = ["ensure_warc_fixture"]


def ensure_warc_fixture(corpus_dir: str, n: int = 50) -> str:
    out_dir = os.path.join(corpus_dir, "warc")
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    tbl = pq.read_table(
        os.path.join(corpus_dir, "pages.parquet"),
        columns=["url", "warc_ts", "html"],
    ).to_pylist()
    rows = sorted((r for r in tbl if r["html"]), key=lambda r: r["url"])[:n]
    blob = bytearray()
    for r in rows:
        payload = bytes(r["html"])
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: resource\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {r['warc_ts']:%Y-%m-%dT%H:%M:%SZ}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
        ).encode("ascii")
        blob += head + payload + b"\r\n\r\n"
    os.makedirs(out_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
    with os.fdopen(fd, "wb") as f:
        f.write(gzip.compress(bytes(blob)))
    os.replace(tmp, os.path.join(out_dir, "sample.warc.gz"))
    with open(done, "w") as f:
        f.write(f"records={len(rows)}\n")
    return out_dir
