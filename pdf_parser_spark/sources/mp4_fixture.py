"""Deterministic MP4-payload fixture for the video-container metadata path.

Canonical fixed-layout files from kernels/mp4.build_mp4 (ftyp 20 B, mvhd
v0 at byte 36, first trak's tkhd width at byte 228 and hdlr fourcc at byte
292), so the DuckDB oracle re-derives every field with big-endian byte
arithmetic at those offsets — the same differential pattern as the
RIFF/WAVE fixture (and the same documented scope: the offsets hold for
THIS builder's layout; the Python parser walks the box tree generically).
Plus a corrupt row (ftyp magic, truncated moov) and junk. Idempotent.
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["ensure_mp4_fixture"]


def _rows() -> list:
    from ..kernels.mp4 import build_mp4

    a = build_mp4(brand=b"isom", timescale=1000, duration=5000,
                  tracks=((b"vide", 640, 360), (b"soun", 0, 0)))
    b = build_mp4(brand=b"mp42", timescale=44100, duration=441000,
                  tracks=((b"soun", 0, 0),))
    c = build_mp4(brand=b"avc1", timescale=90000, duration=2700000,
                  tracks=((b"vide", 1920, 1080), (b"soun", 0, 0),
                          (b"soun", 0, 0)))
    return [
        ("https://fixtures.test/mp4/a-video.mp4", a),
        ("https://fixtures.test/mp4/b-audio.m4a", b),
        ("https://fixtures.test/mp4/c-movie.mp4", c),
        ("https://fixtures.test/mp4/d-corrupt.mp4", a[:40]),
        ("https://fixtures.test/mp4/e-junk.bin", b"not an iso-bmff container"),
    ]


def ensure_mp4_fixture(corpus_dir: str) -> str:
    out_dir = os.path.join(corpus_dir, "mp4")
    path = os.path.join(out_dir, "media.parquet")
    if os.path.exists(path):
        return path
    rows = _rows()
    os.makedirs(out_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
    os.close(fd)
    pq.write_table(
        pa.Table.from_pydict(
            {"url": [r[0] for r in rows], "payload": [r[1] for r in rows]},
            schema=pa.schema([("url", pa.string()), ("payload", pa.binary())]),
        ),
        tmp,
    )
    os.replace(tmp, path)
    return path
