"""Deterministic audio-payload fixture for the multimodal AV metadata path.

Writes a small parquet of opaque binary payloads: canonical WAVs (stdlib
`wave`, fixed 44-byte header layout), a RIFF-but-not-WAVE container, and
junk bytes. The driver query runs media_av_metadata over it; because the
canonical header layout is fixed, the DuckDB oracle can re-derive every
field with little-endian byte arithmetic over hex(payload) — a true
cross-engine value check of the from-scratch RIFF parser. Idempotent.
"""

from __future__ import annotations

import io
import os
import tempfile
import wave

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["ensure_av_fixture", "AV_FIXTURE_SPECS"]

# (name, channels, sample_rate, frames, sample_width) — frames chosen so
# duration_ms = frames*1000/rate is never a .5 rounding boundary
AV_FIXTURE_SPECS = [
    ("a-mono8k", 1, 8000, 4000, 2),
    ("b-stereo16k", 2, 16000, 16000, 2),
    ("c-mono22k", 1, 22050, 11025, 2),
    ("d-stereo44k", 2, 44100, 44100, 2),
    ("e-byte-width", 1, 8000, 1234, 1),
]


def _wav(channels: int, rate: int, frames: int, width: int) -> bytes:
    buf = io.BytesIO()
    w = wave.open(buf, "wb")
    w.setnchannels(channels)
    w.setsampwidth(width)
    w.setframerate(rate)
    w.writeframes(bytes((i * 31) % 251 for i in range(frames * channels * width)))
    w.close()
    return buf.getvalue()


def ensure_av_fixture(corpus_dir: str) -> str:
    out_dir = os.path.join(corpus_dir, "av")
    path = os.path.join(out_dir, "media.parquet")
    if os.path.exists(path):
        return path
    rows = [
        (f"https://fixtures.test/av/{name}.wav", _wav(ch, rate, frames, width))
        for name, ch, rate, frames, width in AV_FIXTURE_SPECS
    ]
    rows.append(
        ("https://fixtures.test/av/not-audio.avi",
         b"RIFF\x10\x00\x00\x00AVI LIST\x04\x00\x00\x00junk")
    )
    rows.append(("https://fixtures.test/av/junk.bin", b"not a riff container"))
    tbl = pa.Table.from_pydict(
        {"url": [r[0] for r in rows], "payload": [r[1] for r in rows]},
        schema=pa.schema([("url", pa.string()), ("payload", pa.binary())]),
    )
    os.makedirs(out_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
    os.close(fd)
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path
