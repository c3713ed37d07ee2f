"""Deterministic MP4-payload fixtures: container metadata + MJPEG video.

media.parquet: canonical fixed-layout files from kernels/mp4.build_mp4
(ftyp 20 B, mvhd v0 at byte 36, first trak's tkhd width at byte 228 and
hdlr fourcc at byte 292), so the DuckDB oracle re-derives every field with
big-endian byte arithmetic at those offsets — the same differential
pattern as the RIFF/WAVE fixture (and the same documented scope: the
offsets hold for THIS builder's layout; the Python parser walks the box
tree generically). Plus a corrupt row (ftyp magic, truncated moov) and
junk. Idempotent.

video.parquet + video_frame_goldens.parquet: real MJPEG-layout MP4s
(kernels/mp4.build_video_mp4 — full stsd/stts/stsc/stsz/stco sample
tables, JFIF samples from kernels/jpeg.py) for the REAL video
frame-sampling path, plus the documented fallback rows (an avc1 track —
inter-frame codec, digest fallback; a truncated mdat; junk). Goldens are
baked at generation time from the shared frame_feature_rows helper
(floor(f*1e6) int CSV — the img-fixture pattern), so the DuckDB oracle is
a plain SELECT and a driver row proves real decoded video pixels flow
through the Spark plan. After changing kernels/{jpeg,mp4}.py or the
featurizer, `rm -rf .corpus` so fixtures re-bake.
"""

from __future__ import annotations

import math
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["ensure_mp4_fixture", "ensure_video_fixture",
           "VIDEO_FRAME_N", "VIDEO_FRAME_DIM"]

VIDEO_FRAME_N, VIDEO_FRAME_DIM = 4, 8


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


def _mjpeg_frames(n: int, h: int, w: int, salt: int) -> list:
    import numpy as np

    out = []
    for k in range(n):
        yy, xx = np.indices((h, w))
        img = np.stack(
            [(yy * 5 + k * 31 + salt) % 230,
             (xx * 3 + k * 7) % 230,
             ((yy + xx) * 4 + k * 13 + salt * 2) % 230],
            axis=2,
        ).astype(np.uint8)
        out.append(img)
    return out


def _video_rows() -> list:
    from ..kernels.jpeg import encode_jpeg
    from ..kernels.mp4 import build_video_mp4

    # 7 frames, 2 samples/chunk -> a remainder stsc run; real MJPEG layout
    a = build_video_mp4(
        [encode_jpeg(f, quality=90) for f in _mjpeg_frames(7, 24, 32, 0)],
        32, 24, samples_per_chunk=2,
    )
    # 3 frames in a single chunk, different dims/quality
    b = build_video_mp4(
        [encode_jpeg(f, quality=80) for f in _mjpeg_frames(3, 16, 20, 5)],
        20, 16, samples_per_chunk=3,
    )
    # inter-frame codec: avc1 sample entry with opaque NAL-ish bytes ->
    # NotImplementedError -> documented digest fallback
    c = build_video_mp4([b"\x00\x00\x00\x01gibberish-nal" * 3] * 4,
                        64, 48, fmt=b"avc1")
    # truncated mdat: sample slice overruns the file -> MP4Error -> fallback
    d = a[: len(a) - len(a) // 3]
    return [
        ("https://fixtures.test/video/v-clip-mjpeg.mp4", a),
        ("https://fixtures.test/video/w-short-mjpeg.mov", b),
        ("https://fixtures.test/video/x-avc1-stub.mp4", c),
        ("https://fixtures.test/video/y-truncated.mp4", d),
        ("https://fixtures.test/video/z-junk.bin", b"\x00not a video at all"),
    ]


def ensure_video_fixture(corpus_dir: str) -> str:
    out_dir = os.path.join(corpus_dir, "mp4")
    path = os.path.join(out_dir, "video.parquet")
    gpath = os.path.join(out_dir, "video_frame_goldens.parquet")
    if os.path.exists(path) and os.path.exists(gpath):
        return path
    from ..operators.multimodal import frame_feature_rows

    rows = _video_rows()
    os.makedirs(out_dir, exist_ok=True)

    def _write(p: str, tbl: pa.Table) -> None:
        fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
        os.close(fd)
        pq.write_table(tbl, tmp)
        os.replace(tmp, p)

    _write(path, pa.Table.from_pydict(
        {"url": [r[0] for r in rows], "payload": [r[1] for r in rows]},
        schema=pa.schema([("url", pa.string()), ("payload", pa.binary())]),
    ))
    frows = [
        (url, i, ",".join(str(math.floor(float(f) * 1_000_000)) for f in feats))
        for url, payload in rows
        for i, feats in enumerate(frame_feature_rows(
            payload, VIDEO_FRAME_N, VIDEO_FRAME_DIM, real_decode=True))
    ]
    _write(gpath, pa.Table.from_pydict(
        {
            "url": [r[0] for r in frows],
            "frame_idx": [r[1] for r in frows],
            "features_i": [r[2] for r in frows],
        },
        schema=pa.schema([
            ("url", pa.string()), ("frame_idx", pa.int32()),
            ("features_i", pa.string()),
        ]),
    ))
    return path


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
