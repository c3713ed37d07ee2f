"""Deterministic MPEG-audio fixture — INDEPENDENT of kernels/mp3.py.

Assembles MP3 payloads field-by-field from the public header layout
(ISO/IEC 11172-3 §2.4.1.3) with its own bitrate/samplerate tables, so a
kernel/fixture agreement is a real differential anchor, not a shared
convention (the GIF round-3 lesson). Canonical layouts keep every
VBR-header field at a fixed byte offset, which lets the DuckDB oracle
re-derive all metadata with hex arithmetic (the media_wav_metadata
pattern). Idempotent.

Rows:
- a-cbr-mpeg1-48k : MPEG1 L3 48 kHz 192 kbps stereo, 25 frames, bare
- b-id3-mpeg1-32k : ID3v2 tag (syncsafe size 117 -> 127 total) + MPEG1
                    L3 32 kHz 160 kbps stereo, 10 frames
- c-xing-vbr      : MPEG1 L3 44.1 kHz stereo; Xing header at offset 36
                    declaring 30 frames; mixed-bitrate follow frames
- d-mpeg2-mono    : MPEG2 L3 24 kHz 96 kbps mono, 20 frames
- e-id3v1-tail    : like (a) with 15 frames + trailing 128-byte TAG
- f-layer2        : MPEG1 Layer II 48 kHz 192 kbps stereo, 8 frames
- i-vbri          : MPEG1 L3 44.1 kHz 160 kbps stereo, VBRI header
                    (frames=12 at offset 50)
- j-info-cbr      : Info (CBR) header at offset 36 with frame count 10
- g-not-mp3 / h-id3-only : fallback rows (junk; tag without frames)
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["ensure_mp3_fixture"]

# independent transcription of the public tables (do NOT import the
# kernel's): {(version_bits, layer): kbps list}, index = header nibble
_BR = {
    (3, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320],
    (3, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160],
}
_SR = {3: [44100, 48000, 32000], 2: [22050, 24000, 16000]}


def _frame(version_bits: int, layer: int, kbps: int, rate: int,
           mode: int, fill: int) -> bytes:
    h1 = 0xE0 | (version_bits << 3) | ((4 - layer) << 1) | 1
    h2 = (_BR[(version_bits, layer)].index(kbps) << 4) \
        | (_SR[version_bits].index(rate) << 2)
    # samples per frame: Layer II always 1152; Layer III 1152 for MPEG1,
    # 576 for MPEG2 (Layer I unused in this fixture)
    spf = 1152 if (layer == 2 or version_bits == 3) else 576
    flen = spf // 8 * kbps * 1000 // rate
    return bytes((0xFF, h1, h2, mode << 6)) + bytes([fill]) * (flen - 4)


def _with_header_payload(frame: bytes, at: int, blob: bytes) -> bytes:
    return frame[:at] + blob + frame[at + len(blob):]


def _rows() -> list:
    rows = []
    rows.append(("a-cbr-mpeg1-48k", _frame(3, 3, 192, 48000, 0, 0x11) * 25))
    # v2.3 tag (plain big-endian frame sizes, latin-1 text): TIT2 + TPE1
    # + zero padding to a 117-byte content area (total tag 127 bytes)
    t1 = b"\x00" + b"Deterministic Title"
    t2 = b"\x00" + b"Fixture Artist"
    frames23 = (b"TIT2" + len(t1).to_bytes(4, "big") + b"\x00\x00" + t1
                + b"TPE1" + len(t2).to_bytes(4, "big") + b"\x00\x00" + t2)
    id3 = (b"ID3" + bytes((3, 0, 0)) + bytes((0, 0, 0, 117))
           + frames23 + b"\x00" * (117 - len(frames23)))
    rows.append(("b-id3-mpeg1-32k",
                 id3 + _frame(3, 3, 160, 32000, 0, 0x22) * 10))
    xing = (b"Xing" + (0x1).to_bytes(4, "big") + (30).to_bytes(4, "big"))
    first = _with_header_payload(_frame(3, 3, 128, 44100, 0, 0x00), 36, xing)
    rows.append(("c-xing-vbr",
                 first + _frame(3, 3, 128, 44100, 0, 0x33) * 2
                 + _frame(3, 3, 160, 44100, 0, 0x44)))
    rows.append(("d-mpeg2-mono", _frame(2, 3, 96, 24000, 3, 0x55) * 20))
    rows.append(("e-id3v1-tail",
                 _frame(3, 3, 192, 48000, 0, 0x66) * 15
                 + b"TAG" + b"\x00" * 125))
    rows.append(("f-layer2", _frame(3, 2, 192, 48000, 0, 0x77) * 8))
    rows.append(("g-not-mp3", b"\x00\x01 not mpeg audio at all \xff\xee"))
    rows.append(("h-id3-only", id3))
    vbri = (b"VBRI" + (1).to_bytes(2, "big") + (0).to_bytes(2, "big")
            + (0).to_bytes(2, "big") + (6000).to_bytes(4, "big")
            + (12).to_bytes(4, "big"))
    rows.append(("i-vbri", _with_header_payload(
        _frame(3, 3, 160, 44100, 0, 0x00), 36, vbri)
        + _frame(3, 3, 160, 44100, 0, 0x88) * 2))
    info = (b"Info" + (0x1).to_bytes(4, "big") + (10).to_bytes(4, "big"))
    rows.append(("j-info-cbr", _with_header_payload(
        _frame(3, 3, 192, 48000, 0, 0x00), 36, info)
        + _frame(3, 3, 192, 48000, 0, 0x99) * 9))

    # v2.4 tag (SYNCSAFE frame sizes, utf-8 text with multi-byte chars)
    def syncsafe(n: int) -> bytes:
        return bytes(((n >> 21) & 0x7F, (n >> 14) & 0x7F,
                      (n >> 7) & 0x7F, n & 0x7F))

    u1 = b"\x03" + "Café Sessions".encode()
    u2 = b"\x03" + "Überband".encode()
    frames24 = (b"TIT2" + syncsafe(len(u1)) + b"\x00\x00" + u1
                + b"TPE1" + syncsafe(len(u2)) + b"\x00\x00" + u2)
    content24 = frames24 + b"\x00" * 20
    id34 = b"ID3" + bytes((4, 0, 0)) + syncsafe(len(content24)) + content24
    rows.append(("k-id3v24-utf8",
                 id34 + _frame(3, 3, 192, 48000, 0, 0xAA) * 6))
    return rows


def ensure_mp3_fixture(corpus_dir: str) -> str:
    out_dir = os.path.join(corpus_dir, "mp3")
    path = os.path.join(out_dir, "media.parquet")
    if os.path.exists(path):
        return path
    rows = [(f"https://fixtures.test/mp3/{name}.mp3", data)
            for name, data in _rows()]
    os.makedirs(out_dir, exist_ok=True)
    tbl = pa.Table.from_pydict(
        {"url": [r[0] for r in rows], "payload": [r[1] for r in rows]},
        schema=pa.schema([("url", pa.string()), ("payload", pa.binary())]),
    )
    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix=".tmp")
    os.close(fd)
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path
