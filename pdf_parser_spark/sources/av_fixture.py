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


def _flac_bytes(rate: int, channels: int, bits: int, total: int) -> bytes:
    """Canonical FLAC header built field-by-field HERE, independently of
    the parse_flac_streaminfo bit unpacking (the differential-anchor
    rule): fLaC magic, STREAMINFO block (the 64-bit rate/channels/bits/
    total bitfield packed as one big-endian integer), a VORBIS_COMMENT
    block with the last-block flag, then stub frame bytes."""
    import struct

    body = (struct.pack(">HH", 4096, 4096)
            + (1024).to_bytes(3, "big") + (8192).to_bytes(3, "big"))
    packed = ((rate << 44) | ((channels - 1) << 41)
              | ((bits - 1) << 36) | total)
    body += packed.to_bytes(8, "big") + bytes(range(16))  # md5 placeholder
    vendor = b"pdf-parser-spark-fixture"
    vc = struct.pack("<I", len(vendor)) + vendor + struct.pack("<I", 0)
    return (b"fLaC" + b"\x00" + (34).to_bytes(3, "big") + body
            + b"\x84" + len(vc).to_bytes(3, "big") + vc
            + b"\xff\xf8\x69\x18" + bytes(20))


def _ogg_page(htype: int, granule: int, seq: int, packet: bytes) -> bytes:
    """One Ogg page (RFC 3533 §6) with a correct lacing table (255-value
    continuation split). CRC left zero on purpose: metadata parsers must
    not require checksum verification to read header fields."""
    import struct

    segs = []
    rem = len(packet)
    while True:
        segs.append(min(rem, 255))
        rem -= segs[-1]
        if segs[-1] < 255:
            break
    return (b"OggS" + b"\x00" + bytes([htype])
            + struct.pack("<Q", granule)
            + struct.pack("<II", 0x1E0FFBAD, seq)
            + b"\x00\x00\x00\x00"
            + bytes([len(segs)]) + bytes(segs) + packet)


def _oggs() -> list:
    """Opus and Vorbis streams: BOS page with the codec ID packet, a tags
    page (granule 0), and data pages whose last granule carries the
    stream length. Granules chosen so duration never rounds at .5."""
    import struct

    opushead = (b"OpusHead" + bytes([1, 2]) + struct.pack("<H", 312)
                + struct.pack("<I", 48000) + struct.pack("<h", 0) + b"\x00")
    opustags = b"OpusTags" + struct.pack("<I", 4) + b"test" + struct.pack("<I", 0)
    d1 = bytes((i * 7) % 251 for i in range(40))
    d2 = bytes((i * 13) % 251 for i in range(300))  # >255: split lacing
    opus = (_ogg_page(2, 0, 0, opushead) + _ogg_page(0, 0, 1, opustags)
            + _ogg_page(0, 18312, 2, d1) + _ogg_page(4, 70712, 3, d2))
    vorbid = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([1])
              + struct.pack("<I", 11025) + struct.pack("<iii", 0, 86400, 0)
              + bytes([0xB8, 0x01]))
    vorbtags = b"\x03vorbis" + struct.pack("<I", 3) + b"fix" + struct.pack("<I", 0)
    vorb = (_ogg_page(2, 0, 0, vorbid) + _ogg_page(0, 0, 1, vorbtags)
            + _ogg_page(4, 11062, 2, d1))
    return [
        ("j-ogg-opus", "opus", opus),
        ("k-ogg-vorbis", "ogg", vorb),
        # recognizable Ogg page whose first packet is no known ID header
        ("l-ogg-unknown", "ogg", _ogg_page(2, 0, 0, b"junk-codec-packet")),
    ]


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
    # FLAC: 16/24-bit, a 36-bit total-samples value past 2^32 (high-nibble
    # packing), total==0 (unknown -> NULL duration), truncated header
    full = _flac_bytes(44100, 2, 16, 123457)
    rows.append(("https://fixtures.test/av/f-flac-stereo44k.flac", full))
    rows.append(("https://fixtures.test/av/g-flac-mono-hi-total.flac",
                 _flac_bytes(22050, 1, 24, 2 ** 33 + 7)))
    rows.append(("https://fixtures.test/av/h-flac-total-unknown.flac",
                 _flac_bytes(48000, 2, 16, 0)))
    rows.append(("https://fixtures.test/av/i-flac-truncated.flac", full[:14]))
    # Ogg Opus/Vorbis ID headers + granule-position durations
    rows += [(f"https://fixtures.test/av/{name}.{ext}", data)
             for name, ext, data in _oggs()]
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
