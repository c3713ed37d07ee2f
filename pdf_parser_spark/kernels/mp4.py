"""From-scratch ISO-BMFF (MP4) container parser — metadata only.

Walks the public ISO/IEC 14496-12 box structure: ftyp (brand), moov/mvhd
(timescale + duration, version 0 and 1), trak/tkhd (track width/height,
16.16 fixed point) and mdia/hdlr (handler fourcc -> video/audio track
flags). 64-bit largesize and size-0 (to-end) boxes are handled; any box
overrunning its parent raises MP4Error. No sample decoding — frame
extraction needs codec libraries absent from this container and stays
behind the digest fallback; container METADATA is what a curation
pipeline filters on (duration caps, resolution gates, has-audio), and
that parses for real here.

The `build_mp4` fixture builder emits a canonical fixed-layout file
(ftyp 20 B, moov = mvhd v0 + N x 173-B trak, complete mdat) so a SQL
oracle can re-derive every field with big-endian byte arithmetic at fixed
offsets — the same differential pattern as the RIFF/WAVE fixture.
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, Optional, Tuple

__all__ = ["MP4Error", "parse_mp4", "build_mp4", "MP4_FTYP_OFFSET"]

MP4_FTYP_OFFSET = 4  # fourcc 'ftyp' begins at byte 4 of a well-formed file


class MP4Error(Exception):
    pass


def _be32(d: bytes, p: int) -> int:
    if p + 4 > len(d):
        raise MP4Error("truncated 32-bit field")
    return struct.unpack(">I", d[p:p + 4])[0]


def _be64(d: bytes, p: int) -> int:
    if p + 8 > len(d):
        raise MP4Error("truncated 64-bit field")
    return struct.unpack(">Q", d[p:p + 8])[0]


def _boxes(d: bytes, start: int, end: int) -> Iterator[Tuple[bytes, int, int]]:
    """Yield (fourcc, payload_start, payload_end) for each box in a span."""
    pos = start
    while pos + 8 <= end:
        size = _be32(d, pos)
        typ = d[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            size = _be64(d, pos + 8)
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise MP4Error(f"box {typ!r} overruns its parent")
        yield typ, pos + hdr, pos + size
        pos += size
    if pos != end:
        raise MP4Error("trailing bytes that are not a box")


def parse_mp4(data: bytes) -> Dict[str, object]:
    """Parse container metadata; raises MP4Error on malformed input.

    Returns brand, timescale, duration_ms, n_tracks, width/height of the
    first video track (0 if none), has_video, has_audio.
    """
    if len(data) < 16 or data[4:8] != b"ftyp":
        raise MP4Error("missing ftyp box")
    brand: Optional[str] = None
    timescale = duration = None
    n_tracks = 0
    width = height = 0
    has_video = has_audio = False
    for typ, ps, pe in _boxes(data, 0, len(data)):
        if typ == b"ftyp":
            brand = data[ps:ps + 4].decode("ascii", "replace")
        elif typ == b"moov":
            for t2, p2s, p2e in _boxes(data, ps, pe):
                if t2 == b"mvhd":
                    ver = data[p2s]
                    if ver == 1:
                        timescale = _be32(data, p2s + 4 + 16)
                        duration = _be64(data, p2s + 4 + 20)
                    else:
                        timescale = _be32(data, p2s + 4 + 8)
                        duration = _be32(data, p2s + 4 + 12)
                elif t2 == b"trak":
                    n_tracks += 1
                    t_w = t_h = 0
                    t_handler = b""
                    for t3, p3s, p3e in _boxes(data, p2s, p2e):
                        if t3 == b"tkhd":
                            ver = data[p3s]
                            base = p3s + 4 + (32 if ver == 1 else 20)
                            # reserved(8) layer(2) alt(2) volume(2)
                            # reserved(2) matrix(36) -> width/height 16.16
                            wh = base + 8 + 2 + 2 + 2 + 2 + 36
                            t_w = _be32(data, wh) >> 16
                            t_h = _be32(data, wh + 4) >> 16
                        elif t3 == b"mdia":
                            for t4, p4s, _p4e in _boxes(data, p3s, p3e):
                                if t4 == b"hdlr":
                                    t_handler = data[p4s + 8:p4s + 12]
                    if t_handler == b"vide":
                        has_video = True
                        if width == 0 and height == 0:
                            width, height = t_w, t_h
                    elif t_handler == b"soun":
                        has_audio = True
    if timescale is None or timescale == 0:
        raise MP4Error("missing mvhd timescale")
    duration_ms = int(round(duration * 1000.0 / timescale))
    return {
        "brand": brand,
        "timescale": timescale,
        "duration_ms": duration_ms,
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
        "has_video": has_video,
        "has_audio": has_audio,
    }


# --------------------------------------------------------------------------
# canonical fixture builder (fixed layout -> SQL-oracle-friendly offsets)
# --------------------------------------------------------------------------

def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + typ + payload


def _trak(track_id: int, duration: int, w: int, h: int, handler: bytes,
          timescale: int) -> bytes:
    tkhd = _box(b"tkhd", struct.pack(
        ">B3xIII4xI8xhhhh36sII",
        0, 0, 0, track_id, duration,
        0, 0, 0, 0,
        struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000),
        w << 16, h << 16,
    ))
    mdhd = _box(b"mdhd", struct.pack(">B3xIIIIHH", 0, 0, 0, timescale,
                                     duration, 0x55C4, 0))
    hdlr = _box(b"hdlr", struct.pack(">B3x4x4s12xs", 0, handler, b"\x00"))
    mdia = _box(b"mdia", mdhd + hdlr)
    return _box(b"trak", tkhd + mdia)


def build_mp4(
    brand: bytes = b"isom",
    timescale: int = 1000,
    duration: int = 5000,
    tracks: Tuple[Tuple[bytes, int, int], ...] = ((b"vide", 640, 360),),
) -> bytes:
    """Canonical fixed-layout MP4: ftyp (20 B) + moov (mvhd v0 108 B +
    173 B per trak) + a complete 12-B mdat. tracks = (handler, w, h)*."""
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + b"mp41")
    assert len(ftyp) == 20
    mvhd = _box(b"mvhd", struct.pack(
        ">B3xIIII", 0, 0, 0, timescale, duration
    ) + struct.pack(">I2x2x8x", 0x00010000)
        + struct.pack(">36s24xI",
                      struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                                  0x40000000), 0xFFFFFFFF))
    assert len(mvhd) == 108, len(mvhd)
    traks = b"".join(
        _trak(i + 1, duration, w, h, handler, timescale)
        for i, (handler, w, h) in enumerate(tracks)
    )
    moov = _box(b"moov", mvhd + traks)
    mdat = _box(b"mdat", b"\xde\xad\xbe\xef")
    return ftyp + moov + mdat
