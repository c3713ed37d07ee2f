"""From-scratch ISO-BMFF (MP4) container parser: metadata + sample walk.

Walks the public ISO/IEC 14496-12 box structure: ftyp (brand), moov/mvhd
(timescale + duration, version 0 and 1), trak/tkhd (track width/height,
16.16 fixed point) and mdia/hdlr (handler fourcc -> video/audio track
flags). 64-bit largesize and size-0 (to-end) boxes are handled; any box
overrunning its parent raises MP4Error. Container METADATA is what a
curation pipeline filters on (duration caps, resolution gates, has-audio).

`extract_video_samples` additionally walks the first video track's sample
tables (stsd sample-entry format, stsz sizes, stsc chunk map, stco chunk
offsets) and slices the raw coded samples out of mdat — for MJPEG tracks
('jpeg' sample entries, the classic QuickTime/ISO MJPEG layout) each
sample is a complete JFIF stream that kernels/jpeg.py decodes to real
pixels, giving the video frame-sampling operator actual frames.

The `build_mp4` fixture builder emits a canonical fixed-layout file
(ftyp 20 B, moov = mvhd v0 + N x 173-B trak, complete mdat) so a SQL
oracle can re-derive every field with big-endian byte arithmetic at fixed
offsets — the same differential pattern as the RIFF/WAVE fixture.
`build_video_mp4` emits a real playable-layout MJPEG file with full
stbl sample tables (multi-chunk stsc to keep the parser honest).
"""

from __future__ import annotations

import struct
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

__all__ = ["MP4Error", "parse_mp4", "build_mp4", "build_video_mp4",
           "extract_video_samples", "MP4_FTYP_OFFSET"]

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
# sample extraction (stbl walk) — real frames for MJPEG tracks
# --------------------------------------------------------------------------

def _find_child(d: bytes, start: int, end: int, typ: bytes) -> Optional[Tuple[int, int]]:
    for t, ps, pe in _boxes(d, start, end):
        if t == typ:
            return ps, pe
    return None


def _full_box_table(d: bytes, ps: int, n_fields: int) -> List[Tuple[int, ...]]:
    """Read a version/flags + entry_count + fixed-width-uint32-tuple table
    (the stts/stsc/stco layout)."""
    count = _be32(d, ps + 4)
    rows = []
    p = ps + 8
    for _ in range(count):
        rows.append(tuple(_be32(d, p + 4 * k) for k in range(n_fields)))
        p += 4 * n_fields
    return rows


def extract_video_samples(data: bytes) -> Tuple[str, List[bytes]]:
    """Slice the first video track's coded samples out of mdat.

    Generic ISO/IEC 14496-12 sample-table walk: stsd gives the sample-entry
    format fourcc, stsz the per-sample sizes, stco the chunk file offsets,
    and stsc the (first_chunk, samples_per_chunk) runs mapping samples into
    chunks; samples are laid consecutively within a chunk. Returns
    (format_fourcc, [sample_bytes...]). Raises MP4Error when the file has
    no video track with complete sample tables or a sample overruns the
    file (truncated mdat).
    """
    if len(data) < 16 or data[4:8] != b"ftyp":
        raise MP4Error("missing ftyp box")
    moov = _find_child(data, 0, len(data), b"moov")
    if moov is None:
        raise MP4Error("missing moov box")
    for typ, ps, pe in _boxes(data, moov[0], moov[1]):
        if typ != b"trak":
            continue
        mdia = _find_child(data, ps, pe, b"mdia")
        if mdia is None:
            continue
        hdlr = _find_child(data, mdia[0], mdia[1], b"hdlr")
        if hdlr is None or data[hdlr[0] + 8:hdlr[0] + 12] != b"vide":
            continue
        minf = _find_child(data, mdia[0], mdia[1], b"minf")
        if minf is None:
            continue
        stbl = _find_child(data, minf[0], minf[1], b"stbl")
        if stbl is None:
            continue
        stsd = _find_child(data, stbl[0], stbl[1], b"stsd")
        stsz = _find_child(data, stbl[0], stbl[1], b"stsz")
        stco = _find_child(data, stbl[0], stbl[1], b"stco")
        co64 = _find_child(data, stbl[0], stbl[1], b"co64")
        stsc = _find_child(data, stbl[0], stbl[1], b"stsc")
        if (None in (stsd, stsz, stsc)
                or (stco is None and co64 is None)):
            raise MP4Error("video track without complete sample tables")
        if _be32(data, stsd[0] + 4) < 1:
            raise MP4Error("empty stsd")
        fmt = data[stsd[0] + 12:stsd[0] + 16].decode("ascii", "replace")
        # stsz: fixed sample_size or per-sample table
        fixed = _be32(data, stsz[0] + 4)
        n_samples = _be32(data, stsz[0] + 8)
        if fixed:
            sizes = [fixed] * n_samples
        else:
            sizes = [_be32(data, stsz[0] + 12 + 4 * i) for i in range(n_samples)]
        if stco is not None:
            offsets = [r[0] for r in _full_box_table(data, stco[0], 1)]
        else:
            # co64: same table shape as stco with 64-bit chunk offsets
            # (ISO/IEC 14496-12 §8.7.5; ffmpeg emits it for >4 GB files
            # and some faststart layouts)
            n_off = _be32(data, co64[0] + 4)
            offsets = [
                (_be32(data, co64[0] + 8 + 8 * i) << 32)
                | _be32(data, co64[0] + 12 + 8 * i)
                for i in range(n_off)
            ]
        runs = _full_box_table(data, stsc[0], 3)
        if not runs or not offsets:
            raise MP4Error("empty chunk tables")
        samples: List[bytes] = []
        si = 0
        for ri, (first_chunk, per_chunk, _sdi) in enumerate(runs):
            last_chunk = (runs[ri + 1][0] - 1 if ri + 1 < len(runs)
                          else len(offsets))
            for ci in range(first_chunk - 1, last_chunk):
                pos = offsets[ci]
                for _ in range(per_chunk):
                    if si >= n_samples:
                        break
                    size = sizes[si]
                    if pos + size > len(data):
                        raise MP4Error("sample overruns the file (truncated mdat)")
                    samples.append(data[pos:pos + size])
                    pos += size
                    si += 1
        if si < n_samples:
            raise MP4Error("chunk map covers fewer samples than stsz declares")
        return fmt, samples
    raise MP4Error("no video track")


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


def _stbl(samples: Sequence[bytes], fmt: bytes, w: int, h: int,
          sample_delta: int, samples_per_chunk: int,
          chunk_offsets: Sequence[int]) -> bytes:
    entry = struct.pack(">6xH", 1)                       # data_reference_index
    entry += struct.pack(">HH3I", 0, 0, 0, 0, 0)          # pre_defined/reserved
    entry += struct.pack(">HHIIIH", w, h, 0x00480000, 0x00480000, 0, 1)
    entry += b"\x00" * 32 + struct.pack(">Hh", 0x0018, -1)
    stsd = _box(b"stsd", struct.pack(">B3xI", 0, 1) + _box(fmt, entry))
    stts = _box(b"stts", struct.pack(">B3xIII", 0, 1, len(samples),
                                     sample_delta))
    n_chunks = len(chunk_offsets)
    # two stsc runs when the last chunk is a remainder (keeps the generic
    # run-mapping in extract_video_samples honest)
    remainder = len(samples) - samples_per_chunk * (n_chunks - 1)
    if n_chunks > 1 and remainder != samples_per_chunk:
        stsc_rows = [(1, samples_per_chunk, 1), (n_chunks, remainder, 1)]
    else:
        stsc_rows = [(1, samples_per_chunk, 1)]
    stsc = _box(b"stsc", struct.pack(">B3xI", 0, len(stsc_rows))
                + b"".join(struct.pack(">III", *r) for r in stsc_rows))
    stsz = _box(b"stsz", struct.pack(">B3xII", 0, 0, len(samples))
                + b"".join(struct.pack(">I", len(s)) for s in samples))
    stco = _box(b"stco", struct.pack(">B3xI", 0, n_chunks)
                + b"".join(struct.pack(">I", o) for o in chunk_offsets))
    return _box(b"stbl", stsd + stts + stsc + stsz + stco)


def build_video_mp4(
    samples: Sequence[bytes],
    width: int,
    height: int,
    fmt: bytes = b"jpeg",
    timescale: int = 1000,
    sample_delta: int = 100,
    samples_per_chunk: int = 2,
    brand: bytes = b"qt  ",
) -> bytes:
    """Build a real MJPEG-layout MP4: one video track whose stbl sample
    tables (stsd/stts/stsc/stsz/stco) index the coded samples laid out in
    mdat chunks of `samples_per_chunk`. With fmt=b'jpeg' and JFIF sample
    bytes this is the classic QuickTime/ISO MJPEG file a real camera or
    ffmpeg `-c:v mjpeg` emits; extract_video_samples round-trips it."""
    if not samples:
        raise MP4Error("no samples")
    duration = sample_delta * len(samples)
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + b"mp41")
    mvhd = _box(b"mvhd", struct.pack(
        ">B3xIIII", 0, 0, 0, timescale, duration
    ) + struct.pack(">I2x2x8x", 0x00010000)
        + struct.pack(">36s24xI",
                      struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                                  0x40000000), 2))
    tkhd = _box(b"tkhd", struct.pack(
        ">B3xIII4xI8xhhhh36sII",
        0, 0, 0, 1, duration, 0, 0, 0, 0,
        struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000),
        width << 16, height << 16,
    ))
    mdhd = _box(b"mdhd", struct.pack(">B3xIIIIHH", 0, 0, 0, timescale,
                                     duration, 0x55C4, 0))
    hdlr = _box(b"hdlr", struct.pack(">B3x4x4s12xs", 0, b"vide", b"\x00"))
    vmhd = _box(b"vmhd", struct.pack(">B3xHHHH", 0, 1, 0, 0, 0))
    dref = _box(b"dref", struct.pack(">B3xI", 0, 1)
                + _box(b"url ", struct.pack(">B3x", 1)))
    dinf = _box(b"dinf", dref)

    def moov_bytes(chunk_offsets: Sequence[int]) -> bytes:
        stbl = _stbl(samples, fmt, width, height, sample_delta,
                     samples_per_chunk, chunk_offsets)
        minf = _box(b"minf", vmhd + dinf + stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak = _box(b"trak", tkhd + mdia)
        return _box(b"moov", mvhd + trak)

    n_chunks = -(-len(samples) // samples_per_chunk)
    # offsets depend on moov's size; stco entries are fixed-width so a
    # second pass with the measured size converges immediately
    moov0 = moov_bytes([0] * n_chunks)
    data_start = len(ftyp) + len(moov0) + 8  # + mdat header
    offsets = []
    pos = data_start
    for ci in range(n_chunks):
        offsets.append(pos)
        for s in samples[ci * samples_per_chunk:(ci + 1) * samples_per_chunk]:
            pos += len(s)
    moov = moov_bytes(offsets)
    assert len(moov) == len(moov0)
    mdat = _box(b"mdat", b"".join(samples))
    return ftyp + moov + mdat


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
