"""From-scratch GIF87a/GIF89a codec (pure Python + numpy, no codec libs).

Implements the public GIF specification: logical screen descriptor, global
and local color tables, LZW-compressed image data (variable code width,
clear/end codes, 12-bit cap), interlacing, Graphic Control Extensions
(frame delay, transparency, disposal), and multi-frame animation with
disposal methods 0/1 (leave) and 2 (restore background). `decode_gif`
returns every composited frame — the real multi-frame substrate for the
frame-sampling operator (operators/multimodal.frame_sample), which until
this codec existed could only emit digest placeholders.

The encoder writes real LZW-compressed GIF89a (optionally animated),
giving the decoder differential fixtures: encode -> decode must return the
exact input frames (GIF is lossless over palette images). The GIF LZW
variant differs from the PDF/TIFF LZWDecode in kernels/pdftext.py:537
(little-endian bit packing, per-image minimum code size, sub-block
framing), hence a separate implementation against its own spec.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

__all__ = ["GIFError", "decode_gif", "decode_gif_first_frame", "encode_gif",
           "GIF_MAGICS"]

GIF_MAGICS = (b"GIF87a", b"GIF89a")


class GIFError(Exception):
    pass


# --------------------------------------------------------------------------
# LZW (GIF variant: little-endian bit order, dynamic code width)
# --------------------------------------------------------------------------

def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytearray:
    if not 2 <= min_code_size <= 8:
        raise GIFError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    # bit reader state (GIF packs codes LSB-first)
    acc = 0
    nbits = 0
    pos = 0
    width = min_code_size + 1
    table: List[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: Optional[bytes] = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise GIFError("LZW stream truncated before end code")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise GIFError("LZW: first code not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            # deferred clear: once the table is full (4096 = 1<<12) real
            # encoders stop adding entries and keep emitting existing codes
            # until (if ever) they send a clear — mirror that exactly.
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GIFError("LZW: code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        if len(out) >= expected:
            # frame is full — stop here. Real-world encoders frequently
            # omit the explicit end-of-information code (e.g. the
            # ubiquitous 43-byte 1x1 tracking pixel pads the final byte
            # instead); browsers and giflib stop at frame-full, so do we.
            break
    return out


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    w = b""
    for b in indices:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        table[wc] = next_code
        next_code += 1
        # width grows AFTER emitting at the old width (decoder mirrors this)
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code >= (1 << 12):
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w])
        # The decoder adds one table entry after reading this final data
        # code and then applies its width-growth check; if that entry lands
        # exactly on a power-of-two boundary the decoder reads the END code
        # at the widened width. Mirror it (the add is virtual — no further
        # data codes reference it) so END is written at the width it is
        # read. Without this, streams whose last data code sits on a
        # boundary fail with "truncated before end code".
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
    emit(end)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = rows[src]
            src += 1
    return out


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

def _read_subblocks(data: bytes, pos: int) -> Tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(data):
            raise GIFError("truncated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(data[pos:pos + n])
        if len(chunks[-1]) != n:
            raise GIFError("truncated sub-block")
        pos += n


def decode_gif(data: bytes) -> List[np.ndarray]:
    """Decode every frame to a composited (h, w, 3) uint8 RGB array list."""
    if data[:6] not in GIF_MAGICS:
        raise GIFError("missing GIF magic")
    if len(data) < 13:
        raise GIFError("truncated header")
    w, h, flags, bg, _ar = struct.unpack("<HHBBB", data[6:13])
    if w == 0 or h == 0:
        raise GIFError("zero-dimension logical screen")
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos:pos + 3 * n], dtype=np.uint8)
        if len(gct) != 3 * n:
            raise GIFError("truncated global color table")
        gct = gct.reshape(-1, 3)
        pos += 3 * n

    frames: List[np.ndarray] = []
    if gct is not None:
        canvas = np.tile(gct[bg if bg < len(gct) else 0], (h, w, 1)).astype(np.uint8)
    else:
        canvas = np.zeros((h, w, 3), dtype=np.uint8)
    transparent: Optional[int] = None
    disposal = 0

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise GIFError("truncated extension")
            label = data[pos]
            pos += 1
            body, pos = _read_subblocks(data, pos)
            if label == 0xF9 and len(body) >= 4:  # GCE
                gflags = body[0]
                disposal = (gflags >> 2) & 0x07
                transparent = body[3] if gflags & 0x01 else None
            continue
        if block != 0x2C:
            raise GIFError(f"unknown block 0x{block:02x}")
        # image descriptor
        ix, iy, iw, ih, iflags = struct.unpack("<HHHHB", data[pos:pos + 9])
        pos += 9
        if iw == 0 or ih == 0 or ix + iw > w or iy + ih > h:
            raise GIFError("frame exceeds logical screen")
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            ct = np.frombuffer(data[pos:pos + 3 * n], dtype=np.uint8)
            if len(ct) != 3 * n:
                raise GIFError("truncated local color table")
            ct = ct.reshape(-1, 3)
            pos += 3 * n
        if ct is None:
            raise GIFError("frame without any color table")
        mcs = data[pos]
        pos += 1
        lzw, pos = _read_subblocks(data, pos)
        idx = _lzw_decode(lzw, mcs, iw * ih)
        if len(idx) < iw * ih:
            raise GIFError("LZW yielded too few pixels")
        grid = np.frombuffer(bytes(idx[: iw * ih]), dtype=np.uint8).reshape(ih, iw)
        if iflags & 0x40:
            grid = _deinterlace(grid)
        if int(grid.max(initial=0)) >= len(ct):
            raise GIFError("palette index out of range")

        if disposal == 3:
            raise GIFError("disposal method 3 (restore previous) not supported")
        region = canvas[iy:iy + ih, ix:ix + iw]
        rgb = ct[grid]
        if transparent is not None:
            mask = grid != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:  # restore to background color
            bg_rgb = (gct[bg] if gct is not None and bg < len(gct)
                      else np.zeros(3, np.uint8))
            canvas[iy:iy + ih, ix:ix + iw] = bg_rgb
        transparent = None
        disposal = 0
    if not frames:
        raise GIFError("no image data")
    return frames


def decode_gif_first_frame(data: bytes) -> np.ndarray:
    return decode_gif(data)[0]


# --------------------------------------------------------------------------
# encoder (GIF89a, optional animation; palette derived from the frames)
# --------------------------------------------------------------------------

def encode_gif(
    frames, delay_cs: int = 10, loop: bool = True,
) -> bytes:
    """Encode one (h, w, 3) uint8 array or a list of same-shaped arrays as
    a (possibly animated) GIF89a. All frames together may use at most 256
    distinct colors (a real quantizer is out of scope — fixtures control
    their palettes). Lossless: decode_gif(encode_gif(f)) == f."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise GIFError("no frames")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape != (h, w, 3):
            raise GIFError("all frames must be (h, w, 3) and same-shaped")
    # build the joint palette
    flat = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise GIFError(f"{len(colors)} colors exceed the 256-entry palette")
    nbits = max(int(len(colors) - 1).bit_length(), 1)
    psize = 1 << nbits
    palette = np.zeros((psize, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    idx_frames = inverse.astype(np.uint8).reshape(len(frames), h, w)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (nbits - 1), 0, 0)
    out += palette.tobytes()
    if loop and len(frames) > 1:  # Netscape looping extension
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(nbits, 2)
    for fi in idx_frames:
        if len(frames) > 1:
            out += b"\x21\xf9\x04" + bytes([0x00]) + struct.pack("<H", delay_cs)
            out += b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out += bytes([mcs])
        lzw = _lzw_encode(fi.tobytes(), mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
