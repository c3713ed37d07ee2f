"""Pure-Python PNG codec (W3C PNG spec / RFC 2083 — public format).

Replaces the multimodal decode stub for PNG payloads: this container has no
image libraries, but PNG needs only zlib (stdlib) plus the five byte-level
scanline filters, both implementable from the public spec. Supported: bit
depth 8, color types 0 (grey), 2 (RGB), 3 (palette), 4 (grey+alpha),
6 (RGBA), no interlacing. The unfilter loop is per-byte Python — fine for
thumbnail/feature work per Arrow batch; a production deployment swaps this
module for Pillow without touching any Spark plan (the operator surface in
operators/multimodal.py is unchanged).

The encoder exists so tests can synthesize valid fixtures for every filter
type without external data.
"""

from __future__ import annotations

import struct
import zlib
from typing import List, Tuple

import numpy as np

__all__ = ["PNGError", "decode_png", "encode_png", "PNG_SIGNATURE"]

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PNGError(Exception):
    """Malformed or unsupported PNG payload."""


def _chunks(data: bytes) -> List[Tuple[bytes, bytes]]:
    if data[:8] != PNG_SIGNATURE:
        raise PNGError("bad PNG signature")
    out = []
    i = 8
    n = len(data)
    while i + 8 <= n:
        (length,) = struct.unpack(">I", data[i : i + 4])
        ctype = data[i + 4 : i + 8]
        body = data[i + 8 : i + 8 + length]
        if len(body) != length:
            raise PNGError("truncated chunk")
        out.append((ctype, body))
        i += 12 + length  # length + type + body + crc (crc not verified)
        if ctype == b"IEND":
            break
    if not out or out[-1][0] != b"IEND":
        raise PNGError("missing IEND")
    return out


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    stride = width * bpp
    if len(raw) < height * (stride + 1):
        raise PNGError("IDAT too short for image dimensions")
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = raw[pos : pos + stride]
        pos += stride
        base = y * stride
        prev = base - stride
        if ftype == 0:  # None
            out[base : base + stride] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                a = out[base + x - bpp] if x >= bpp else 0
                out[base + x] = (line[x] + a) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                b = out[prev + x] if y else 0
                out[base + x] = (line[x] + b) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                a = out[base + x - bpp] if x >= bpp else 0
                b = out[prev + x] if y else 0
                out[base + x] = (line[x] + ((a + b) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = out[base + x - bpp] if x >= bpp else 0
                b = out[prev + x] if y else 0
                c = out[prev + x - bpp] if (y and x >= bpp) else 0
                out[base + x] = (line[x] + _paeth(a, b, c)) & 0xFF
        else:
            raise PNGError(f"unknown filter type {ftype}")
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG payload to a (height, width, channels) uint8 array.

    Palette images are expanded to RGB. Raises PNGError for malformed or
    unsupported inputs (16-bit, interlaced, exotic color types).
    """
    chunks = _chunks(data)
    if chunks[0][0] != b"IHDR" or len(chunks[0][1]) != 13:
        raise PNGError("first chunk is not a valid IHDR")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", chunks[0][1]
    )
    if depth != 8:
        raise PNGError(f"unsupported bit depth {depth} (only 8)")
    if ctype not in _CHANNELS:
        raise PNGError(f"unsupported color type {ctype}")
    if comp != 0 or filt != 0:
        raise PNGError("unsupported compression/filter method")
    if interlace != 0:
        raise PNGError("interlaced (Adam7) PNG not supported")
    if w == 0 or h == 0:
        raise PNGError("zero-dimension image")
    idat = b"".join(body for t, body in chunks if t == b"IDAT")
    if not idat:
        raise PNGError("no IDAT data")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as e:
        raise PNGError(f"IDAT inflate failed: {e}")
    bpp = _CHANNELS[ctype]
    pixels = np.frombuffer(
        bytes(_unfilter(raw, w, h, bpp)), dtype=np.uint8
    ).reshape(h, w, bpp)
    if ctype == 3:  # palette -> RGB
        plte = next((body for t, body in chunks if t == b"PLTE"), None)
        if plte is None or len(plte) % 3:
            raise PNGError("palette image without a valid PLTE")
        table = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = pixels[:, :, 0]
        if int(idx.max(initial=0)) >= len(table):
            raise PNGError("palette index out of range")
        pixels = table[idx]
    return pixels


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a (h, w) or (h, w, c) uint8 array as a valid PNG.

    filter_type applies the same filter to every scanline (0..4) — enough to
    give the decoder's unfilter paths real fixtures.
    """
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}.get(c)
    if ctype is None:
        raise PNGError(f"cannot encode {c}-channel array")
    bpp = c
    stride = w * bpp
    flat = a.reshape(h, stride).astype(np.int16)
    rows = bytearray()
    recon = np.zeros((h, stride), dtype=np.int16)
    for y in range(h):
        cur = flat[y]
        recon[y] = cur
        left = np.concatenate([np.zeros(bpp, np.int16), cur[:-bpp]])
        up = recon[y - 1] if y else np.zeros(stride, np.int16)
        upleft = (
            np.concatenate([np.zeros(bpp, np.int16), recon[y - 1][:-bpp]])
            if y else np.zeros(stride, np.int16)
        )
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            enc = (cur - left) & 0xFF
        elif filter_type == 2:
            enc = (cur - up) & 0xFF
        elif filter_type == 3:
            enc = (cur - ((left + up) >> 1)) & 0xFF
        elif filter_type == 4:
            enc = np.array(
                [(cur[x] - _paeth(int(left[x]), int(up[x]), int(upleft[x]))) & 0xFF
                 for x in range(stride)],
                dtype=np.int16,
            )
        else:
            raise PNGError(f"unknown filter type {filter_type}")
        rows.append(filter_type)
        rows += bytes(enc.astype(np.uint8))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(rows)))
        + chunk(b"IEND", b"")
    )
